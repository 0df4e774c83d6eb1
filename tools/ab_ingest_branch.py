"""Same-session interleaved A/B of incremental ingest's candidate-join
branches (symmetric probe×probe vs asymmetric index/probe split) at
the 100× corpus point, for both cohort shapes:

- fixed: the 625-doc replica-0 delta against the 500k-doc base (the
  operator's design shape — nightly batch vs big base);
- fraction: the %8 cohort (62.5k docs) against the 437.5k-doc base
  (the synthetic both-sides-grow exercise).

Motivation (r9): the branch heuristic (asymmetric iff delta ≤ 2000
docs or ≤ base/24) was calibrated on r8c's CROSS-window curves, and
the first r9 curves re-measured both 100× points worse than their
best-to-date numbers at comparable cal probes — exactly the situation
CLAUDE.md says only an interleaved same-session A/B can adjudicate.
Modes alternate run-by-run (sym/asym/sym/asym...), cold per run
(clearCache), median of 3 per mode per cohort; the full output SET
(every row, collected untimed after the drain — rejection reports are
delta-bounded) is asserted identical across modes (both branches are
lossless by theorem). Row-count-only equality would pass two branches
rejecting DIFFERENT sets of equal size (r9 ADVICE).

Usage: python tools/ab_ingest_branch.py [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

CORPUS = "benchdata/docs_x100"


def main(args: list[str]) -> int:
    json_path = None
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from pyspark.sql import functions as F

    from bench import _calibrate

    from mapreduce_citation_spark.operators.dedup import (
        _docs,
        incremental_ingest_report,
    )
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("ab-ingest-branch")
    spark.sparkContext.setLogLevel("ERROR")

    cohorts = {
        "fixed_625_delta": (F.col("doc_id") < 10000) & (F.col("doc_id") % 8 == 0),
        "fraction_62k_delta": F.col("doc_id") % 8 == 0,
    }

    def one_run(pred, asym: bool) -> tuple[float, frozenset]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = incremental_ingest_report(_docs(spark, CORPUS), pred,
                                       asymmetric=asym)
        df.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        # full output set, collected UNTIMED after the drain: rejection
        # reports are delta-bounded, and set-level (not count-level)
        # equality is what the lossless theorem actually claims
        out = frozenset(tuple(r) for r in df.collect())
        return sec, out

    report: dict = {"corpus": CORPUS, "cal_before": _calibrate(),
                    "cohorts": {}}
    for name, pred in cohorts.items():
        runs: dict[str, list[float]] = {"sym": [], "asym": []}
        outs: dict[str, set[frozenset]] = {"sym": set(), "asym": set()}
        one_run(pred, False)  # warmup (either mode warms the JVM)
        for i in range(6):
            mode = "sym" if i % 2 == 0 else "asym"
            sec, out = one_run(pred, mode == "asym")
            runs[mode].append(round(sec, 3))
            outs[mode].add(out)
            print(f"  {name} {mode}: {sec:.2f}s ({len(out)} rows)",
                  file=sys.stderr)
        assert len(outs["sym"]) == 1 and outs["sym"] == outs["asym"], (
            f"{name}: branch output SETS differ — lossless theorem violated"
        )
        report["cohorts"][name] = {
            "sym_runs": runs["sym"],
            "asym_runs": runs["asym"],
            "sym_median": sorted(runs["sym"])[1],
            "asym_median": sorted(runs["asym"])[1],
            "rows": len(next(iter(outs["sym"]))),
        }
    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
