"""Fixed-delta incremental-ingest curve — the evidence r7's committed
curve could not give (r7 verdict, next-round #2).

`SCALING_CORPUS_r07b.json` grew the DELTA with the corpus (the
registered `%8` cohort is a fixed 1/8 FRACTION), so its 8.3× top
decade conflates two growth axes and cannot falsify the operator's own
claim — "cost scales with the batch, never with base²" — which is
about a CONSTANT-size batch arriving against a growing base. This tool
runs that curve: the delta is pinned to replica 0's `%8` cohort
(``doc_id < 10000 AND doc_id % 8 == 0`` — 625 docs at every point,
`tools/gen_corpus.py`'s stride is 10000) while the base grows
5k → 50k → 500k docs.

Built-in falsifier: replicas share neither digests nor shingles with
replica 0 (per-replica char bijections), and prefix selection is
rank-stable under corpus growth (replica-0 shingles' global document
frequencies never change — no other replica contains them), so the
REJECTION SET must be byte-identical at every point. Any drift means
the construction leaked and the curve is invalid; the run aborts.

What "linear in base" still costs here: the base's digests, shingle
document frequencies and prefixes are derived from the corpus in this
self-contained query (one full-corpus scan + shingle aggregation), so
wall time grows ~linearly in base even though the candidate JOIN is
delta-prefix × base-prefix. In production those base artifacts are
precomputed outputs of previous ingest runs; the incremental claim is
about avoiding base² pair work, not about avoiding a linear base scan.

Methodology: bench.py/CLAUDE.md — 1 warmup + 3 timed runs per point,
median, clearCache between runs, cal probe recorded, ONE committed run.

Usage: python tools/scaling_ingest.py [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

BASE = "/root/testdata/sf0.1"
DELTA_DOCS = 625  # |{doc_id < 10000, doc_id % 8 == 0}| in the 5k base


def main(args: list[str]) -> int:
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]

    from pyspark.sql import functions as F

    from bench import _calibrate
    from tools.gen_corpus import generate

    from mapreduce_citation_spark.operators.dedup import (
        _docs,
        incremental_ingest_report,
    )
    from mapreduce_citation_spark.session import get_spark

    points = [(BASE, 1)]
    for k in (10, 100):
        out_dir = f"benchdata/docs_x{k}"
        generate(out_dir, k, BASE)
        points.append((out_dir, k))

    spark = get_spark("scaling-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    # fixed batch: replica 0's %8 cohort, constant at every point
    delta_pred = (F.col("doc_id") < 10000) & (F.col("doc_id") % 8 == 0)

    def run(sf_dir: str):
        return incremental_ingest_report(_docs(spark, sf_dir), delta_pred)

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    report: dict = {"cal": _calibrate(), "delta_docs": DELTA_DOCS,
                    "points": []}
    base_rejections = None
    for sf_dir, k in points:
        spark.catalog.clearCache()
        df = run(sf_dir)
        drain(df)  # warmup
        rej = sorted((r.doc_id, r.reason) for r in df.collect())
        n_delta = (
            _docs(spark, sf_dir).filter(delta_pred).count()
        )
        assert n_delta == DELTA_DOCS, (
            f"delta not fixed: {n_delta} docs at {k}x (expected {DELTA_DOCS})"
        )
        if k == 1:
            base_rejections = rej
        else:
            # the falsifier: a growing base of unrelated replicas must
            # not change which delta docs are rejected, or why
            assert rej == base_rejections, (
                f"rejection set drifted at {k}x — construction leaked "
                f"({len(rej)} vs {len(base_rejections)} rows)"
            )
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            drain(run(sf_dir))
            runs.append(time.perf_counter() - t0)
        report["points"].append(
            {"base_x": k, "corpus_rows": 5000 * k, "delta_rows": DELTA_DOCS,
             "sec": round(sorted(runs)[1], 3), "rejections": len(rej)}
        )
        print(f"  base {k}x ({5000 * k} docs), delta {DELTA_DOCS}: "
              f"{report['points'][-1]['sec']}s, {len(rej)} rejections",
              file=sys.stderr)

    report["ratios"] = [
        {"base_x": round(hi["base_x"] / lo["base_x"], 1),
         "time_x": round(hi["sec"] / lo["sec"], 1)}
        for lo, hi in zip(report["points"], report["points"][1:])
    ]
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
