"""Same-session repeated measurement of ONE registered query — the
house treatment for a cross-window drift flag (CLAUDE.md: never
conclude a regression from cross-window numbers; the
`dedup_substring_spans` r8 follow-up is the template).

Runs the query once as warmup, then N back-to-back timed executions
(noop-sink drain) in one session, recording every run plus the cal
probe before and after — a flagged query whose prior bench medians
fall inside this distribution was drifting with the VM, not
regressing.

Usage: python tools/rerun_query.py NAME [--sf-dir DIR] [--runs N]
       [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args: list[str]) -> int:
    name = args[0]
    sf_dir = "/root/testdata/sf0.1"
    runs_n, json_path = 7, None
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--runs" in args:
        runs_n = int(args[args.index("--runs") + 1])
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from bench import _calibrate

    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("rerun-query")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_specs()[name].fn

    def drain() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    report: dict = {"query": name, "sf_dir": sf_dir,
                    "cal_before": _calibrate()}
    drain()  # warmup
    samples = [round(drain(), 3) for _ in range(runs_n)]
    report["runs_sec"] = samples
    report["median_sec"] = sorted(samples)[len(samples) // 2]
    report["min_sec"], report["max_sec"] = min(samples), max(samples)
    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
