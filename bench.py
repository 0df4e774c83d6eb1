"""Benchmark harness — the driver runs this per-round at sf0.1.

Runs the registry's bench-flagged headline queries on
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (results drained via count or a
bounded collect) — timings measure the full distributed plan, not lazy
construction. A warmup pass primes the JVM/codegen caches, then each
query is timed THREE times and the MEDIAN reported — a single GC
pause or compilation stall on a contended 32-thread local JVM must
not masquerade as a plan regression (round 1: the driver measured
q3 at 31.3s single-shot; it reproduces at 1.1s warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from mapreduce_citation_spark.registry import bench_queries
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = bench_queries()

    # Warmup: run every query once so timings measure steady-state
    # execution (JIT + whole-stage-codegen compile amortized), then
    # time a second full execution of each.
    for spec in specs.values():
        spec.fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        runs: list[float] = []
        counts: set[int] = set()
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = df.count()  # full execution; result not materialized to driver
            runs.append(time.perf_counter() - t0)
            counts.add(n)
        # real sanity gate: a deterministic query over static parquet
        # must return the same row count on every run
        assert len(counts) == 1, f"{name}: unstable row count {counts}"
        timings[name] = round(sorted(runs)[1], 3)

    print(
        json.dumps(
            {
                "metric": "headline query wall time at sf" + sf,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
