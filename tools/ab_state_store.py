"""Same-session interleaved A/B: default (HDFS-backed in-memory)
state-store provider vs RocksDB, on the two stateful stream-stream
join families (r9 verdict #3).

Motivation: PROBE_FUNNEL_r09.json attributes ~95% of
``streaming_funnel_left_outer``'s wall to state-store commit cost
(30-67 s CUMULATIVE per batch across the 128 store instances a
stream-stream join plans at 32 shuffle partitions), inherent to the
default provider's per-commit snapshot discipline. RocksDB is the
at-scale provider (state off-heap, incremental checkpoints) and is
already proven engaged-and-correct by
``test_stateful_agg_under_rocksdb_state_store``; whether it WINS at
this fixture's tiny per-key state is an empirical question — RocksDB
pays a fixed native open/commit cost per store instance per batch,
and 128 near-empty instances may be exactly the shape where that
fixed cost exceeds the default provider's snapshot cost. The house
rules demand the interleaved A/B either way (never calibrate a
provider choice on cross-window numbers).

Method: per family, 1 warmup then 6 alternating cold runs
(default/rocksdb/...), each a full fresh query (the registered
function owns its query + sink; the provider conf is read at query
start). Outputs are asserted identical across ALL runs via an
order-independent digest (count + sum of per-row xxhash64 over every
column) — set-level, not count-level (the r9 ADVICE standard).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_state_store.py [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
FAMILIES = ("streaming_funnel_left_outer", "streaming_stream_stream_funnel")


def main(args: list[str]) -> int:
    json_path = None
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from pyspark.sql import functions as F

    from bench import _calibrate

    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-state-store")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    def digest(df) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    def one_run(fn, provider: str | None) -> tuple[float, tuple[int, int]]:
        old = spark.conf.get(PROVIDER_CONF, None)
        if provider:
            spark.conf.set(PROVIDER_CONF, provider)
        try:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            return sec, digest(df)  # digest untimed-ish (post-drain agg)
        finally:
            if provider:
                if old is None:
                    spark.conf.unset(PROVIDER_CONF)
                else:
                    spark.conf.set(PROVIDER_CONF, old)

    report: dict = {"sf_dir": sf_dir, "cal_before": _calibrate(),
                    "families": {}}
    for name in FAMILIES:
        fn = specs[name].fn
        runs: dict[str, list[float]] = {"default": [], "rocksdb": []}
        digests: set[tuple[int, int]] = set()
        one_run(fn, None)  # warmup (stages heartbeat files, warms JIT)
        for i in range(6):
            mode = "default" if i % 2 == 0 else "rocksdb"
            sec, dg = one_run(fn, ROCKS if mode == "rocksdb" else None)
            runs[mode].append(round(sec, 3))
            digests.add(dg)
            print(f"  {name} {mode}: {sec:.2f}s (digest {dg})",
                  file=sys.stderr)
        assert len(digests) == 1, (
            f"{name}: outputs differ across providers/runs: {digests}"
        )
        report["families"][name] = {
            "default_runs": runs["default"],
            "rocksdb_runs": runs["rocksdb"],
            "default_median": sorted(runs["default"])[1],
            "rocksdb_median": sorted(runs["rocksdb"])[1],
            "rows": next(iter(digests))[0],
        }
    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
