"""Same-session interleaved A/B: streaming-family wall time at the
session default ``spark.sql.shuffle.partitions`` (32 locally) vs a
low override — VERDICT r14 #4's second lever.

Why this is plausible: a stateful streaming query creates one state
store INSTANCE per shuffle partition per stateful operator (a
stream-stream join keeps 4 stores per side), and every micro-batch
commits EVERY instance even when it saw zero rows. The r14 per-batch
probe measured 2.4–5.2 s of fixed commit cost per micro-batch at 32
partitions for batches of ≤4 rows. At fixture scale nearly all of
that is per-instance overhead, so fewer partitions should cut the
floor near-proportionally. At 100 TB the trade-off reverses (state
must spread), which is why the override is an env knob
(SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS), never a hard-coded local
constant — this tool measures whether the knob is worth exposing.

The conf is read at QUERY START, which happens inside the registered
fn (it starts and drains its own stream), so setting it around the fn
call really changes the state layout — unlike batch confs read at
execution time (the r14 SHJ A/B bug), there is no gap here; the
restore happens after the stream has fully drained.

Since the adaptive rule SHIPPED (streaming_queries._drain_stateful),
this tool toggles $SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS instead of
the session conf: "session" forces the pre-r15 behavior (session
default partitions), unset lets the shipped adaptive rule run, and
--parts N pins an explicit count for exploration.

Outputs are asserted identical across all runs via the set-level
digest (count + sum of per-row xxhash64), the ab_state_store
standard.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_stream_parts.py
       [--json PATH] [--parts N] [--families a,b,c]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARTS_CONF = "spark.sql.shuffle.partitions"
FAMILIES = (
    "streaming_funnel_left_outer",
    "streaming_stream_stream_funnel",
    "streaming_session_counts",
    "streaming_dedup_watermark",
)


def main(args: list[str]) -> int:
    json_path = None
    low = 0  # 0 = the shipped adaptive rule; N pins an explicit count
    families = FAMILIES
    if "--json" in args:
        json_path = args[args.index("--json") + 1]
    if "--parts" in args:
        low = int(args[args.index("--parts") + 1])
    if "--families" in args:
        families = tuple(args[args.index("--families") + 1].split(","))

    from pyspark.sql import functions as F

    from bench import _calibrate

    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-stream-parts")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    def digest(df) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    default_parts = spark.conf.get(PARTS_CONF)
    ENV = "SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"

    def one_run(fn, env_val: str | None) -> tuple[float, tuple[int, int]]:
        prev = os.environ.pop(ENV, None)
        if env_val is not None:
            os.environ[ENV] = env_val
        try:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            return sec, digest(df)
        finally:
            os.environ.pop(ENV, None)
            if prev is not None:
                os.environ[ENV] = prev

    # "default" side = pre-r15 behavior (session partitions, via the
    # "session" env sentinel); "low" side = the shipped adaptive rule
    # (env unset), or an explicit count with --parts N.
    low_env = None if low == 0 else str(low)
    report: dict = {
        "sf_dir": sf_dir,
        "default_parts": default_parts,
        "low_parts": low_env or "adaptive",
        "cal_before": _calibrate(),
        "families": {},
    }
    for name in families:
        fn = specs[name].fn
        runs: dict[str, list[float]] = {"default": [], "low": []}
        digests: set[tuple[int, int]] = set()
        one_run(fn, "session")  # warmup (stages files, warms JIT)
        for i in range(6):
            mode = "default" if i % 2 == 0 else "low"
            sec, dg = one_run(
                fn, "session" if mode == "default" else low_env
            )
            runs[mode].append(round(sec, 3))
            digests.add(dg)
            print(f"  {name} {mode}: {sec:.2f}s (digest {dg})",
                  file=sys.stderr)
        assert len(digests) == 1, (
            f"{name}: outputs differ across partition counts: {digests}"
        )
        report["families"][name] = {
            "default_runs": runs["default"],
            "low_runs": runs["low"],
            "default_median": sorted(runs["default"])[1],
            "low_median": sorted(runs["low"])[1],
            "speedup_default_over_low": round(
                sorted(runs["default"])[1] / sorted(runs["low"])[1], 3
            ),
            "rows": next(iter(digests))[0],
        }
        print(name, json.dumps(report["families"][name]), flush=True)
    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
