"""Same-session A/B: dedup_minhash_lsh signature-table materialization
— r7 ``persist(MEMORY_AND_DISK)`` vs r6 ``localCheckpoint`` vs none.

Why this exists (r7 verdict, next-round #1): BENCH_r07 measured
dedup_minhash_lsh at 2.70s vs BENCH_r06's 1.00s — 2.69× round-over-
round, exceeding the window's 1.68× CPU-drift envelope — and the delta
coincides with the r7 localCheckpoint→persist conversion of the
signature table. The repo's own benchmarking rule says only a
same-session back-to-back A/B can separate host drift from a plan
regression, so this tool runs all variants in ONE session with
bench.py's exact semantics per block:

- warmup run first (JIT + codegen amortized), then 5 timed runs,
  median reported — identical to bench.py's loop, so each block's
  median is directly comparable to the committed BENCH_r0{6,7} numbers;
- drain via the noop sink (count() prunes);
- blocks interleaved A B C A B C so slow within-session drift shows up
  as block1-vs-block2 disagreement rather than biasing one mode;
- ``spark.catalog.clearCache()`` + localCheckpoint RDD release between
  blocks — otherwise the persist block's cached InMemoryRelation would
  substitute into the next block's identical sub-plan (CacheManager
  matches canonicalized plans, not DataFrame identity) and the
  localCheckpoint block would be timed warm.

Prints one JSON line; run at the bench SF:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_minhash.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibrate  # noqa: E402

MODES = ("persist", "localCheckpoint", "none")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduce_citation_spark.operators import dedup
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("ab_minhash")
    spark.sparkContext.setLogLevel("ERROR")

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def reset() -> None:
        spark.catalog.clearCache()
        # localCheckpoint blocks live as cached RDDs outside the SQL
        # cache; drop them too so every block starts cold
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist(True)

    def one_block(mode: str) -> dict:
        dedup.SIG_MATERIALIZE = mode
        reset()
        n_rows: set[int] = set()
        drain(dedup.dedup_minhash_lsh(spark, sf_dir))  # warmup (bench.py)
        runs: list[float] = []
        for i in range(5):
            t0 = time.perf_counter()
            df = dedup.dedup_minhash_lsh(spark, sf_dir)
            drain(df)
            runs.append(round(time.perf_counter() - t0, 3))
            if i < 2:
                n_rows.add(df.count())
        assert len(n_rows) == 1, f"{mode}: unstable row count {n_rows}"
        dedup.SIG_MATERIALIZE = "persist"
        return {"runs": runs, "median": sorted(runs)[2],
                "rows": next(iter(n_rows))}

    cal_before = _calibrate()
    blocks: dict[str, list[dict]] = {m: [] for m in MODES}
    for _rep in range(2):  # A B C A B C
        for mode in MODES:
            blocks[mode].append(one_block(mode))
    cal_after = _calibrate()

    out = {
        "sf_dir": sf_dir,
        "query": "dedup_minhash_lsh",
        "blocks": blocks,
        # min of the two block medians (with 2 blocks there is no true
        # median; min slightly flatters BOTH modes equally — ADVICE r8)
        "min_of_medians": {
            m: round(sorted(b["median"] for b in blocks[m])[0], 3)
            for m in MODES
        },
        "cal_before": cal_before,
        "cal_after": cal_after,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
