"""Same-session interleaved A/Bs for the r13 hardening changes
(CLAUDE.md: interleave FIRST, then decide; never conclude from
cross-window numbers).

1. ``pagerank``: the retired float sorted-fold flagship shape
   (collect_list→array_sort→aggregate per key) vs the converged
   fixed-point registered query — the r12 verdict #1 swap.
2. ``cache``: corpus-sized reuse tables cached via
   persist(MEMORY_AND_DISK) (shipped, r6 rule) vs localCheckpoint
   (the r12 verdict #3 violation) on the three consumers the swap
   touched: citation_cocitation, citation_pagerank, knn_ivf_ann.
   Toggled through the ``cache.cache_corpus`` seam.

Every timed run starts from a cleared SQL cache so both variants pay
their materialization; variants alternate A,B,A,B,... so window drift
hits both sides equally. Median of 5 per side.

Usage: python tools/ab_r13.py [--sf-dir DIR] [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.1"
    json_path = None
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from bench import _calibrate

    from mapreduce_citation_spark import cache as cache_mod
    from mapreduce_citation_spark.operators import graph
    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    report: dict = {"sf_dir": sf_dir, "cal_before": _calibrate()}

    def timed(fn) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def med(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    # --- 1. pagerank convergence: old float-fold shape vs shipped ---
    def old_flagship():
        ranks = graph.pagerank(
            graph._edges(spark, sf_dir), iterations=6, exact_fold=True
        )
        return ranks.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(20)

    def new_flagship():
        return specs["citation_pagerank"].fn(spark, sf_dir)

    for fn in (new_flagship, old_flagship):  # warm JVM/codegen, untimed
        timed(fn)
    old_runs, new_runs = [], []
    for _ in range(5):
        new_runs.append(timed(new_flagship))
        old_runs.append(timed(old_flagship))
    report["pagerank"] = {
        "old_float_fold_sec": old_runs,
        "new_fixed_point_sec": new_runs,
        "median_old": med(old_runs),
        "median_new": med(new_runs),
        "speedup_old_over_new": round(med(old_runs) / med(new_runs), 3),
    }

    # --- 2. cache strategy on corpus-sized reuse tables ---
    shipped = cache_mod.cache_corpus
    report["cache"] = {}
    for qname in ("citation_cocitation", "citation_pagerank", "knn_ivf_ann"):
        fn = specs[qname].fn

        def run_with(strategy) -> float:
            # r14 (r13 ADVICE): clearCache() does NOT release
            # localCheckpoint'ed RDD blocks, so checkpoint-variant runs
            # would otherwise accumulate pinned deserialized blocks for
            # the whole session (the r9 co-residency class). Track what
            # the strategy materializes and release it after the run.
            # r15 (r14 ADVICE): df.unpersist() only goes through the
            # CacheManager — a LogicalRDD has no entry there, so for
            # the checkpoint variant it was a no-op. _release() below
            # additionally unpersists the checkpointed RDD itself via
            # the JVM handle (LogicalRDD.rdd); if that handle is ever
            # unavailable the residual co-residency bias (pinned
            # deserialized blocks accumulating across checkpoint runs)
            # is back and numbers from this section should be read
            # with that caveat.
            made: list = []

            def tracking(df):
                out = strategy(df)
                made.append(out)
                return out

            def _release(df) -> None:
                try:
                    df.unpersist(blocking=True)  # CacheManager entries
                except Exception:
                    pass
                try:
                    # LogicalRDD (localCheckpoint) blocks live on the
                    # checkpointed RDD, not in the CacheManager
                    plan = df._jdf.queryExecution().logical()
                    if plan.getClass().getSimpleName() == "LogicalRDD":
                        plan.rdd().unpersist(True)
                except Exception:
                    pass

            cache_mod.cache_corpus = tracking
            try:
                return timed(lambda: fn(spark, sf_dir))
            finally:
                cache_mod.cache_corpus = shipped
                for df in made:
                    _release(df)

        run_with(shipped)  # warm, untimed
        p_runs, c_runs = [], []
        for _ in range(5):
            p_runs.append(run_with(shipped))
            c_runs.append(run_with(lambda df: df.localCheckpoint()))
        report["cache"][qname] = {
            "persist_sec": p_runs,
            "local_checkpoint_sec": c_runs,
            "median_persist": med(p_runs),
            "median_ckpt": med(c_runs),
            "ratio_persist_over_ckpt": round(med(p_runs) / med(c_runs), 3),
        }

    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
