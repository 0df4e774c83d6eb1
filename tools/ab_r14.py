"""Same-session interleaved A/Bs for the r14 optimization changes
(CLAUDE.md: interleave FIRST, then decide; never conclude from
cross-window numbers).

1. ``kmeans``: embedding_kmeans assignment — in-row argmin over the
   packed centroid array (shipped) vs the retired corpus×k
   row_number window. Toggled via ``similarity.KM_ASSIGN``.
2. ``ivf``: knn_ivf_ann coarse assignment — in-row top-2 (shipped)
   vs the retired window shape. Toggled via ``similarity.IVF_ASSIGN``.
3. ``walks``: citation_random_walks — landing-node degree riding in
   the adjacency row (one join per hop) vs the per-hop
   frontier⋈degree join. MEASURED AND REJECTED: deg-in-adj lost at
   sf1 (0.78×, consistently pairwise — the build-time edge-sized
   degree attach outweighs the removed node-sized probes); the
   two-join shape ships. Toggled via ``random_walks(per_hop_deg=...)``.

Every timed run starts from a cleared SQL cache so both variants pay
their materialization; variants alternate A,B,A,B,... so window drift
hits both sides equally. Median of 5 per side.

Usage: python tools/ab_r14.py [--sf-dir DIR] [--json PATH]
       [--sections kmeans,ivf,walks]
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
    sections = {"kmeans", "ivf", "walks"}
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--json" in args:
        json_path = args[args.index("--json") + 1]
    if "--sections" in args:
        sections = set(args[args.index("--sections") + 1].split(","))

    from bench import _calibrate

    from mapreduce_citation_spark.operators import graph, similarity
    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    report: dict = {"sf_dir": sf_dir, "cal_before": _calibrate()}

    def timed(fn) -> float:
        """Time one full noop-sink execution of fn's DataFrame.

        fn may either return a DataFrame (we drain it here) or return
        None after draining it ITSELF — the latter is required for
        conf-toggling variants: spark.conf values are read at
        physical-planning/execution time, so a variant that restores
        confs in a `finally` before the write executes measures
        nothing (r14's SHJ A/Bs did exactly that — both sides ran
        with identical default confs; r14 ADVICE, fixed in r15)."""
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn()
        if df is not None:
            df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def med(xs: list[float]) -> float:
        return sorted(xs)[len(xs) // 2]

    def section(name: str, run_new, run_old) -> None:
        for fn in (run_new, run_old):  # warm JVM/codegen, untimed
            timed(fn)
        new_runs, old_runs = [], []
        for _ in range(5):
            new_runs.append(timed(run_new))
            old_runs.append(timed(run_old))
        report[name] = {
            "old_sec": old_runs,
            "new_sec": new_runs,
            "median_old": med(old_runs),
            "median_new": med(new_runs),
            "speedup_old_over_new": round(med(old_runs) / med(new_runs), 3),
        }
        print(name, json.dumps(report[name]), flush=True)

    def toggled(attr: str, value: str, fn):
        def run():
            prev = getattr(similarity, attr)
            setattr(similarity, attr, value)
            try:
                return fn()
            finally:
                setattr(similarity, attr, prev)
        return run

    if "kmeans" in sections:
        fn = specs["embedding_kmeans"].fn
        section(
            "kmeans",
            toggled("KM_ASSIGN", "inrow", lambda: fn(spark, sf_dir)),
            toggled("KM_ASSIGN", "window", lambda: fn(spark, sf_dir)),
        )
    if "ivf" in sections:
        fn = specs["knn_ivf_ann"].fn
        section(
            "ivf",
            toggled("IVF_ASSIGN", "inrow", lambda: fn(spark, sf_dir)),
            toggled("IVF_ASSIGN", "window", lambda: fn(spark, sf_dir)),
        )
    if "walks" in sections:
        def walks(per_hop: bool):
            def run():
                return graph.random_walks(
                    graph._edges(spark, sf_dir), per_hop_deg=per_hop
                )
            return run
        section("walks", walks(False), walks(True))

    # --- shj: guide §3.1 — let the planner/AQE pick shuffled-hash
    # joins (no sort) where the per-partition build side fits.
    # Interleaved per query: new = preferSortMergeJoin=false +
    # AQE SMJ→SHJ conversion at the measured-size threshold;
    # old = defaults (SMJ preferred, conversion off).
    SHJ_QUERIES = (
        "join_fact_fact",
        "join_bloom_plain",
        "q21_waiting_suppliers",
        "dedup_minhash_lsh",
        "dedup_incremental_ingest",
        "corpus_curation_funnel",
    )
    if "shj" in sections:
        def with_conf(prefer_smj: bool, fn):
            # The DRAIN runs inside the conf window (returns None to
            # timed()): these confs are consulted at physical planning
            # / AQE re-planning time, i.e. when the write executes —
            # not when the DataFrame is built (r14 ADVICE: the first
            # cut restored confs before execution and measured
            # default-vs-default).
            def run():
                spark.conf.set(
                    "spark.sql.join.preferSortMergeJoin",
                    "true" if prefer_smj else "false",
                )
                spark.conf.set(
                    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                    "0" if prefer_smj else "67108864",
                )
                try:
                    fn().write.format("noop").mode("overwrite").save()
                finally:
                    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
                    spark.conf.set(
                        "spark.sql.adaptive."
                        "maxShuffledHashJoinLocalMapThreshold",
                        "0",
                    )
            return run

        for qname in SHJ_QUERIES:
            fn = specs[qname].fn
            section(
                f"shj:{qname}",
                with_conf(False, lambda f=fn: f(spark, sf_dir)),
                with_conf(True, lambda f=fn: f(spark, sf_dir)),
            )

    # --- shj_aqe: the AQE-only form — static planner unchanged
    # (preferSortMergeJoin stays true), only the runtime SMJ→SHJ
    # conversion from MEASURED partition sizes is toggled. This is the
    # memory-safe variant (bounded by the threshold per partition).
    if "shj_aqe" in sections:
        def with_thresh(on: bool, fn):
            # drain inside the conf window — see with_conf above
            def run():
                spark.conf.set(
                    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                    "67108864" if on else "0",
                )
                try:
                    fn().write.format("noop").mode("overwrite").save()
                finally:
                    spark.conf.set(
                        "spark.sql.adaptive."
                        "maxShuffledHashJoinLocalMapThreshold",
                        "0",
                    )
            return run

        for qname in SHJ_QUERIES:
            fn = specs[qname].fn
            section(
                f"shj_aqe:{qname}",
                with_thresh(True, lambda f=fn: f(spark, sf_dir)),
                with_thresh(False, lambda f=fn: f(spark, sf_dir)),
            )

    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
