"""Same-session interleaved A/Bs for the r15 optimization candidates
(CLAUDE.md: interleave FIRST, then decide; never conclude from
cross-window numbers).

1. ``funnel``: corpus_curation_funnel stage-2 exact dedup — keeper
   semi-join (digest-only groupBy + doc_id semi-join, the dedup_exact
   shape; VERDICT r14 #1) vs the r14 row_number window over
   md5(text), which shuffles+sorts the (digest, text, n_chars)
   payload. Toggled via ``pipeline.FUNNEL_EXACT_DEDUP``.
2. ``ingest``: dedup_incremental_ingest rarest-first prefix
   derivation — in-row (collect_list + array_sort + slice before the
   explode; drops the sizes join and both SMJ/window sorts; VERDICT
   r14 #3) vs the df-join + row_number window + sizes join. Toggled
   via ``dedup.PREFIX_RANK``.
3. ``ngram``: dedup_ngram_jaccard — same prefix-derivation toggle on
   the self-join operator (not in the bench set; measured so the
   shared helper's default is justified for both callers).
4. ``boiler``: text_boilerplate_strip — persist the (doc_id, n_tok,
   segs) base frame (two consumers: the hash stream and the apply
   join; r7 cache rule) vs recomputing tokenization+segmentation per
   consumer. Toggled via ``text.BOILER_BASE_CACHE``.
5. ``q21``: q21_waiting_suppliers — orderkey-keyed countDistinct
   (== 1) semi-join for "no other late supplier" vs the late×late
   semi + (orderkey, suppkey) anti pair. Toggled via
   ``tpch_extra.Q21_SOLE``.
6. ``ingest_fixed``: the PREFIX_RANK toggle on the FIXED-delta cohort
   geometry (base-range doc_ids only, so the delta stays constant as
   the corpus grows — r9 protocol: a prefix-derivation change must
   win on BOTH cohort geometries; the registered %8 operator is the
   fraction geometry).
7. ``funnel_frag``: the funnel's stage-1+2 FRAGMENT in isolation
   (quality gate → exact dedup → drain survivors) — the full-funnel
   section's stage-2 delta is ~10% of 8.5 s of common work
   (dedup_clusters + gram streams), so the embedded A/B is
   insensitive; this times exactly the operator the toggle changes.

Every timed run starts from a cleared SQL cache so both variants pay
their materialization; variants alternate A,B,A,B,... so window drift
hits both sides equally. Median of 5 per side.

Usage: python tools/ab_r15.py [--sf-dir DIR] [--json PATH]
       [--sections funnel,ingest,ngram,boiler] [--runs N]
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
    sections = {"funnel", "ingest", "ngram", "boiler", "q21"}
    runs = 5
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--json" in args:
        json_path = args[args.index("--json") + 1]
    if "--sections" in args:
        sections = set(args[args.index("--sections") + 1].split(","))
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])

    from bench import _calibrate

    from mapreduce_citation_spark.operators import (
        dedup,
        pipeline,
        text,
        tpch_extra,
    )
    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("ab-r15")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    report: dict = {"sf_dir": sf_dir, "cal_before": _calibrate()}

    def timed(fn) -> float:
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
        for _ in range(runs):
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

    def toggled(mod, attr: str, value: str, fn):
        def run():
            prev = getattr(mod, attr)
            setattr(mod, attr, value)
            try:
                return fn()
            finally:
                setattr(mod, attr, prev)
        return run

    if "funnel" in sections:
        fn = specs["corpus_curation_funnel"].fn
        section(
            "funnel",
            toggled(
                pipeline, "FUNNEL_EXACT_DEDUP", "keeper",
                lambda: fn(spark, sf_dir),
            ),
            toggled(
                pipeline, "FUNNEL_EXACT_DEDUP", "window",
                lambda: fn(spark, sf_dir),
            ),
        )
    if "ingest" in sections:
        fn = specs["dedup_incremental_ingest"].fn
        section(
            "ingest",
            toggled(dedup, "PREFIX_RANK", "inrow", lambda: fn(spark, sf_dir)),
            toggled(dedup, "PREFIX_RANK", "window", lambda: fn(spark, sf_dir)),
        )
    if "ngram" in sections:
        fn = specs["dedup_ngram_jaccard"].fn
        section(
            "ngram",
            toggled(dedup, "PREFIX_RANK", "inrow", lambda: fn(spark, sf_dir)),
            toggled(dedup, "PREFIX_RANK", "window", lambda: fn(spark, sf_dir)),
        )
    if "boiler" in sections:
        fn = specs["text_boilerplate_strip"].fn
        section(
            "boiler",
            toggled(
                text, "BOILER_BASE_CACHE", "persist",
                lambda: fn(spark, sf_dir),
            ),
            toggled(
                text, "BOILER_BASE_CACHE", "none", lambda: fn(spark, sf_dir)
            ),
        )

    if "ingest_fixed" in sections:
        from pyspark.sql import functions as F

        # fixed-delta cohort: the %8 cohort RESTRICTED to the base
        # replica's id range (gen_corpus stride 10000), so the delta
        # stays 1/8 of the BASE corpus no matter the expansion factor
        pred = (F.col("doc_id") % 8 == 0) & (F.col("doc_id") < 10000)

        def ing(variant: str):
            def run():
                prev = dedup.PREFIX_RANK
                dedup.PREFIX_RANK = variant
                try:
                    return dedup.incremental_ingest_report(
                        dedup._docs(spark, sf_dir), pred
                    )
                finally:
                    dedup.PREFIX_RANK = prev
            return run

        section("ingest_fixed", ing("inrow"), ing("window"))

    if "funnel_frag" in sections:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from mapreduce_citation_spark.operators.text import QG_KEEP_SPARK
        from mapreduce_citation_spark.sources.readers import load_table

        def frag(variant: str):
            def run():
                d = load_table(spark, sf_dir, "documents")
                s1 = d.select("doc_id", "text", "n_chars").filter(
                    F.expr(QG_KEEP_SPARK)
                )
                if variant == "window":
                    w = Window.partitionBy(
                        F.md5(F.col("text").cast("binary"))
                    ).orderBy("doc_id")
                    return (
                        s1.withColumn("_rn", F.row_number().over(w))
                        .filter(F.col("_rn") == 1)
                        .drop("_rn")
                    )
                keep2 = (
                    s1.groupBy(
                        F.md5(F.col("text").cast("binary")).alias("_h")
                    )
                    .agg(F.min("doc_id").alias("doc_id"))
                    .select("doc_id")
                )
                return s1.join(keep2, "doc_id", "left_semi")
            return run

        section("funnel_frag", frag("keeper"), frag("window"))

    if "q21" in sections:
        fn = specs["q21_waiting_suppliers"].fn
        section(
            "q21",
            toggled(
                tpch_extra, "Q21_SOLE", "count", lambda: fn(spark, sf_dir)
            ),
            toggled(
                tpch_extra, "Q21_SOLE", "selfjoin", lambda: fn(spark, sf_dir)
            ),
        )

    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
