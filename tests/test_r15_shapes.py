"""r15 optimization-round shape toggles: both variants of every
toggled derivation must produce IDENTICAL row sets — the optimization
changes the plan, never the answer.

Covered toggles (see tools/ab_r15.py for the timing side):
- dedup.PREFIX_RANK: in-row rarest-first prefix (collect_list +
  array_sort + slice) vs the df-join + row_number window + sizes
  join. Equality is asserted on the PREFIX ROWS themselves (doc_id,
  s, rk, n_sh), not just operator output — the two derivations claim
  the same (df ASC, s ASC) total order, so even ranks must match.
- pipeline.FUNNEL_EXACT_DEDUP: keeper semi-join vs md5-window rank-1
  (the keeper variant lost the A/B and does NOT ship, but it stays
  reachable — so its equivalence stays pinned).
- tpch_extra.Q21_SOLE: countDistinct(==1) semi-join vs late×late
  semi + anti pair.
- text.BOILER_BASE_CACHE: persist vs recompute (plan-only change; the
  output equality is a cheap regression guard for the cache wiring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_citation_spark.operators import dedup, pipeline, text, tpch_extra
from mapreduce_citation_spark.registry import all_specs


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def _toggle_rows(spark, sf_dir, mod, attr: str, values: tuple[str, str],
                 fn) -> tuple[set[tuple], set[tuple]]:
    out = []
    prev = getattr(mod, attr)
    try:
        for v in values:
            setattr(mod, attr, v)
            spark.catalog.clearCache()
            out.append(_rows(fn(spark, sf_dir)))
    finally:
        setattr(mod, attr, prev)
        spark.catalog.clearCache()
    return out[0], out[1]


def test_rarest_prefix_variants_identical_rows(spark, sf_dir):
    """Not just same downstream output — the same PREFIX ROWS with the
    same ranks, since both variants implement the identical (df, s)
    total order."""
    d = dedup._docs(spark, sf_dir)
    ex = dedup.exploded_word_shingles(d, 3)
    prev = dedup.PREFIX_RANK
    try:
        dedup.PREFIX_RANK = "inrow"
        inrow = _rows(dedup._rarest_prefix(ex))
        dedup.PREFIX_RANK = "window"
        window = _rows(dedup._rarest_prefix(ex))
    finally:
        dedup.PREFIX_RANK = prev
    assert inrow, "empty prefix stream — fixture or derivation broken"
    # n_sh is long in both branches; rk int in both — compare values
    assert inrow == window


def test_ingest_report_prefix_variants_identical(spark, sf_dir):
    fn = all_specs()["dedup_incremental_ingest"].fn
    a, b = _toggle_rows(
        spark, sf_dir, dedup, "PREFIX_RANK", ("inrow", "window"), fn
    )
    assert a == b and a


def test_funnel_exact_dedup_variants_identical(spark, sf_dir):
    fn = all_specs()["corpus_curation_funnel"].fn
    a, b = _toggle_rows(
        spark, sf_dir, pipeline, "FUNNEL_EXACT_DEDUP",
        ("keeper", "window"), fn,
    )
    assert a == b and a


def test_q21_sole_variants_identical(spark, sf_dir):
    fn = all_specs()["q21_waiting_suppliers"].fn
    a, b = _toggle_rows(
        spark, sf_dir, tpch_extra, "Q21_SOLE", ("count", "selfjoin"), fn
    )
    assert a == b
    # the sf0.001 fixture may legitimately produce few rows; make the
    # test non-vacuous by checking the late table itself is non-empty
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    late_n = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .count()
    )
    assert late_n > 0, "fixture has no late lines — q21 test vacuous"


def test_boiler_base_cache_variants_identical(spark, sf_dir):
    fn = all_specs()["text_boilerplate_strip"].fn
    a, b = _toggle_rows(
        spark, sf_dir, text, "BOILER_BASE_CACHE", ("persist", "none"), fn
    )
    assert a == b and a
