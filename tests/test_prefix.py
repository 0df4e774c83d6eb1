"""Prefix-offset decomposition (operators/prefix.py): exactness of the
distributed global rank / running sum / closed-form NTILE, and the plan
pin that keeps the three r6 scale-killers dead — no unpartitioned
window over a corpus-proportional input may ever come back.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_citation_spark.operators.prefix import (
    ntile_from_rank,
    with_global_order,
)


def _unpartitioned_window_lines(df) -> list[str]:
    """Physical-plan lines of Window nodes with NO partition spec.

    A partitioned Window prints three top-level bracket groups
    (``Window [exprs], [partition], [order]``), an unpartitioned one
    two (``Window [exprs], [order]``) — so exactly one ``], [``
    separator marks the single-partition shape.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = []
    for line in plan.splitlines():
        s = line.strip().lstrip(":+- ").strip()
        if s.startswith("Window [") and s.count("], [") == 1:
            hits.append(s)
    return hits


def test_detector_sees_unpartitioned_windows(spark):
    """Negative control: the detector itself must fire on the shape it
    polices, else the plan pin below is vacuous."""
    df = spark.range(100).select(
        F.col("id"), F.sum("id").over(Window.orderBy("id")).alias("c")
    )
    assert _unpartitioned_window_lines(df), "detector missed a global window"
    ok = spark.range(100).select(
        F.col("id"),
        F.sum("id").over(Window.partitionBy(F.col("id") % 4).orderBy("id")).alias("c"),
    )
    assert not _unpartitioned_window_lines(ok)


@pytest.mark.parametrize(
    "query",
    ["layout_zorder_stats", "corpus_pps_systematic_sample",
     "stats_ks_two_sample", "stats_exact_quantiles_distributed",
     # r9: sequence packing's global token cumsum rides the same
     # decomposition — pin it to the same no-SinglePartition guarantee
     "corpus_sequence_packing"],
)
def test_no_global_window_over_corpus(spark, sf_dir, query):
    """The three queries the r6 verdict marked `weak` (single-task
    global sorts) now plan every corpus window PARTITIONED; the only
    unpartitioned windows left are the helper's exclusive-prefix scans
    over the ≤ n_parts-row totals tables (recognizable by their
    `_pp_pid` sort key)."""
    from mapreduce_citation_spark.registry import all_specs

    df = all_specs()[query].fn(spark, sf_dir)
    for line in _unpartitioned_window_lines(df):
        assert "_pp_pid" in line, f"corpus-proportional global window: {line}"


def test_global_rank_and_cumsum_exact(spark):
    """with_global_order == row_number/running-sum semantics, verified
    against a Python replay on a permuted key (so range partitioning
    actually has to reorder), across partition-count regimes including
    n_parts > distinct keys (forces empty partitions)."""
    rows = [(int((i * 37) % 1001), int(i % 7)) for i in range(1001)]
    df = spark.createDataFrame(rows, "k INT, w INT").repartition(5)
    for n_parts in (1, 4, 32):
        out = with_global_order(
            df, ["k"], rank="r", cumsum={"cw": "w"}, total="n", n_parts=n_parts
        )
        got = sorted(out.collect(), key=lambda x: x.k)
        exp_rank, exp_cum = {}, {}
        c = 0
        for i, (k, w) in enumerate(sorted(rows)):
            c += w
            exp_rank[k], exp_cum[k] = i + 1, c
        assert all(r.n == 1001 for r in got)
        assert [r.r for r in got] == [exp_rank[r.k] for r in got]
        assert [r.cw for r in got] == [exp_cum[r.k] for r in got]


@pytest.mark.parametrize(
    "n,k",
    # the n < k rows pin the short-input guard (Spark `div 0` is a
    # silent NULL; ANSI NTILE gives row i bucket i)
    [(97, 16), (16, 16), (160, 16), (1001, 7), (5, 16), (1, 7), (15, 16)],
)
def test_ntile_from_rank_matches_ansi_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("r"))
    ref = df.select(
        "r", F.ntile(k).over(Window.orderBy("r")).alias("want")
    )
    got = df.select("r", F.lit(n).alias("n")).select(
        "r", ntile_from_rank("r", "n", k).alias("got")
    )
    j = ref.join(got, "r").filter(F.col("want") != F.col("got"))
    assert j.count() == 0


def test_exact_quantiles_match_numpy_lower(spark, sf_dir):
    """The rank-selection quantiles equal numpy's 'lower' (discrete)
    method on the same data — an independent third implementation
    beside the Spark plan and the SQL oracle."""
    import numpy as np
    import pandas as pd

    from mapreduce_citation_spark.operators.stats import (
        stats_exact_quantiles_distributed,
    )

    got = {
        r["quantile"]: r["value"]
        for r in stats_exact_quantiles_distributed(spark, sf_dir).collect()
    }
    v = np.sort(pd.read_parquet(f"{sf_dir}/orders.parquet")["o_totalprice"].values)
    for q in (0.5, 0.9, 0.99):
        # integer index math, mirroring the operator exactly
        num, den = {0.5: (1, 2), 0.9: (9, 10), 0.99: (99, 100)}[q]
        idx = (len(v) - 1) * num // den
        assert got[str(q)] == v[idx]
        assert got[str(q)] == np.quantile(v, q, method="lower")
