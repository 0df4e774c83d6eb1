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
    from pyspark.sql import functions as F

    from mapreduce_citation_spark.operators.stats import stats_approx
    from mapreduce_citation_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["nd"], r["med"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("nd"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("med"),
        )
        .collect()
    }
    for r in stats_approx(spark, sf_dir).collect():
        nd, med = exact[r["l_returnflag"]]
        assert abs(r["approx_parts"] - nd) / nd < 0.1  # HLL++ rsd default 5%
        assert abs(r["approx_median"] - med) / med < 0.1


def test_salted_join_equals_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_citation_spark.operators.joins import salted_join
    from mapreduce_citation_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = o.join(c, o.o_custkey == c.c_custkey).count()
    salted = salted_join(o, c, "o_custkey", "c_custkey", n_salts=8).count()
    assert salted == plain
