"""Statistical aggregates: exact percentiles, decimal-exact variance /
stddev / correlation.

Float-determinism strategy: moment sums (Σx, Σx², Σxy) are computed in
DECIMAL (exact, order-independent), cast to DOUBLE, and the closed-form
moment formulas are evaluated in double — every input to the float
arithmetic is bit-identical across engines, so the outputs are too.
(Engine-native stddev/corr use streaming/Welford accumulation whose
result depends on partition order — correct statistically, but not
hash-comparable; the moment form is what a distributed engine should
expose for reproducible pipelines anyway.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

OPRICE = "CAST(o_totalprice AS DECIMAL(12,2))"
QTY = "CAST(l_quantity AS DECIMAL(4,0))"
PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"


@register(
    "stats_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.95) AS p95_qty,
       quantile_cont(l_extendedprice, 0.25) AS p25_price,
       quantile_cont(l_extendedprice, 0.75) AS p75_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("stats", "percentile"),
)
def stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` — same linear-interpolation definition, verified
    bit-identical on the fixtures). For 100 TB use percentile_approx;
    exact percentile requires a per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("p75_price"),
    )


@register(
    "stats_variance",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n,
       (CAST(SUM({OPRICE} * {OPRICE}) AS DOUBLE)
         - CAST(SUM({OPRICE}) AS DOUBLE) * CAST(SUM({OPRICE}) AS DOUBLE) / COUNT(*))
         / COUNT(*) AS var_pop,
       sqrt((CAST(SUM({OPRICE} * {OPRICE}) AS DOUBLE)
         - CAST(SUM({OPRICE}) AS DOUBLE) * CAST(SUM({OPRICE}) AS DOUBLE) / COUNT(*))
         / COUNT(*)) AS stddev_pop
FROM orders
GROUP BY o_orderstatus
""",
    tags=("stats", "variance"),
)
def stats_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev from decimal-exact moments."""
    o = load_table(spark, sf_dir, "orders")
    var = (
        f"(CAST(SUM({OPRICE} * {OPRICE}) AS DOUBLE)"
        f" - CAST(SUM({OPRICE}) AS DOUBLE) * CAST(SUM({OPRICE}) AS DOUBLE) / COUNT(*))"
        " / COUNT(*)"
    )
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(var).alias("var_pop"),
        F.expr(f"sqrt({var})").alias("stddev_pop"),
    )


@register(
    "stats_correlation",
    oracle=f"""
SELECT l_returnflag,
       (COUNT(*) * CAST(SUM({QTY} * {PRICE}) AS DOUBLE)
         - CAST(SUM({QTY}) AS DOUBLE) * CAST(SUM({PRICE}) AS DOUBLE))
       / (sqrt(COUNT(*) * CAST(SUM({QTY} * {QTY}) AS DOUBLE)
               - CAST(SUM({QTY}) AS DOUBLE) * CAST(SUM({QTY}) AS DOUBLE))
          * sqrt(COUNT(*) * CAST(SUM({PRICE} * {PRICE}) AS DOUBLE)
               - CAST(SUM({PRICE}) AS DOUBLE) * CAST(SUM({PRICE}) AS DOUBLE)))
       AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("stats", "correlation"),
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from decimal-exact cross-moments (quantity
    is strongly correlated with extended price in TPC-H-shaped data —
    a sanity property pinned in pytest)."""
    li = load_table(spark, sf_dir, "lineitem")
    corr = (
        f"(COUNT(*) * CAST(SUM({QTY} * {PRICE}) AS DOUBLE)"
        f" - CAST(SUM({QTY}) AS DOUBLE) * CAST(SUM({PRICE}) AS DOUBLE))"
        f" / (sqrt(COUNT(*) * CAST(SUM({QTY} * {QTY}) AS DOUBLE)"
        f"      - CAST(SUM({QTY}) AS DOUBLE) * CAST(SUM({QTY}) AS DOUBLE))"
        f"    * sqrt(COUNT(*) * CAST(SUM({PRICE} * {PRICE}) AS DOUBLE)"
        f"      - CAST(SUM({PRICE}) AS DOUBLE) * CAST(SUM({PRICE}) AS DOUBLE)))"
    )
    return li.groupBy("l_returnflag").agg(F.expr(corr).alias("corr_qty_price"))


@register(
    "stats_approx",
    tags=("stats", "approx", "rows-only"),
)
def stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB path: HLL++ distinct counts
    and GK-sketch percentiles (single pass, bounded memory, mergeable
    across partitions). Rows-only: the estimates are sketch-specific,
    so DuckDB's approx functions produce different (equally valid)
    numbers; accuracy bounds vs exact values are pinned in pytest."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 1000)").alias("approx_median"),
    )
