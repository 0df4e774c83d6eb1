"""General relational operator surface (SURVEY.md §7 phase 2).

The reference's engine is generic (task queue + hash shuffle) with the
citation query plugged in at two callbacks (SURVEY.md §2.3); the
Spark-native generalization of that surface is the full DataFrame
relational algebra. Each query here is a reusable builder registered
with a DuckDB oracle.

Cross-engine float determinism: money columns (2-decimal doubles in
the fixtures) are cast to DECIMAL before arithmetic/aggregation and
the result cast back to DOUBLE, so Spark and DuckDB produce
bit-identical values regardless of partial-aggregation order. Whole-
number doubles (l_quantity) sum exactly in binary and need no cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

# Decimal-exact fragments (shared between Spark F.expr and oracle SQL).
PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
DISC = "CAST(l_discount AS DECIMAL(3,2))"
TAX = "CAST(l_tax AS DECIMAL(3,2))"
OPRICE = "CAST(o_totalprice AS DECIMAL(12,2))"
ACCTBAL = "CAST(c_acctbal AS DECIMAL(12,2))"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# TPC-H-style aggregation pipelines
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM({PRICE}) AS DOUBLE) AS sum_base_price,
       CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({PRICE} * (1 - {DISC}) * (1 + {TAX})) AS DOUBLE) AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       CAST(SUM({PRICE}) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM({DISC}) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    bench=True,
    tags=("aggregate", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate groupBy. Catalyst
    plans partial HashAggregate before the exchange (the map-side
    combine the reference hand-rolls at mapper.py:70-78), and the
    shipdate filter + 7-column pruning push into the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("SUM(l_quantity)").alias("sum_qty"),
            F.expr(f"CAST(SUM({PRICE}) AS DOUBLE)").alias("sum_base_price"),
            F.expr(f"CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE)").alias("sum_disc_price"),
            F.expr(
                f"CAST(SUM({PRICE} * (1 - {DISC}) * (1 + {TAX})) AS DOUBLE)"
            ).alias("sum_charge"),
            F.expr("SUM(l_quantity) / COUNT(*)").alias("avg_qty"),
            F.expr(f"CAST(SUM({PRICE}) AS DOUBLE) / COUNT(*)").alias("avg_price"),
            F.expr(f"CAST(SUM({DISC}) AS DOUBLE) / COUNT(*)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    bench=True,
    tags=("join", "aggregate", "topk", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    customer is far below the broadcast threshold, so the c_custkey
    join is a BroadcastHashJoin (no shuffle of orders); the decimal
    revenue makes the ORDER BY deterministic, orderkey breaks ties."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE)").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
    bench=True,
    tags=("join", "aggregate", "tpch"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a local-supplier condition
    (c_nationkey = s_nationkey). All dims broadcast; only the
    lineitem⋈orders join shuffles, on the natural key."""
    c, o, li, s, n, r = (
        _t(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    r = r.filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(f"CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         {PRICE} * (1 - {DISC}) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("join", "aggregate", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair volume with a
    disjunctive join predicate and per-year rollup."""
    s, li, o, c, n = (
        _t(spark, sf_dir, t)
        for t in ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("nk1"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("nk2"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.expr(f"CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE)").alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    tags=("join", "aggregate", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking — date-bounded
    join, multi-column group, deterministic top-20."""
    c, o, li, n = (
        _t(spark, sf_dir, t) for t in ("customer", "orders", "lineitem", "nation")
    )
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = li.filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(f"CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle=f"""
SELECT CAST(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN {PRICE} * (1 - {DISC})
                              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem, part
WHERE l_partkey = p_partkey
""",
    tags=("join", "aggregate", "tpch"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate share over a broadcast
    part join (decimal-exact numerator and denominator)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    num = (
        f"CAST(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%' "
        f"THEN {PRICE} * (1 - {DISC}) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)"
        f" / CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE)"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.expr(num).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "monthly_revenue",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM({OPRICE}) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1, 2
""",
    tags=("aggregate", "datetime"),
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: year/month extraction + decimal-exact revenue."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(f"CAST(SUM({OPRICE}) AS DOUBLE)").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / distinct / having
# ---------------------------------------------------------------------------

@register(
    "rollup_returns",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("aggregate", "rollup"),
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (flag, status), (flag), () subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.expr("SUM(l_quantity)").alias("sum_qty")
    )


@register(
    "cube_status_priority",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n, CAST(SUM({OPRICE}) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("aggregate", "cube"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations of (status, priority)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST(SUM({OPRICE}) AS DOUBLE)").alias("revenue"),
    )


@register(
    "grouping_sets_sales",
    oracle="""
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
    tags=("aggregate", "grouping-sets"),
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint single-key sets) via SQL."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "distinct_count_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
    tags=("aggregate", "distinct"),
)
def distinct_count_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Catalyst plans the expand/two-phase
    distinct count; exact (approx_count_distinct is bench-only since
    its estimate is engine-specific)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "having_active_customers",
    oracle=f"""
SELECT o_custkey, COUNT(*) AS n_orders, CAST(SUM({OPRICE}) AS DOUBLE) AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""",
    tags=("aggregate", "having"),
)
def having_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(f"CAST(SUM({OPRICE}) AS DOUBLE)").alias("spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    tags=("distinct",),
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register(
    "set_ops_customers",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT then EXCEPT chain (distinct set semantics)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    failed = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big).exceptAll(failed.distinct())


@register(
    "union_all_tagged",
    oracle="""
SELECT src, COUNT(*) AS n FROM (
  SELECT 'high' AS src, o_custkey FROM orders WHERE o_totalprice > 250000
  UNION ALL
  SELECT 'urgent' AS src, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
) u
GROUP BY src
""",
    tags=("setop", "union"),
)
def union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged subsets (bag semantics preserved)."""
    o = _t(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 250000).select(
        F.lit("high").alias("src"), "o_custkey"
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src"), "o_custkey"
    )
    return high.unionAll(urgent).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


@register(
    "intersect_all_parts",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
""",
    tags=("setop",),
)
def intersect_all_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection with multiplicity."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_partkey")
        .intersectAll(li.filter(F.col("l_linestatus") == "F").select("l_partkey"))
    )


# ---------------------------------------------------------------------------
# Scalar function coverage (string / datetime / math / conditional)
# ---------------------------------------------------------------------------

@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LOWER(p_type) AS type_lower,
       SUBSTR(p_name, 1, 8) AS name_prefix,
       LENGTH(p_name) AS name_len,
       REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
       CONCAT(p_brand, '/', p_type) AS brand_type,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass
FROM part
""",
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function projection (all JVM built-ins, one codegen span)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        # long, not int: DuckDB LENGTH returns BIGINT — keep dtypes aligned
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0).alias("is_brass"),
    )


@register(
    "scalar_datetime_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS d,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
       CAST(EXTRACT(isodow FROM o_orderdate) AS INT) AS iso_dow,
       DATE_TRUNC('month', o_orderdate) AS month_start
FROM orders
WHERE o_orderkey < 1000
""",
    tags=("scalar", "datetime"),
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction. ISO day-of-week via weekday()+1 (Spark's
    dayofweek() is Sunday-based=1; DuckDB's isodow is Monday-based=1)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25) AS qty_dev,
       CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_bucket,
       CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_bucket_up,
       SQRT(l_quantity) AS qty_sqrt,
       l_partkey % 10 AS pk_mod,
       GREATEST(l_quantity, 25.0) AS qty_hi,
       LEAST(l_quantity, 25.0) AS qty_lo
FROM lineitem
WHERE l_orderkey < 500
""",
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins. sqrt is IEEE-correctly-rounded in both engines;
    transcendentals (ln/exp/pow) are deliberately excluded from
    oracle-checked queries since libm results differ in ulps."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_bucket_up"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_partkey") % 10).alias("pk_mod"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
    )


@register(
    "case_bucketing",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            WHEN o_totalprice < 400000 THEN 'large'
            ELSE 'jumbo' END AS bucket,
       COUNT(*) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY 1
""",
    tags=("scalar", "conditional", "aggregate"),
)
def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + min/max (exact on raw doubles)."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .when(F.col("o_totalprice") < 400000, "large")
        .otherwise("jumbo")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders
GROUP BY o_orderpriority
""",
    tags=("pivot", "aggregate"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via .pivot() with explicit value list (avoids the extra
    distinct-values job — important at scale) — conditional-agg SQL
    equivalent on the oracle side."""
    o = _t(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_finished"),
        F.coalesce("P", F.lit(0)).alias("n_pending"),
    )


@register(
    "order_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 20 OFFSET 10
""",
    tags=("sort", "limit"),
)
def order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: total order on the key, offset+limit."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(10).limit(20)


@register(
    "q4_order_priority_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
    tags=("join", "subquery", "exists", "tpch"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — Catalyst rewrites it to a
    left-semi join on the correlation key, which is exactly what we'd
    write by hand."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q4")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders_q4 o
        WHERE o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem_q4 l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q17_small_quantity_avg",
    oracle=f"""
SELECT p_brand,
       CAST(SUM({PRICE}) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l_quantity < (
  SELECT 0.5 * SUM(l_quantity) / COUNT(*)
  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p_brand
""",
    tags=("join", "subquery", "scalar-subquery", "tpch"),
)
def q17_small_quantity_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (below half the
    per-part average quantity). De-correlated to a per-part WINDOW
    over lineitem itself — ONE lineitem scan, one exchange on
    l_partkey (the aggregate-then-join form scans lineitem twice and
    adds a part-cardinality join that must not be force-broadcast at
    100 TB). avg as exact SUM/COUNT (whole-number quantities →
    deterministic double); no broadcast hints — AQE picks the part
    join strategy from measured sizes."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    half_avg = (F.lit(0.5) * F.sum("l_quantity").over(w)) / F.count(F.lit(1)).over(w)
    return (
        li.withColumn("half_avg_qty", half_avg)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.expr(f"CAST(SUM({PRICE}) AS DOUBLE)").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q16_supplier_variety",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_size IN (5, 15, 25, 35, 45)
GROUP BY p_brand, p_size
""",
    tags=("join", "distinct", "tpch"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count over a filtered broadcast join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(5, 15, 25, 35, 45))
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
    tags=("join", "disjunctive", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides
    — Catalyst extracts the common join key and pushes the per-side
    conjuncts below the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        F.expr(f"CAST(SUM({PRICE} * (1 - {DISC})) AS DOUBLE)").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_dormant_customers",
    oracle=f"""
WITH avg_bal AS (
  SELECT CAST(SUM({ACCTBAL}) AS DOUBLE) / COUNT(*) AS v
  FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c_nationkey % 5 AS INT) AS cntry_group,
       COUNT(*) AS n_customers,
       CAST(SUM({ACCTBAL}) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal.v
  AND c_nationkey % 5 IN (1, 2, 3)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
  )
GROUP BY 1
""",
    tags=("join", "subquery", "anti", "tpch"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global avg balance,
    decimal-exact) + anti join (no pending orders) + derived grouping
    key."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    # scalar subquery as a lazy 1-row broadcast cross-join (no
    # driver-side collect; the whole query stays one Spark job)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.expr(f"CAST(SUM({ACCTBAL}) AS DOUBLE) / COUNT(*)").alias("_avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(
            (F.col("c_acctbal") > F.col("_avg_bal"))
            & (F.col("c_nationkey") % 5).isin(1, 2, 3)
        )
        .drop("_avg_bal")
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntry_group"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr(f"CAST(SUM({ACCTBAL}) AS DOUBLE)").alias("total_bal"),
        )
    )


@register(
    "agg_salted_two_phase",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""",
    tags=("aggregate", "skew", "salting"),
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot group keys: phase 1 groups
    by (key, salt) spreading each hot key over 16 reducers, phase 2
    merges the partials. Counts and decimal sums re-aggregate exactly,
    so the oracle is the PLAIN aggregation — proving the rewrite is a
    pure physical optimization. (Spark's own partial aggregation
    handles most skew; explicit salting is for high-cardinality
    partials or skewed distinct-style aggs.)"""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(16))
    )
    phase1 = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.expr("SUM(CAST(value AS DECIMAL(18,2)))").alias("pv"),
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.expr("CAST(SUM(pv) AS DOUBLE)").alias("total_value"),
    )


@register(
    "struct_funcs_showcase",
    oracle="""
SELECT o_orderkey,
       struct_pack(k := o_custkey, p := o_totalprice).k AS cust_from_struct,
       struct_pack(k := o_custkey, p := o_totalprice).p AS price_from_struct
FROM orders WHERE o_orderkey < 300
""",
    tags=("struct", "scalar"),
)
def struct_funcs_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (named_struct / struct_pack)
    — flattened back to scalars for the hash compare."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    s = F.struct(F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("p"))
    return o.select(
        "o_orderkey",
        s.getField("k").alias("cust_from_struct"),
        s.getField("p").alias("price_from_struct"),
    )


@register(
    "string_agg_nations",
    oracle="""
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
""",
    tags=("aggregate", "string-agg"),
)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect → sort → join
    keeps the result deterministic under parallel collection."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, value FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
  FROM lineitem WHERE l_orderkey < 200
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey < 200
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount
  FROM lineitem WHERE l_orderkey < 200
) u
""",
    tags=("unpivot",),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of three lineitem measures."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).withColumn("measure", F.regexp_replace("measure", "^l_", ""))


@register(
    "array_funcs_showcase",
    oracle="""
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
       array_to_string(list_sort(list(o_orderkey))[1:3], ',') AS first3,
       CAST(len(list(o_orderkey)) AS INT) AS n,
       CASE WHEN list_contains(list(o_orderstatus), 'P') THEN 1 ELSE 0 END AS has_pending
FROM orders
WHERE o_custkey < 50
GROUP BY o_custkey
""",
    tags=("array",),
)
def array_funcs_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array operators (collect, sort, slice, contains) with string-
    serialized outputs so the hash compare stays scalar."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    arr = F.array_sort(F.collect_list("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.array_join(arr, ",").alias("order_keys"),
        F.array_join(F.slice(arr, 1, 3), ",").alias("first3"),
        F.size(F.collect_list("o_orderkey")).alias("n"),
        F.array_contains(F.collect_list("o_orderstatus"), "P")
        .cast("int")
        .alias("has_pending"),
    )


@register(
    "agg_acctbal_stats",
    oracle=f"""
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       CAST(MIN({ACCTBAL}) AS DOUBLE) AS min_bal,
       CAST(MAX({ACCTBAL}) AS DOUBLE) AS max_bal,
       CAST(SUM({ACCTBAL}) AS DOUBLE) AS sum_bal,
       CAST(SUM({ACCTBAL}) AS DOUBLE) / COUNT(*) AS avg_bal
FROM customer
GROUP BY c_nationkey
""",
    tags=("aggregate", "stats"),
)
def agg_acctbal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stat aggregate over a mid-cardinality key."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr(f"CAST(MIN({ACCTBAL}) AS DOUBLE)").alias("min_bal"),
        F.expr(f"CAST(MAX({ACCTBAL}) AS DOUBLE)").alias("max_bal"),
        F.expr(f"CAST(SUM({ACCTBAL}) AS DOUBLE)").alias("sum_bal"),
        F.expr(f"CAST(SUM({ACCTBAL}) AS DOUBLE) / COUNT(*)").alias("avg_bal"),
    )


@register(
    "orders_retention_cohorts",
    oracle="""
WITH f AS (
  SELECT o_custkey,
         MIN(EXTRACT(year FROM o_orderdate) * 12
             + (EXTRACT(month FROM o_orderdate) - 1)) AS cohort_m
  FROM orders GROUP BY o_custkey
)
SELECT CAST(cohort_m // 12 AS INT) AS cohort_year,
       CAST(cohort_m % 12 + 1 AS INT) AS cohort_month,
       CAST((EXTRACT(year FROM o.o_orderdate) * 12
             + (EXTRACT(month FROM o.o_orderdate) - 1)) - cohort_m AS INT)
         AS months_since,
       COUNT(DISTINCT o.o_custkey) AS n_active,
       COUNT(*) AS n_orders
FROM orders o JOIN f USING (o_custkey)
GROUP BY 1, 2, 3
""",
    tags=("aggregate", "cohort", "retention", "datetime"),
)
def orders_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-order month
    (the cohort), activity bucketed by months-since-cohort. Month
    arithmetic stays integral (year*12 + month-1), so the matrix keys
    are exact on both engines; COUNT(DISTINCT) gives active customers
    per cell.

    Scale shape: the cohort month is a MIN window over o_custkey —
    ONE orders scan and one shuffle on the customer key (the
    self-join formulation scans orders twice; the window is the same
    hash partitioning without the second scan) — then one hash
    aggregation on the small (cohort, months_since) key space; the
    distinct expands to a two-phase agg automatically."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    ym = "(year(o_orderdate) * 12 + (month(o_orderdate) - 1))"
    return (
        o.withColumn(
            "cohort_m",
            F.min(F.expr(ym)).over(Window.partitionBy("o_custkey")),
        )
        .groupBy(
            F.expr("CAST(cohort_m div 12 AS INT)").alias("cohort_year"),
            F.expr("CAST(cohort_m % 12 + 1 AS INT)").alias("cohort_month"),
            F.expr(f"CAST({ym} - cohort_m AS INT)").alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "nation_region_revenue_share",
    oracle=f"""
WITH nr AS (
  SELECT r_name AS region, n_name AS nation,
         SUM({OPRICE}) AS rev_d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       CAST(rev_d AS DOUBLE) AS revenue,
       CAST(rev_d AS DOUBLE)
         / CAST(SUM(rev_d) OVER (PARTITION BY region) AS DOUBLE)
         AS region_share
FROM nr
""",
    tags=("aggregate", "window", "share-of-parent"),
)
def nation_region_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent: each nation's revenue as a fraction of its
    region's total — aggregate once on the fine key, then a window
    SUM over the parent key on the aggregated (tiny) result. The
    shares divide two doubles cast from exact DECIMAL sums, so they
    hash-match.

    Scale shape: the fact shuffles once into the nation-level
    aggregate; the parent rollup is a window over ≤|nations| rows —
    never a second pass over the fact, never a self-join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.expr(f"SUM({OPRICE})").alias("rev_d"))
    )
    return nr.select(
        "region",
        "nation",
        F.expr("CAST(rev_d AS DOUBLE)").alias("revenue"),
        F.expr(
            "CAST(rev_d AS DOUBLE)"
            " / CAST(SUM(rev_d) OVER (PARTITION BY region) AS DOUBLE)"
        ).alias("region_share"),
    )


@register(
    "customer_rfm_segments",
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         CAST(SUM({OPRICE}) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT CAST(NTILE(5) OVER (ORDER BY last_order DESC, o_custkey ASC) AS INT)
         AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INT)
         AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS INT)
         AS m_score,
       o_custkey, frequency, monetary
FROM rfm
""",
    tags=("aggregate", "window", "rfm", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quintiles (NTILE over total orders — each ORDER BY carries the
    custkey tiebreak so the quintile assignment is deterministic on
    both engines; monetary from the exact decimal sum).

    Scale note: NTILE over an ungrouped window is a single-partition
    sort — fine for the per-customer aggregate (|customers| ≪ |fact|),
    and the global sort is exactly what rank-based scoring means. A
    100 TB variant with billions of customers would swap NTILE for
    percentile thresholds (two-pass: approx quantiles → map-side
    bucketing)."""
    o = _t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.expr(f"CAST(SUM({OPRICE}) AS DOUBLE)").alias("monetary"),
    )
    return rfm.select(
        F.expr(
            "CAST(NTILE(5) OVER (ORDER BY last_order DESC, o_custkey ASC) AS INT)"
        ).alias("r_score"),
        F.expr(
            "CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INT)"
        ).alias("f_score"),
        F.expr(
            "CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS INT)"
        ).alias("m_score"),
        "o_custkey",
        "frequency",
        "monetary",
    )


@register(
    "part_abc_classification",
    oracle=f"""
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM({PRICE} * (1 - {DISC})) AS DECIMAL(18,4)) AS revenue_d
  FROM lineitem GROUP BY l_partkey
),
c AS (
  SELECT l_partkey, revenue_d,
         CAST(SUM(revenue_d) OVER (ORDER BY revenue_d DESC, l_partkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)
           / CAST(SUM(revenue_d) OVER () AS DOUBLE) AS cum_share
  FROM pr
)
SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
            WHEN cum_share <= 0.8 THEN 'B'
            ELSE 'C' END AS abc_class,
       COUNT(*) AS n_parts,
       CAST(SUM(revenue_d) AS DOUBLE) AS class_revenue
FROM c
GROUP BY 1
""",
    tags=("aggregate", "window", "pareto", "abc"),
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification: parts ranked by revenue, cumulative
    revenue share thresholds 50%/80% split A/B/C; reports class sizes
    and revenue. The running SUM stays in exact DECIMAL (a running
    DOUBLE sum would diverge: DuckDB evaluates window aggregates with
    a segment tree, so its float association order differs from a
    left-to-right scan) and only the final share division happens in
    double — the class boundaries then agree bit-exactly.

    Scale note: like RFM, the ranking window runs over the PART-level
    aggregate, not the fact; the final rollup is three groups."""
    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.expr(
            f"CAST(SUM({PRICE} * (1 - {DISC})) AS DECIMAL(18,4))"
        ).alias("revenue_d")
    )
    c = pr.select(
        "l_partkey",
        "revenue_d",
        F.expr(
            "CAST(SUM(revenue_d) OVER (ORDER BY revenue_d DESC, l_partkey ASC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
            " / CAST(SUM(revenue_d) OVER () AS DOUBLE)"
        ).alias("cum_share"),
    )
    return (
        c.select(
            F.when(F.col("cum_share") <= 0.5, "A")
            .when(F.col("cum_share") <= 0.8, "B")
            .otherwise("C")
            .alias("abc_class"),
            "revenue_d",
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr("CAST(SUM(revenue_d) AS DOUBLE)").alias("class_revenue"),
        )
    )


@register(
    "segment_interorder_gaps",
    oracle="""
WITH g AS (
  SELECT c_mktsegment,
         date_diff('day',
           LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment,
       COUNT(gap_days) AS n_gaps,
       CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days) AS avg_gap_days,
       quantile_cont(gap_days, 0.5) AS median_gap_days
FROM g
GROUP BY c_mktsegment
""",
    tags=("window", "lag", "aggregate", "engagement"),
)
def segment_interorder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: per-customer gaps between consecutive
    orders (LAG over a (date, orderkey)-total order), rolled up per
    market segment — count, mean (integer-day sums → exact double),
    and exact interpolated median (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, the ``stats_percentiles`` equivalence).

    Scale shape: one shuffle on the customer key serves the LAG
    window; the segment rollup is a 5-key aggregate; customer joins
    broadcast."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn(
            "gap_days",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ),
        )
    )
    return g.groupBy("c_mktsegment").agg(
        F.count("gap_days").alias("n_gaps"),
        (
            F.expr("CAST(SUM(gap_days) AS DOUBLE)") / F.count("gap_days")
        ).alias("avg_gap_days"),
        F.expr("percentile(gap_days, 0.5)").alias("median_gap_days"),
    )


#: One ANSI-SQL string that BOTH engines execute verbatim — the
#: dialect-portable subset (CTEs, joins, windows, decimal-exact
#: aggregation, no engine-specific functions). The Spark side runs
#: THIS string through spark.sql; the oracle IS the same string.
_PORTABLE_SQL = """
WITH per_cust AS (
  SELECT o_custkey AS cust,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
  FROM orders
  GROUP BY o_custkey
),
seg AS (
  SELECT c.c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(p.n_orders) AS BIGINT) AS total_orders,
         CAST(SUM(p.spend) AS DOUBLE) AS total_spend
  FROM per_cust p
  JOIN customer c ON c.c_custkey = p.cust
  GROUP BY c.c_mktsegment
)
SELECT segment, n_customers, total_orders, total_spend,
       CAST(RANK() OVER (ORDER BY total_spend DESC) AS INT) AS spend_rank
FROM seg
"""


@register(
    "sql_dialect_portable",
    oracle=_PORTABLE_SQL,
    tags=("sql", "portability", "ansi"),
)
def sql_dialect_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API parity + PORTABILITY: the exact oracle string runs
    through ``spark.sql`` over temp views — zero dialect translation,
    so this entry pins the engine's ANSI-subset compatibility (CTEs,
    join, window rank, decimal-exact aggregation) rather than a
    DataFrame rewrite of it. A user bringing plain ANSI SQL to this
    engine runs it unchanged."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_PORTABLE_SQL)


@register(
    "scalar_null_semantics",
    oracle="""
WITH b AS (
  SELECT o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS v
  FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(v) AS BIGINT) AS n_nonnull,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(SUM(v) AS DOUBLE) AS sum_skipnull,
       CAST(SUM(COALESCE(v, 0)) AS DOUBLE) AS sum_coalesced,
       CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_null,
       CAST(MIN(v) AS DOUBLE) AS min_skipnull,
       CAST(SUM(v) AS DOUBLE) / COUNT(v) AS avg_skipnull
FROM b GROUP BY o_orderstatus
""",
    tags=("scalar", "null-semantics", "robustness"),
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling parity pinned end to end: aggregate null
    skipping (COUNT(col) vs COUNT(*), SUM/MIN/AVG over a nullable
    column), COALESCE fallbacks, and the null-safe comparison
    ``IS NOT DISTINCT FROM`` — the semantics corner every engine
    must get identically right for pipelines whose data has gaps
    (the fixtures are dense, so the nulls are planted
    deterministically by key). AVG is written as SUM/COUNT of exact
    decimals so the double is bit-stable."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        "o_orderstatus",
        F.expr(
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL"
            " ELSE CAST(o_totalprice AS DECIMAL(12,2)) END"
        ).alias("v"),
    )
    return b.groupBy("o_orderstatus").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(COUNT(v) AS BIGINT)").alias("n_nonnull"),
        F.expr("CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)")
        .alias("n_null"),
        F.expr("CAST(SUM(v) AS DOUBLE)").alias("sum_skipnull"),
        F.expr("CAST(SUM(COALESCE(v, 0)) AS DOUBLE)").alias("sum_coalesced"),
        F.expr(
            "CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_nullsafe_eq_null"),
        F.expr("CAST(MIN(v) AS DOUBLE)").alias("min_skipnull"),
        F.expr("CAST(SUM(v) AS DOUBLE) / COUNT(v)").alias("avg_skipnull"),
    )
