"""Data-quality / observability operators — the Deequ-style audit
surface a production warehouse runs on every load: primary-key
uniqueness, foreign-key orphan detection, and column completeness
profiling. All counts are exact integers, so the whole family is
hash-gated with no float discipline needed.

Scale shape: every check is one aggregate or one anti-join on the
natural key — the same shuffles the warehouse's real queries already
pay, so auditing at 100 TB costs one pass per table. The audit table
itself is tiny (one row per CHECK, not per violation; violating keys
would flow to a quarantine sink in the same pass).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


@register(
    "warehouse_integrity_audit",
    oracle="""
SELECT 'pk:orders.o_orderkey' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'pk:customer.c_custkey', COUNT(*),
       COUNT(*) - COUNT(DISTINCT c_custkey)
FROM customer
UNION ALL
SELECT 'pk:part.p_partkey', COUNT(*),
       COUNT(*) - COUNT(DISTINCT p_partkey)
FROM part
UNION ALL
SELECT 'fk:orders.o_custkey->customer', COUNT(*),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'fk:lineitem.l_orderkey->orders', COUNT(*),
       CAST(SUM(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN orders oo ON l.l_orderkey = oo.o_orderkey
UNION ALL
SELECT 'fk:lineitem.l_partkey->part', COUNT(*),
       CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
""",
    tags=("dq", "integrity", "audit", "pk", "fk"),
)
def warehouse_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse INTEGRITY AUDIT: one row per constraint — PK
    uniqueness (rows minus distinct keys) and FK orphan counts
    (left-join null probes) across the star schema's load-bearing
    relationships. A healthy TPC-H shape reports zero violations,
    and the audit asserting that IS the product: the same query over
    a corrupted load pinpoints the broken relationship and its
    violation count in ONE scan per table (r7 rework): each table is
    read once into the narrowest projection that serves every one of
    its checks — customer/part as cached per-key dup counts (PK stats
    AND FK parent side), orders as a cached (o_orderkey, o_custkey)
    pair (its own PK, the child side of the customer FK, and grouped
    to the parent-key side of lineitem's FK), lineitem as one probe
    joining BOTH parents before a single wide aggregate. Caches are
    persist(MEMORY_AND_DISK) — the key projections are table-sized
    (the corpus-cache memory rule)."""
    lvl = StorageLevel.MEMORY_AND_DISK
    # one scan per dim: per-key dup counts serve the PK check (sum of
    # dups = row count, key count = distinct count) and, being unique
    # by construction, join as the FK parent without multiplying
    ck = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("ndup"))
        .persist(lvl)
    )
    pkd = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("ndup"))
        .persist(lvl)
    )
    # one scan of orders: the row-level key pair feeds its own PK
    # check, the orders->customer orphan probe, and (grouped) the
    # unique parent-key side of lineitem's FK
    ow = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .persist(lvl)
    )

    def pk_row(keyed: DataFrame, name: str) -> DataFrame:
        return keyed.agg(
            F.lit(name).alias("check_name"),
            F.expr("CAST(SUM(ndup) AS BIGINT)").alias("n_rows"),
            F.expr("CAST(SUM(ndup) - COUNT(*) AS BIGINT)").alias(
                "n_violations"
            ),
        )

    # orders wide pass: PK stats + customer-orphan sum, one aggregate
    orders_wide = (
        ow.join(ck.select("c_custkey"), ow.o_custkey == F.col("c_custkey"),
                "left")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
            F.expr("CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)")
            .alias("pk_viol"),
            F.expr(
                "CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("fk_viol"),
        )
        .select(
            F.expr(
                "stack(2, 'pk:orders.o_orderkey', n, pk_viol,"
                " 'fk:orders.o_custkey->customer', n, fk_viol)"
                " AS (check_name, n_rows, n_violations)"
            )
        )
    )
    # lineitem wide pass: both parents probed off ONE child scan
    okeys = ow.groupBy("o_orderkey").agg(F.lit(1).alias("_o"))
    li_wide = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(okeys, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .join(pkd.select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"), "left")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
            F.expr(
                "CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("ord_viol"),
            F.expr(
                "CAST(SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("part_viol"),
        )
        .select(
            F.expr(
                "stack(2, 'fk:lineitem.l_orderkey->orders', n, ord_viol,"
                " 'fk:lineitem.l_partkey->part', n, part_viol)"
                " AS (check_name, n_rows, n_violations)"
            )
        )
    )
    return (
        orders_wide
        .unionAll(pk_row(ck, "pk:customer.c_custkey"))
        .unionAll(pk_row(pkd, "pk:part.p_partkey"))
        .unionAll(li_wide)
    )


@register(
    "warehouse_delete_cascade",
    oracle="""
WITH del_c AS (
  SELECT c_custkey FROM customer WHERE c_acctbal < 0
),
del_o AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM del_c)
),
del_l AS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)
)
SELECT 'customer' AS table_name,
       CAST((SELECT COUNT(*) FROM del_c) AS BIGINT) AS n_cascade
UNION ALL
SELECT 'orders', CAST((SELECT COUNT(*) FROM del_o) AS BIGINT)
UNION ALL
SELECT 'lineitem', CAST((SELECT COUNT(*) FROM del_l) AS BIGINT)
""",
    tags=("dq", "deletion", "cascade", "gdpr", "audit"),
)
def warehouse_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION-CASCADE impact report (the right-to-be-forgotten
    pre-flight a production warehouse runs before purging): for a
    deterministic deletion cohort (customers with negative balance),
    count every row that the FK graph would cascade away — the
    customers themselves, their orders, and those orders' line items.
    One scan per table, each child bounded by a LEFT-SEMI probe
    against the previous level's cached key set (cohort-sized, far
    smaller than the fact — the opposite side of the corpus-cache
    rule); the actual purge would be the same probes as anti-joins
    writing survivors. Integer counts only — hash-exact."""
    lvl = StorageLevel.MEMORY_AND_DISK
    del_c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
        .persist(lvl)
    )
    del_o = (
        load_table(spark, sf_dir, "orders")
        .join(del_c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey")
        .persist(lvl)
    )
    del_l = load_table(spark, sf_dir, "lineitem").join(
        del_o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )

    def n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_cascade"),
        )

    return (
        n(del_c, "customer")
        .unionAll(n(del_o, "orders"))
        .unionAll(n(del_l, "lineitem"))
    )


@register(
    "warehouse_profile_events",
    oracle="""
SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
       COUNT(DISTINCT event_id) AS n_distinct
FROM events
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
       COUNT(DISTINCT user_id) FROM events
UNION ALL
SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
       COUNT(DISTINCT event_type) FROM events
UNION ALL
SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
       COUNT(DISTINCT ts) FROM events
UNION ALL
SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
       COUNT(DISTINCT value) FROM events
UNION ALL
SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
       COUNT(DISTINCT props) FROM events
""",
    tags=("dq", "profile", "completeness", "observability"),
)
def warehouse_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column PROFILE of the events table — null counts and distinct
    cardinalities per column, the completeness/cardinality report a
    data-observability layer publishes per load (integer columns
    only, so the profile is hash-exact; value-range stats live in
    the stats_* family). ONE scan computes every column's counters
    (a single aggregate emitting all profiles, then an unpivot to
    check rows) — profiling must not multiply the table's read
    cost."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]
    aggs = []
    for col in cols:
        aggs += [
            F.expr("CAST(COUNT(*) AS BIGINT)").alias(f"{col}__rows"),
            F.expr(f"CAST(COUNT(*) - COUNT({col}) AS BIGINT)").alias(
                f"{col}__null"
            ),
            F.expr(f"COUNT(DISTINCT {col})").alias(f"{col}__distinct"),
        ]
    wide = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col, n_rows, n_null, n_distinct)"
        )
    )
