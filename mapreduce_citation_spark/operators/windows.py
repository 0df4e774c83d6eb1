"""Window-function operator surface: ranking, frames, lag/lead,
distribution functions, and gap-based sessionization.

The reference's only window-shaped operation is rank-by-enumerate over
a ≤30-row slice (master.py:217, SURVEY.md §2 op #15). Here the full
surface: every window is PARTITIONed so state stays distributed, and
every ORDER BY carries a unique tie-break column — the determinism
spec (SURVEY.md §5) applied to frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

OPRICE_DEC = "CAST(o_totalprice AS DECIMAL(12,2))"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) t
WHERE rn <= 3
""",
    bench=True,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical top-k-per-group via
    row_number over a partitioned window (raw-column ordering with
    orderkey tie-break — deterministic)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM({OPRICE_DEC}) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey < 100
""",
    tags=("window", "frame"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer — decimal accumulation so the
    running value is exact (engines associate frame sums differently
    in float)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.expr(f"CAST(SUM({OPRICE_DEC}) OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderdate, o_orderkey "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
               ).alias("running_spend"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(DATE_DIFF('day',
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS INT) AS days_since_prev,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
WHERE o_custkey < 100
""",
    tags=("window", "lag"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation: days between consecutive orders per
    customer (NULL on partition edges in both engines)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("int")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "window_moving_avg",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM({OPRICE_DEC}) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg_spend
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 3-row frame — computed as exact decimal
    frame-sum / frame-count so both engines divide identical values."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    dec_sum = F.expr(
        f"SUM({OPRICE_DEC}) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (dec_sum.cast("double") / F.count(F.lit(1)).over(w)).alias("moving_avg_spend"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(RANK()       OVER w AS INT) AS price_rank,
       CAST(DENSE_RANK() OVER w AS INT) AS price_dense_rank,
       CAST(NTILE(4)     OVER w AS INT) AS quartile,
       PERCENT_RANK()    OVER w AS pct_rank,
       CUME_DIST()       OVER w AS cume
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
    tags=("window", "rank", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank / cume_dist — the
    distribution family. percent_rank and cume_dist are exact rational
    doubles (same int/int division both engines)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WHERE o_custkey < 60
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window", "navigation"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value navigation. last_value
    needs the full-partition frame explicitly — the default frame ends
    at CURRENT ROW, a classic silent-wrong-answer trap in both
    engines."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 60)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "mom_revenue_change",
    oracle="""
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
         CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT y, m, revenue,
       revenue - LAG(revenue) OVER (ORDER BY y, m) AS delta,
       CASE WHEN LAG(revenue) OVER (ORDER BY y, m) IS NULL THEN NULL
            ELSE (revenue - LAG(revenue) OVER (ORDER BY y, m))
                 / LAG(revenue) OVER (ORDER BY y, m) END AS pct_change
FROM monthly
""",
    tags=("window", "timeseries"),
)
def mom_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas: aggregate → single ordered
    window over the (small) monthly series. The unpartitioned window
    is safe because it runs over ≤ n_months rows, post-aggregation."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)").alias(
            "revenue"
        )
    )
    w = Window.orderBy("y", "m")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "y",
        "m",
        "revenue",
        (F.col("revenue") - prev).alias("delta"),
        F.when(prev.isNull(), F.lit(None)).otherwise(
            (F.col("revenue") - prev) / prev
        ).alias("pct_change"),
    )


@register(
    "sessionize_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
    bench=True,
    tags=("window", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → cumulative sum as session id → per-session aggregate. The
    batch equivalent of streaming session windows; one shuffle on
    user_id serves both windows and the final groupBy."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    # tz-free exact gap: NTZ subtraction yields a day-time interval
    # with microsecond precision — no epoch conversion, no session-tz
    # dependence (casting to long would truncate to seconds)
    new_session = (
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    numbered = ev.select(
        "user_id", "ts", "event_id", new_session.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(wcum))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
