"""Event-time operators over the ``events`` table (batch side).

These are the batch equivalents of the Structured Streaming operators
in ``streaming/`` — same windowing semantics (tumbling / sliding /
session via ``F.window`` / ``F.session_window``), checked against
epoch-arithmetic SQL oracles. The streaming versions (watermarks,
late-data drop, stateful dedup) run in pytest where a file source +
memory sink can drive them to completion; their aggregation logic is
shared with these functions.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

#: value is 2-decimal in the fixtures → decimal-exact sums.
VALUE_DEC = "CAST(value AS DECIMAL(18,2))"


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "events_tumbling_hourly",
    oracle=f"""
SELECT make_timestamp(CAST(FLOOR(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM({VALUE_DEC}) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    bench=True,
    tags=("events", "window-agg", "tumbling"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — ``F.window`` is the
    same operator Structured Streaming uses, so this plan is the
    batch twin of the streaming watermark query."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"CAST(SUM({VALUE_DEC}) AS DOUBLE)").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_sliding_windows",
    oracle=f"""
WITH win AS (
  SELECT e.*,
         make_timestamp(CAST((FLOOR(epoch_us(ts) / 1800000000) * 1800 - off) * 1000000 AS BIGINT)) AS window_start
  FROM events e, (VALUES (0), (1800)) AS offsets(off)
  WHERE epoch_us(ts) >= (FLOOR(epoch_us(ts) / 1800000000) * 1800 - off) * 1000000
)
SELECT window_start, COUNT(*) AS n,
       CAST(SUM({VALUE_DEC}) AS DOUBLE) AS total_value
FROM win
GROUP BY 1
""",
    tags=("events", "window-agg", "sliding"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands
    in 2 windows. The oracle reconstructs window membership with epoch
    arithmetic (event ∈ [start, start+1h) for starts on the 30-min
    grid)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"CAST(SUM({VALUE_DEC}) AS DOUBLE)").alias("total_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "total_value")
    )


@register(
    "events_json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract ``$.k`` from the JSON props
    column (get_json_object — JVM-side JSON path, no UDF)."""
    ev = _ev(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_funnel_join",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       v.ts AS view_ts, p.ts AS purchase_ts
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
""",
    bench=True,
    tags=("events", "join", "funnel", "stream-stream"),
)
def events_funnel_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream funnel join (view→purchase
    within 1 h per user). Same builder powers the watermarked
    streaming version tested in test_streaming.py."""
    from ..streaming.events import funnel_join

    ev = _ev(spark, sf_dir)
    return funnel_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        "1 hour",
    )


@register(
    "events_json_struct",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
WHERE event_id < 500
""",
    tags=("events", "json", "struct"),
)
def events_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON parsing: from_json into a typed struct (vs the
    path-at-a-time get_json_object in events_json_props) — the right
    call when several fields are extracted, since the document parses
    once."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = _ev(spark, sf_dir).filter(F.col("event_id") < 500)
    schema = StructType([StructField("k", LongType())])
    parsed = ev.withColumn("p", F.from_json("props", schema))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "events_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sid
""",
    tags=("events", "session-window"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (30-min gap) in batch mode — the same
    operator Structured Streaming uses for session aggregation. The
    oracle rebuilds sessions with the lag/cumsum islands technique;
    session_end = last event + gap by definition."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "events_cdc_compaction",
    oracle="""
SELECT user_id, event_id AS last_event_id, ts AS last_ts,
       event_type AS last_type
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
    tags=("events", "cdc", "compaction", "window"),
)
def events_cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log COMPACTION (latest-wins): collapse each key's event
    history to its most recent record — the merge step every
    CDC-ingesting lakehouse pipeline runs before serving reads. One
    shuffle on the key; deterministic (ts, event_id) tie-break so both
    engines pick the same survivor. At scale this is the query shape
    behind snapshot materialization of an upsert stream."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
    )


@register(
    "events_gap_fill_hourly",
    oracle="""
WITH b AS MATERIALIZED (
  SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n, MAX(value) AS v
  FROM events WHERE user_id < 12 GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM b GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM span
)
SELECT g.user_id, g.h AS hour_start,
       COALESCE(b.n, 0) AS n_events,
       b.n IS NULL AS is_gap,
       last_value(b.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.h
""",
    tags=("events", "timeseries", "gap-fill", "resample"),
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: each (kept) user's event
    stream becomes a dense hourly grid over their active span —
    ``sequence()`` + ``explode`` generates the grid, a left join marks
    gaps, and the last observed hourly max value forward-fills via
    ``last(ignorenulls)`` over an unbounded-preceding window.

    Scale shape: the grid explodes per user (rows ∝ span hours, not
    events), the join and the fill window both partition on user_id —
    one shuffle key end to end, no global window. The user filter
    (user_id < 12) bounds output for the gate; at 100 TB the same plan
    runs unfiltered since per-user state is a single pass. The hourly
    max carried through the fill is compared bit-exact (no float
    arithmetic, only selection)."""
    ev = _ev(spark, sf_dir)
    # referenced by the span derivation AND the grid join — materialize
    # so the filtered pre-aggregation scans events once
    b = (
        ev.filter(F.col("user_id") < 12)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("v"))
        .localCheckpoint()
    )
    span = b.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.col("h").alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )


@register(
    "events_daily_anomaly",
    oracle="""
WITH d AS MATERIALIZED (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT user_id, COUNT(*) AS nd,
         CAST(SUM(n_events) AS BIGINT) AS s,
         CAST(SUM(n_events * n_events) AS BIGINT) AS ss,
         MIN(n_events) = MAX(n_events) AS zv
  FROM d GROUP BY user_id
)
SELECT d.user_id, d.day, d.n_events,
       CASE WHEN zv THEN NULL ELSE
         (CAST(d.n_events AS DOUBLE) - CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
           / sqrt((CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                  / CAST(nd AS DOUBLE)) END AS z,
       CASE WHEN zv THEN FALSE ELSE
         ABS((CAST(d.n_events AS DOUBLE) - CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
           / sqrt((CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                  / CAST(nd AS DOUBLE))) >= 2.0 END AS is_anomaly
FROM d JOIN m USING (user_id)
""",
    tags=("events", "anomaly", "stats", "zscore"),
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily activity anomaly scoring: each day's event count
    is z-scored against that user's own mean/stddev (population,
    moment form). Counts are integers, so the moment sums are exact
    and every double derives from bit-identical inputs — the
    ``stats_variance`` determinism discipline — making the z-scores
    and the |z| ≥ 2 flag hash-comparable.

    Scale shape: two aggregations on the same user_id key (daily
    rollup, then per-user moments) + a broadcast-size join back —
    map-side combine on both, no collect, no window."""
    ev = _ev(spark, sf_dir)
    d = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("nd"),
        F.expr("CAST(SUM(n_events) AS BIGINT)").alias("s"),
        F.expr("CAST(SUM(n_events * n_events) AS BIGINT)").alias("ss"),
        F.expr("MIN(n_events) = MAX(n_events)").alias("zv"),
    )
    z = (
        "(CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
        " / sqrt((CAST(ss AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
        " / CAST(nd AS DOUBLE))"
    )
    # zero-variance guard (all daily counts equal ⇔ variance zero):
    # without it z is 0/0 — which Spark returns as NULL but DuckDB may
    # return as NaN (and NaN >= 2 is TRUE there), silently diverging
    # the gate on a degenerate user. Stated as MIN = MAX rather than
    # the equivalent nd·ss == s² so the guard can't BIGINT-overflow on
    # a heavy user (Spark would wrap silently, DuckDB raise).
    zero_var = F.col("zv")
    return d.join(m, "user_id").select(
        "user_id",
        "day",
        "n_events",
        F.when(zero_var, F.lit(None).cast("double"))
        .otherwise(F.expr(z))
        .alias("z"),
        F.when(zero_var, F.lit(False))
        .otherwise(F.abs(F.expr(z)) >= F.lit(2.0))
        .alias("is_anomaly"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
WITH d AS (
  SELECT date_trunc('day', ts) AS day, user_id FROM events GROUP BY 1, 2
),
dau AS (SELECT day, COUNT(*) AS dau FROM d GROUP BY day),
w AS (
  SELECT date_trunc('week', day) AS week, user_id FROM d GROUP BY 1, 2
),
wau AS (SELECT week, COUNT(*) AS wau FROM w GROUP BY week)
SELECT dau.day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON date_trunc('week', dau.day) = wau.week
""",
    tags=("events", "engagement", "dau-wau"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement accounting: daily active users, the containing
    calendar week's weekly active users, and the DAU/WAU stickiness
    ratio. Distinct-user sets dedupe at day grain first (one compact
    (day, user) table feeds both rollups — the raw stream is touched
    once); counts are integers so the ratio is a deterministic
    double."""
    ev = _ev(spark, sf_dir)
    d = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "user_id")
        .agg(F.lit(1).alias("_one"))
        .select("day", "user_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dau = d.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        d.select(F.date_trunc("week", "day").alias("week"), "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, F.date_trunc("week", F.col("day")) == F.col("week"))
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


@register(
    "events_scd2_history",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
ch AS (
  SELECT user_id, event_type, ts, event_id
  FROM o WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS version,
       event_type AS state,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM ch
""",
    tags=("events", "scd2", "cdc", "warehouse", "window"),
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension TYPE 2 history build from a change
    log — the companion to ``events_cdc_compaction`` (latest-wins =
    SCD1): treat each user's event_type as a tracked attribute,
    collapse consecutive repeats (LAG change detection), and emit one
    validity interval per distinct run — [valid_from, valid_to) with
    a version number and an is_current flag on the open interval.
    This is the standard dimension-history merge every warehouse
    ingesting CDC runs.

    Scale shape: every window partitions on the entity key — ONE
    shuffle total, then per-key sorted passes (change detection,
    versioning, interval close) ride the same sort. Deterministic
    (ts, event_id) tie-break; no floats anywhere."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    wk = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        ev.withColumn("prev_type", F.lag("event_type").over(wk))
        .filter(F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    valid_to = F.lead("ts").over(wk)
    return ch.select(
        "user_id",
        F.row_number().over(wk).alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "events_incremental_agg_merge",
    oracle=f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM({VALUE_DEC}) AS DOUBLE) AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
""",
    tags=("events", "incremental", "partial-agg", "materialized-view"),
)
def events_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the materialized-view
    pattern: a BASE aggregate (events before the cutoff) is merged
    with a DELTA aggregate (events at/after it) through a second
    aggregation over the partial states, and the result must equal a
    full recompute (the oracle — which never sees the cutoff).

    Works because every measure is a commutative monoid under a
    known merge: count→sum, decimal-sum→sum, min→min, max→max. At
    100 TB this is how a daily pipeline folds one day's delta into a
    standing per-user state instead of re-scanning history; the
    decimal sums keep the merge order-insensitive and the final
    DOUBLE cast bit-stable."""
    ev = _ev(spark, sf_dir)
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("_n"),
            F.expr(f"SUM({VALUE_DEC})").alias("_sv"),
            F.min("ts").alias("_f"),
            F.max("ts").alias("_l"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return (
        base.unionAll(delta)
        .groupBy("user_id")
        .agg(
            F.sum("_n").cast("long").alias("n_events"),
            F.expr("CAST(SUM(_sv) AS DOUBLE)").alias("total_value"),
            F.min("_f").alias("first_ts"),
            F.max("_l").alias("last_ts"),
        )
    )


def mg_summaries(keyed: DataFrame, k: int) -> DataFrame:
    """Per-batch Misra-Gries summaries over ``keyed.k`` — the
    deterministic heavy-hitter sketch: each Arrow batch keeps at most
    ``k`` counters (decrement-all on overflow) and emits its surviving
    candidate keys. The union of summaries is a GUARANTEED superset
    of every key with global frequency > N/k: a key absent from a
    batch's summary lost ≤ n_batch/k decrements there, so a key
    absent from ALL summaries has frequency ≤ Σ n_b/k = N/k —
    total recall by the deficit bound, no randomness anywhere.

    Each batch also emits one ``(k=-1, n=batch_rows)`` bookkeeping
    row so the stream total rides the same single pass (construction
    keys are ≥ 0). Returns raw summary rows (k, n); callers split
    candidates (k ≥ 0) from the total (k = -1)."""
    import pandas as pd
    from pyspark.sql.types import LongType as _L
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    def batches(it):
        for pdf in it:
            counters: dict[int, int] = {}
            for v in pdf["k"]:
                v = int(v)
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
            yield pd.DataFrame(
                {"k": list(counters) + [-1],
                 "n": [0] * len(counters) + [len(pdf)]}
            )

    return keyed.mapInPandas(batches, _ST([_SF("k", _L()), _SF("n", _L())]))


_MG_KEY = (
    "CASE WHEN event_id % 2 = 0 THEN user_id % 5 "
    "ELSE user_id + 10000 END"
)


@register(
    "events_heavy_hitters_mg",
    oracle=f"""
WITH keyed AS (SELECT {_MG_KEY} AS k FROM events),
tot AS (SELECT COUNT(*) AS n FROM keyed),
c AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt FROM keyed GROUP BY k)
SELECT c.k AS key, c.cnt,
       CAST(c.cnt AS DOUBLE) / CAST(tot.n AS DOUBLE) AS share
FROM c, tot WHERE c.cnt * 50 > tot.n
""",
    tags=("events", "heavy-hitters", "misra-gries", "sketch", "skew"),
)
def events_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (frequency > N/50) via the MISRA-GRIES
    candidate→verify plan: per-batch MG summaries (``mg_summaries``,
    k=100 counters) produce a provable superset of the true heavy
    hitters; only the candidates — bounded by k per batch however
    large the stream — are exactly counted and thresholded. The
    stream is deterministically SKEWED first (the hot-key torture
    convention: half the events concentrate on 5 keys, the rest
    spread over a cold tail) because TPC-H-style fixtures are
    uniform and a heavy-hitter query needs hitters to find.

    At 100 TB: the full stream is touched exactly twice (sketch pass
    + candidate-count pass — inherent two-phase, the LSH-verify
    category), the exact aggregation runs on the candidate SUBSET,
    and recall is deterministic (the deficit bound), unlike a
    sampling or CMS approach. Oracle = the plain exact query — the
    sketch phase must be invisible in the result."""
    ev = _ev(spark, sf_dir)
    keyed = ev.select(F.expr(_MG_KEY).alias("k"))
    summ = mg_summaries(keyed, 100).localCheckpoint()  # bounded: ≤k+1 rows/batch
    cand = summ.filter(F.col("k") >= 0).select("k").distinct()
    tot = summ.filter(F.col("k") == -1).agg(F.sum("n").alias("n"))
    counts = (
        keyed.join(cand, "k", "semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 50 > F.col("n"))
        .select(
            F.col("k").alias("key"),
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
        )
    )


@register(
    "events_daily_trend",
    oracle="""
WITH d AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       (COUNT(*) * CAST(SUM(x * y) AS DOUBLE)
         - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
       / (COUNT(*) * CAST(SUM(x * x) AS DOUBLE)
         - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS slope,
       (CAST(SUM(y) AS DOUBLE)
         - ((COUNT(*) * CAST(SUM(x * y) AS DOUBLE)
             - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
            / (COUNT(*) * CAST(SUM(x * x) AS DOUBLE)
               - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)))
           * CAST(SUM(x) AS DOUBLE)) / COUNT(*) AS intercept,
       (COUNT(*) * CAST(SUM(x * y) AS DOUBLE)
         - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
       * (COUNT(*) * CAST(SUM(x * y) AS DOUBLE)
         - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
       / ((COUNT(*) * CAST(SUM(x * x) AS DOUBLE)
           - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
          * (COUNT(*) * CAST(SUM(y * y) AS DOUBLE)
             - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))) AS r2
FROM d GROUP BY event_type
HAVING COUNT(*) >= 2 AND MIN(x) <> MAX(x) AND MIN(y) <> MAX(y)
""",
    tags=("events", "trend", "regression", "timeseries"),
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type activity TREND: ordinary least squares over the daily
    event counts (x = day index from the fixture epoch, y = count),
    in closed form from integer moment sums — slope, intercept, and
    r² per event type, the drift-detection statistic a monitoring
    pipeline computes over rolling windows. Every double input is an
    exact BIGINT sum (the ``stats_variance`` strategy), so the
    arithmetic is bit-stable across engines; at 100 TB the daily
    pre-aggregate is the only corpus-wide shuffle and the regression
    itself runs on |types|×|days| rows."""
    ev = _ev(spark, sf_dir)
    d = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit("2024-01-01").cast("date"),
            ).cast("long").alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    sxy = "CAST(SUM(x * y) AS DOUBLE)"
    sx = "CAST(SUM(x) AS DOUBLE)"
    sy = "CAST(SUM(y) AS DOUBLE)"
    sxx = "CAST(SUM(x * x) AS DOUBLE)"
    syy = "CAST(SUM(y * y) AS DOUBLE)"
    num = f"(COUNT(*) * {sxy} - {sx} * {sy})"
    den = f"(COUNT(*) * {sxx} - {sx} * {sx})"
    slope = f"{num} / {den}"
    return (
        d.groupBy("event_type")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"),
            F.expr(slope).alias("slope"),
            F.expr(f"({sy} - ({slope}) * {sx}) / COUNT(*)").alias("intercept"),
            F.expr(
                f"{num} * {num} / ({den} * (COUNT(*) * {syy} - {sy} * {sy}))"
            ).alias("r2"),
            # variance guards ride the aggregate: a type active on <2
            # distinct days has no defined slope, and one whose daily
            # counts are all equal has r² = 0/0 — both 0-denominator
            # divisions diverge across engines (Spark NULL, DuckDB
            # inf/NaN) — drop them identically on both sides
            F.expr(
                "MIN(x) <> MAX(x) AND MIN(y) <> MAX(y) AND COUNT(*) >= 2"
            ).alias("_ok"),
        )
        .filter(F.col("_ok"))
        .drop("_ok")
    )


@register(
    "events_markov_transitions",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM o WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
m AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM t GROUP BY 1)
SELECT t.from_type, t.to_type, t.n,
       CAST(t.n AS DOUBLE) / CAST(m.n_from AS DOUBLE) AS p
FROM t JOIN m ON m.from_type = t.from_type
""",
    tags=("events", "markov", "sequence", "transitions"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MARKOV transition matrix over per-user event
    sequences: P(next event type | current type), the user-behavior
    model behind next-action prediction and anomaly scoring on
    action streams. LEAD over the deterministic (ts, event_id)
    per-user order builds the transition pairs in one shuffle on the
    user key; counts land on the bounded |types|² domain and each
    probability is ONE division of exact integers (bit-stable).
    Rows of the matrix sum to 1 by construction (pytest-pinned)."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
        .localCheckpoint()  # ≤|types|² rows; feeds marginals AND join
    )
    m = t.groupBy(F.col("from_type").alias("ft")).agg(
        F.expr("CAST(SUM(n) AS BIGINT)").alias("n_from")
    )
    return (
        t.join(F.broadcast(m), t.from_type == m.ft)
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
        )
    )


@register(
    "events_ses_forecast",
    oracle="""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         list_transform(list_sort(list({'d': day, 'y': y})), s -> s.y) AS ys
  FROM d GROUP BY event_type
)
SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
       CAST(list_reduce(ys, (acc, x) -> (x + acc) // 2) AS BIGINT)
         AS ses_level,
       CAST(ys[len(ys)] AS BIGINT) AS last_count
FROM s
""",
    tags=("events", "forecast", "smoothing", "timeseries"),
)
def events_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (α = 1/2) over each type's daily
    counts — the one-step-ahead FORECAST level a capacity monitor
    carries per series. α = 1/2 makes every update an integer
    halving (l_t = (y_t + l_{t-1}) div 2), so the recursion is exact
    BIGINT arithmetic and the day-sorted fold replays bit-for-bit:
    Spark's ``aggregate`` over the sorted array seeded with its
    first element ≡ DuckDB's ``list_reduce`` (which seeds that way
    natively — the CLAUDE.md fold convention). The sequential
    recursion hides INSIDE a per-group array fold, so the plan is
    one aggregation, not an iteration: per-series state is the
    day-count array (bounded by the calendar, not the corpus)."""
    ev = _ev(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("y"))
    s = d.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))), s -> s.y)"
        ).alias("ys")
    )
    return s.select(
        "event_type",
        F.expr("CAST(size(ys) AS BIGINT)").alias("n_days"),
        F.expr(
            "CAST(aggregate(slice(ys, 2, size(ys) - 1), ys[0],"
            " (acc, x) -> (x + acc) div 2) AS BIGINT)"
        ).alias("ses_level"),
        F.expr("CAST(ys[size(ys) - 1] AS BIGINT)").alias("last_count"),
    )


@register(
    "events_daily_acf",
    oracle="""
WITH d AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type, x, y,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd,
         CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         LEAD(x, 1) OVER (PARTITION BY event_type ORDER BY x) AS x1,
         LEAD(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS y1,
         LEAD(x, 2) OVER (PARTITION BY event_type ORDER BY x) AS x2,
         LEAD(y, 2) OVER (PARTITION BY event_type ORDER BY x) AS y2,
         LEAD(x, 3) OVER (PARTITION BY event_type ORDER BY x) AS x3,
         LEAD(y, 3) OVER (PARTITION BY event_type ORDER BY x) AS y3
  FROM d
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN x1 = x + 1
                THEN (nd * y - s) * (nd * y1 - s) END) AS DOUBLE)
         / CAST(SUM((nd * y - s) * (nd * y - s)) AS DOUBLE) AS acf1,
       CAST(SUM(CASE WHEN x2 = x + 2
                THEN (nd * y - s) * (nd * y2 - s) END) AS DOUBLE)
         / CAST(SUM((nd * y - s) * (nd * y - s)) AS DOUBLE) AS acf2,
       CAST(SUM(CASE WHEN x3 = x + 3
                THEN (nd * y - s) * (nd * y3 - s) END) AS DOUBLE)
         / CAST(SUM((nd * y - s) * (nd * y - s)) AS DOUBLE) AS acf3
FROM t GROUP BY event_type
HAVING MIN(y) <> MAX(y)
""",
    tags=("events", "timeseries", "autocorrelation"),
)
def events_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type AUTOCORRELATION of the daily count series at lags
    1-3 — the seasonality/burstiness diagnostic that complements
    ``events_daily_trend``'s drift detection (a weekly-cycle metric
    shows acf7 ≫ acf1; a bursty one decays fast).

    Estimator: the standard biased sample ACF r_k = Σ(y_t−ȳ)(y_{t+k}
    −ȳ) / Σ(y_t−ȳ)², computed entirely in integers before ONE final
    division — each centered term is (nd·y − S), i.e. nd·(y−ȳ) with
    the nd² factor cancelling between numerator and denominator, so
    both engines sum identical BIGINTs (the ``stats_variance``
    strategy; magnitudes bounded by (nd·max_daily)²·nd ≈ 1e10 at
    sf0.1 — far inside BIGINT). Lagged pairs are DAY-lagged, not
    row-lagged: a pair only counts when the day gap is exactly k
    (LEAD(x,k) = x+k), so a sparse series never silently compares
    non-adjacent days. A lag with no valid pairs yields NULL on both
    engines; zero-variance types are dropped identically via the
    MIN<>MAX guard (the 0/0 class from the repo's determinism rules).

    Scale shape: one corpus-wide shuffle to the (type, day) daily
    aggregate; the window pass and final per-type aggregate run on
    |types|×|days| rows and share the hash(event_type) exchange."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    d = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"),
                F.lit("2024-01-01").cast("date"),
            ).cast("long").alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("x")
    t = d.select(
        "event_type", "x", "y",
        F.count(F.lit(1)).over(w).alias("nd"),
        F.sum("y").over(w).alias("s"),
        *[F.lead(c, k).over(wo).alias(f"{c}{k}")
          for k in (1, 2, 3) for c in ("x", "y")],
    )
    den = "CAST(SUM((nd * y - s) * (nd * y - s)) AS DOUBLE)"
    acfs = [
        F.expr(
            f"CAST(SUM(CASE WHEN x{k} = x + {k} "
            f"THEN (nd * y - s) * (nd * y{k} - s) END) AS DOUBLE) / {den}"
        ).alias(f"acf{k}")
        for k in (1, 2, 3)
    ]
    return (
        t.groupBy("event_type")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"),
            *acfs,
            F.expr("MIN(y) <> MAX(y)").alias("_ok"),
        )
        .filter(F.col("_ok"))
        .drop("_ok")
    )


@register(
    "events_trailing_rates",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_1h,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_24h
FROM events
""",
    tags=("events", "window", "range-frame", "rate"),
)
def events_trailing_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event TRAILING-WINDOW rates via RANGE-interval frames —
    the rate-limiting / burst-detection signal: for every event, how
    many events its user produced in the preceding hour and day
    (frame = ts' ∈ [ts − Δ, ts], peers included — RANGE semantics,
    so tie order can't matter and the integer counts are hash-exact
    by construction). This is the VALUE-based frame the ROWS-frame
    family (`window_moving_avg` etc.) can't express: the frame width
    adapts to event density instead of row count.

    One shuffle on user_id; both frames ride the same sort (Spark
    plans a single Window node with two frame specs). At 100 TB this
    is the same per-key windowed pass any sessionization runs —
    state bounded by the widest frame's span per user."""
    ev = _ev(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT)"
        ).alias("n_1h"),
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW) "
            "AS BIGINT)"
        ).alias("n_24h"),
    )


@register(
    "events_snapshot_diff",
    oracle="""
WITH w1 AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND user_id % 20 <> 0
  GROUP BY user_id
),
w2 AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' AND user_id % 20 <> 1
  GROUP BY user_id
)
SELECT CASE WHEN w1.user_id IS NULL THEN 'insert'
            WHEN w2.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       COALESCE(w1.user_id, w2.user_id) AS user_id,
       w1.n AS old_n, w2.n AS new_n
FROM w1 FULL JOIN w2 ON w1.user_id = w2.user_id
WHERE w1.user_id IS NULL OR w2.user_id IS NULL OR w1.n <> w2.n
""",
    tags=("events", "cdc", "snapshot-diff", "changelog"),
)
def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF → CDC changelog GENERATION — the producer side
    of change data capture (the consumer side is
    ``events_cdc_compaction`` / its live twin): given two versions of
    a per-user aggregate state (first vs second half of the fixture
    month, with deterministically PLANTED churn cohorts — user_id %
    20 == 0 joins late, % 20 == 1 churns after the cutoff; the
    fixture's users are otherwise uniformly active all month, so
    without planting only updates would ever occur), emit the
    minimal changelog that transforms one into the other. op = insert (new key), delete (vanished key), update
    (value changed); unchanged keys emit nothing — exactly what a
    MERGE INTO / incremental-materialization pipeline replays
    downstream.

    One shuffle per snapshot aggregate + one full-outer join on the
    key — all user_id-keyed, so at 100 TB the three exchanges share
    partitioning (AQE coalesces the join post-shuffle). Counts are
    exact BIGINTs; the filter drops unchanged keys identically on
    both engines (integer <>)."""
    ev = _ev(spark, sf_dir)
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    w1 = (
        ev.filter((F.col("ts") < cut) & (F.col("user_id") % 20 != 0))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("user_id").alias("u1"), F.col("n").alias("old_n"))
    )
    w2 = (
        ev.filter((F.col("ts") >= cut) & (F.col("user_id") % 20 != 1))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("user_id").alias("u2"), F.col("n").alias("new_n"))
    )
    j = w1.join(w2, F.col("u1") == F.col("u2"), "full_outer")
    return (
        j.filter(
            F.col("u1").isNull()
            | F.col("u2").isNull()
            | (F.col("old_n") != F.col("new_n"))
        )
        .select(
            F.when(F.col("u1").isNull(), "insert")
            .when(F.col("u2").isNull(), "delete")
            .otherwise("update")
            .alias("op"),
            F.coalesce("u1", "u2").alias("user_id"),
            "old_n",
            "new_n",
        )
    )


#: Fixed follow-up horizon (hours) for the survival analysis —
#: subjects without a conversion inside it are administratively
#: censored (the fixture's users all convert eventually, so a finite
#: follow-up is what makes censoring real).
_KM_HORIZON_H = 48


@register(
    "events_survival_km",
    oracle=f"""
WITH fv AS (
  SELECT user_id, MIN(ts) AS v FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
fp AS (
  SELECT e.user_id, MIN(e.ts) AS p
  FROM events e JOIN fv ON fv.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fv.v
  GROUP BY e.user_id
),
subj AS (
  SELECT fv.user_id,
         (epoch_us(fp.p) - epoch_us(fv.v)) // 3600000000 AS raw_h,
         fp.p IS NOT NULL
           AND (epoch_us(fp.p) - epoch_us(fv.v)) // 3600000000
               < {_KM_HORIZON_H} AS ev
  FROM fv LEFT JOIN fp ON fp.user_id = fv.user_id
),
g AS (
  SELECT CASE WHEN ev THEN raw_h ELSE {_KM_HORIZON_H} END AS t,
         CAST(COUNT(*) FILTER (WHERE ev) AS BIGINT) AS d,
         CAST(COUNT(*) FILTER (WHERE NOT ev) AS BIGINT) AS c
  FROM subj GROUP BY 1
),
r AS (
  SELECT t, d, c,
         CAST(SUM(d + c) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(d + c) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS n
  FROM g
),
km AS (SELECT t, d, n FROM r WHERE d > 0),
arr AS (
  SELECT list_sort(list(struct_pack(t := t, d := d, n := n))) AS a FROM km
)
SELECT km.t AS t_hours, km.n AS n_risk, km.d AS d_events,
       list_reduce(
         list_prepend(CAST(1.0 AS DOUBLE),
           list_transform(list_filter(arr.a, x -> x.t <= km.t),
             x -> CAST(1.0 AS DOUBLE)
                  - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
         (a, b) -> a * b) AS survival
FROM km, arr
""",
    tags=("events", "survival", "kaplan-meier", "censoring"),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve for view→purchase conversion —
    time-to-event analysis WITH CENSORING, the statistic behind
    retention curves and conversion-latency monitoring: subjects are
    users from their first view; the event is their first purchase
    within a fixed 48-hour follow-up; users not converting inside it
    are administratively censored (they leave the risk set without an
    event — simply dropping them would bias the curve down, counting
    them as converted would bias it up; KM is the unbiased
    estimator). S(t) = Π_{{s ≤ t}} (1 − d_s/n_s) over event times.

    Determinism: d and n are exact integer counts (risk set via one
    windowed cumulative over the ≤ 49-row duration table; durations
    are integer-hour truncations of exact epoch-microsecond
    differences, Spark ``div`` ≡ DuckDB ``//``); the survival
    product is the repo's value-sorted fold convention — both
    engines multiply the same correctly-rounded factors in the same
    sorted order, so the doubles are bit-identical.

    Shape: two user-keyed aggregates (first view, first qualifying
    purchase — the purchase join rides the same key), one tiny
    duration-table window, and the fold runs on a ≤ 49-element
    broadcast array — corpus-size-independent after the per-user
    reductions."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    raw_h = (
        "(unix_micros(CAST(p AS TIMESTAMP)) - unix_micros(CAST(v AS TIMESTAMP)))"
        " div 3600000000"
    )
    subj = fv.join(fp, "user_id", "left").select(
        "user_id",
        F.expr(raw_h).alias("raw_h"),
        F.expr(f"p IS NOT NULL AND {raw_h} < {_KM_HORIZON_H}").alias("ev"),
    )
    g = (
        subj.groupBy(
            F.when(F.col("ev"), F.col("raw_h"))
            .otherwise(F.lit(_KM_HORIZON_H))
            .alias("t")
        )
        .agg(
            F.expr("CAST(COUNT(CASE WHEN ev THEN 1 END) AS BIGINT)").alias("d"),
            F.expr("CAST(COUNT(CASE WHEN NOT ev THEN 1 END) AS BIGINT)").alias("c"),
        )
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = g.select(
        "t", "d",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).cast("long").alias("n"),
    )
    km = r.filter(F.col("d") > 0).localCheckpoint()
    arr = km.agg(
        F.expr("array_sort(collect_list(struct(t, d, n)))").alias("a")
    )
    surv = (
        "aggregate(filter(a, x -> x.t <= t), CAST(1.0 AS DOUBLE), "
        "(acc, x) -> acc * (CAST(1.0 AS DOUBLE) "
        "- CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)))"
    )
    return km.crossJoin(F.broadcast(arr)).select(
        F.col("t").alias("t_hours"),
        F.col("n").alias("n_risk"),
        F.col("d").alias("d_events"),
        F.expr(surv).alias("survival"),
    )


@register(
    "events_pattern_sequences",
    oracle="""
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
),
vc AS (
  SELECT * FROM (
    SELECT v.user_id, v.view_id, v.view_ts,
           c.event_id AS click_id, c.ts AS click_ts,
           ROW_NUMBER() OVER (PARTITION BY v.view_id
                              ORDER BY c.ts, c.event_id) AS rk
    FROM v JOIN events c
      ON c.user_id = v.user_id AND c.event_type = 'click'
     AND c.ts >= v.view_ts AND c.ts < v.view_ts + INTERVAL 24 HOURS
  ) WHERE rk = 1
),
vcp AS (
  SELECT * FROM (
    SELECT vc.user_id, vc.view_id, vc.view_ts, vc.click_id, vc.click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           ROW_NUMBER() OVER (PARTITION BY vc.view_id
                              ORDER BY p.ts, p.event_id) AS rk
    FROM vc JOIN events p
      ON p.user_id = vc.user_id AND p.event_type = 'purchase'
     AND p.ts >= vc.click_ts AND p.ts < vc.click_ts + INTERVAL 24 HOURS
  ) WHERE rk = 1
)
SELECT user_id, view_id, click_id, purchase_id,
       view_ts, click_ts, purchase_ts
FROM vcp
""",
    tags=("events", "pattern", "sequence", "match-recognize"),
)
def events_pattern_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL PATTERN detection — the MATCH_RECOGNIZE workload as
    composable DataFrame ops: for every view, the FIRST click within
    24 hours, then the FIRST purchase within 24 hours of that click —
    strict three-step order with per-step 24-hour bounds (sized to
    the fixture's event density — at 1 hour the pattern never
    completes below sf0.1), first-match
    semantics (each step's candidate set resolved by a deterministic
    (ts, event_id) argmin window, so simultaneous events can't make
    the match ambiguous).

    Shape: two keyed join+argmin stages, each an equi-join on user_id
    with a range predicate and a per-anchor ROW_NUMBER — the same
    bounded-state semantics a streaming pattern matcher maintains
    per key; at 100 TB all exchanges key on user_id / the anchor id
    and the per-view candidate lists are bounded by the time
    windows."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    wv = Window.partitionBy("view_id").orderBy("click_ts", "click_id")
    vc = (
        v.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") < F.col("view_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("user_id", "view_id", "view_ts", "click_id", "click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    wp = Window.partitionBy("view_id").orderBy("purchase_ts", "purchase_id")
    return (
        vc.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select(
            "user_id", "view_id", "click_id", "purchase_id",
            "view_ts", "click_ts", "purchase_ts",
        )
    )


#: Packed-state encoding for the Holt fold: level and trend ride ONE
#: BIGINT (st = (l + OFF)·B + (b + OFF)) because a STRUCT accumulator
#: is not portable: DuckDB 1.0's list_reduce evaluates struct fields
#: sequentially against the partially-updated accumulator (probed:
#: with {'l': f(acc), 'b': g(acc.l)}, g saw the NEW l — the isolated
#: single step computes correctly, multi-step folds diverge), while
#: Spark's aggregate gives every field the old accumulator. A scalar
#: accumulator cannot be partially updated, so the packed fold is
#: bit-identical on both engines (the SES convention, widened to
#: two components). Bounds: |l|, |b| < OFF = 2^19 — daily counts are
#: ≤ ~10^3 at sf0.1 and smoothing keeps the state in the data's
#: range; a corpus breaking 5·10^5 events/day/type needs a wider B.
_HOLT_B = 1 << 20
_HOLT_OFF = 1 << 19


def _holt_step(div: str, y: str) -> str:
    """One Holt update on the packed state ``st`` (shared text for
    both engines; ``div`` is the truncating-division token)."""
    B, OFF = _HOLT_B, _HOLT_OFF
    l = f"(st {div} {B} - {OFF})"
    b = f"(st % {B} - {OFF})"
    nl = f"(({y} + {l} + {b}) {div} 2)"
    nb = f"(({b} + {nl} - {l}) {div} 2)"
    return f"(({nl} + {OFF}) * {B} + ({nb} + {OFF}))"


@register(
    "events_holt_forecast",
    oracle=f"""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         list_transform(list_sort(list({{'d': day, 'y': y}})), s -> s.y) AS ys
  FROM d GROUP BY event_type
),
h AS (
  SELECT event_type, CAST(len(ys) AS BIGINT) AS n_days,
         list_reduce(
           list_prepend(
             (ys[1] + {_HOLT_OFF}) * {_HOLT_B} + (ys[2] - ys[1] + {_HOLT_OFF}),
             ys[3:]),
           (st, x) -> {_holt_step("//", "x")}) AS st
  FROM s WHERE len(ys) >= 2
)
SELECT event_type, n_days,
       CAST(st // {_HOLT_B} - {_HOLT_OFF} AS BIGINT) AS holt_level,
       CAST(st % {_HOLT_B} - {_HOLT_OFF} AS BIGINT) AS holt_trend,
       CAST((st // {_HOLT_B} - {_HOLT_OFF})
            + (st % {_HOLT_B} - {_HOLT_OFF}) AS BIGINT) AS forecast_next
FROM h
""",
    tags=("events", "forecast", "smoothing", "holt", "timeseries"),
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT double exponential smoothing (α = β = 1/2) — the
    trend-aware forecast completing the smoothing family
    (``events_ses_forecast`` tracks level only, so it lags any
    trending series by construction; Holt carries (level, trend)
    state and its one-step forecast is level + trend).

    α = β = 1/2 keeps the whole recursion in integer halvings
    (l_t = (y_t + l + b) div 2; b_t = (b + (l_t − l)) div 2 —
    truncation toward zero agrees across engines even on the
    negative intermediate trends a dropping series produces). The
    two-component state rides the PACKED-BIGINT fold (see
    ``_holt_step``): a struct accumulator is NOT cross-engine-safe —
    DuckDB 1.0's list_reduce lets later struct fields observe the
    same step's already-updated earlier fields (measured; the
    engineering note above the helper) — but a scalar accumulator
    cannot be partially updated, so the packed encoding folds
    bit-identically on both engines. One aggregation; per-series
    state bounded by the calendar."""
    ev = _ev(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("y"))
    s = d.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))), s -> s.y)"
        ).alias("ys")
    )
    fold = (
        f"aggregate(slice(ys, 3, size(ys) - 2), "
        f"(ys[0] + {_HOLT_OFF}) * CAST({_HOLT_B} AS BIGINT)"
        f" + (ys[1] - ys[0] + {_HOLT_OFF}), "
        f"(st, x) -> {_holt_step('div', 'x')})"
    )
    return (
        s.where(F.expr("size(ys) >= 2"))
        .select(
            "event_type",
            F.expr("CAST(size(ys) AS BIGINT)").alias("n_days"),
            F.expr(fold).alias("_st"),
        )
        .select(
            "event_type",
            "n_days",
            F.expr(f"CAST(_st div {_HOLT_B} - {_HOLT_OFF} AS BIGINT)").alias(
                "holt_level"
            ),
            F.expr(f"CAST(_st % {_HOLT_B} - {_HOLT_OFF} AS BIGINT)").alias(
                "holt_trend"
            ),
            F.expr(
                f"CAST((_st div {_HOLT_B} - {_HOLT_OFF})"
                f" + (_st % {_HOLT_B} - {_HOLT_OFF}) AS BIGINT)"
            ).alias("forecast_next"),
        )
    )


@register(
    "events_cumulative_users",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS day FROM events
  GROUP BY user_id
),
n AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY day
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_users
FROM n
""",
    tags=("events", "growth", "cumulative", "timeseries"),
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE DISTINCT USERS per day — the growth curve a product
    dashboard draws. Running COUNT(DISTINCT) is the textbook
    quadratic trap; the exact linear form used here is: first-seen
    day per user (one shuffle on user_id), daily new-user counts,
    then an integer running sum over the DAY-GRAIN table — bounded by
    the calendar (dozens of rows), so the unpartitioned window is a
    constant-size driver-free fold, not the corpus-proportional
    single-task sort the prefix-offset rewrite exists for. Integer
    counts only — hash-exact."""
    ev = _ev(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    daily = first.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


@register(
    "events_user_features",
    oracle="""
WITH f AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
         CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
         CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_active_days,
         MIN(ts) AS first_ts, MAX(ts) AS last_ts,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY user_id
)
SELECT user_id, n_events, n_view, n_click, n_purchase, n_error,
       n_active_days, first_ts, last_ts, value_cents,
       (epoch_us(TIMESTAMP '2024-01-31') - epoch_us(last_ts))
         // 86400000000 AS recency_days,
       (epoch_us(last_ts) - epoch_us(first_ts)) // 86400000000 AS tenure_days,
       CAST(n_purchase AS DOUBLE) / CAST(n_events AS DOUBLE) AS purchase_rate,
       CAST(n_events AS DOUBLE) / CAST(n_active_days AS DOUBLE)
         AS events_per_active_day
FROM f
""",
    tags=("events", "features", "ml", "feature-store"),
)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE-STORE materialization: the wide per-user feature vector
    a churn/propensity model trains on — event-type counts, activity
    span (active days, tenure, recency vs the fixture horizon),
    monetary value, and exact-ratio rates, all in ONE aggregation
    pass (every FILTERed count shares the single user_id shuffle; no
    per-feature scans).

    Determinism: counts and day-spans are integers (epoch-microsecond
    arithmetic, truncating division); ``value`` is money — routed through
    DECIMAL(18,2) before the cents conversion (a double value·100
    rounds differently across engines: Spark truncates the cast,
    DuckDB rounds — the decimal-before-sum rule, measured again
    here) so the sum is an associative integer; the two rates are single divisions of
    exact integers. At 100 TB this is the canonical one-shuffle
    map-side-combinable wide aggregate."""
    ev = _ev(spark, sf_dir)
    cnt = lambda t: F.expr(  # noqa: E731
        f"CAST(COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT)"
    ).alias(f"n_{t}")
    f = ev.groupBy("user_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
        cnt("view"), cnt("click"), cnt("purchase"), cnt("error"),
        F.expr(
            "CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)"
        ).alias("n_active_days"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.expr(
            "CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))"
            " AS BIGINT)"
        ).alias("value_cents"),
    )
    day_us = 86_400_000_000
    return f.select(
        "user_id", "n_events", "n_view", "n_click", "n_purchase", "n_error",
        "n_active_days", "first_ts", "last_ts", "value_cents",
        F.expr(
            "(unix_micros(TIMESTAMP '2024-01-31 00:00:00')"
            f" - unix_micros(CAST(last_ts AS TIMESTAMP))) div {day_us}"
        ).alias("recency_days"),
        F.expr(
            "(unix_micros(CAST(last_ts AS TIMESTAMP))"
            f" - unix_micros(CAST(first_ts AS TIMESTAMP))) div {day_us}"
        ).alias("tenure_days"),
        (F.col("n_purchase").cast("double") / F.col("n_events").cast("double"))
        .alias("purchase_rate"),
        (F.col("n_events").cast("double") / F.col("n_active_days").cast("double"))
        .alias("events_per_active_day"),
    )
