"""Operator-level tests: semantics on controlled inputs + plan-shape
assertions that pin the scale properties (broadcast, pushdown,
pruning) the engine relies on at 100 TB."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mapreduce_citation_spark.operators.joins import asof_join
from mapreduce_citation_spark.plans import (
    assert_in_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)


# ---------------------------------------------------------------------------
# as-of join semantics on a hand-built case
# ---------------------------------------------------------------------------

def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", dt.datetime(2024, 1, 10)),
            (2, "u1", dt.datetime(2024, 1, 20)),
            (3, "u2", dt.datetime(2024, 1, 5)),   # before any right row
            (4, "u3", dt.datetime(2024, 1, 15)),  # key with no right rows
        ],
        ["event_id", "uid", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 8), 100),
            ("u1", dt.datetime(2024, 1, 10), 101),  # equal ts: matched (≤)
            ("u1", dt.datetime(2024, 1, 15), 102),
            ("u2", dt.datetime(2024, 1, 7), 200),
        ],
        ["uid", "rts", "val"],
    )
    out = {
        r["event_id"]: (r["val"], r["rts"])
        for r in asof_join(
            left, right, "uid", "uid", "ts", "rts", ["val", "rts"]
        ).collect()
    }
    assert out[1][0] == 101  # equal timestamp matches (≤ semantics)
    assert out[2][0] == 102  # latest ≤ Jan 20 is Jan 15
    assert out[3] == (None, None)  # left-join semantics: no match → NULLs
    assert out[4] == (None, None)  # unseen key → NULLs


def test_asof_join_has_no_join_blowup(spark):
    # the implementation must be union+window, not an inequality join
    left = spark.createDataFrame([(1, "u", dt.datetime(2024, 1, 1))], ["e", "k", "ts"])
    right = spark.createDataFrame([("u", dt.datetime(2024, 1, 1), 1)], ["k", "rts", "v"])
    out = asof_join(left, right, "k", "k", "ts", "rts", ["v"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# plan-shape assertions on the registered queries
# ---------------------------------------------------------------------------

def test_q3_broadcasts_customer_dim(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import q3_shipping_priority

    assert has_broadcast_join(q3_shipping_priority(spark, sf_dir))


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import q1_pricing_summary

    df = q1_pricing_summary(spark, sf_dir)
    assert any("l_shipdate" in f for f in pushed_filters(df)), (
        "shipdate filter must reach the parquet scan"
    )
    (cols,) = read_schema_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, (
        "scan must prune to the 7 referenced columns"
    )


def test_citation_counts_partial_aggregation(spark, sf_dir):
    from mapreduce_citation_spark.operators.citation_queries import citation_counts

    # partial (map-side) aggregate before the exchange — the combine
    # the reference hand-rolls at mapper.py:70-78
    plan = assert_in_plan(citation_counts(spark, sf_dir), "HashAggregate", "Exchange")
    assert plan.lower().index("hashaggregate") < plan.lower().index("exchange")


def test_fact_fact_join_shuffles_once_per_side(spark, sf_dir):
    from mapreduce_citation_spark.operators.joins import join_fact_fact

    from mapreduce_citation_spark.plans import explain_str

    # simple mode lists each node once (formatted repeats nodes in the
    # detail section); shuffle exchanges are "Exchange hashpartitioning"
    plan = explain_str(join_fact_fact(spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") <= 3


def test_sessionize_single_shuffle_for_window_and_agg(spark, sf_dir):
    from mapreduce_citation_spark.operators.windows import sessionize_events
    from mapreduce_citation_spark.plans import explain_str

    plan = explain_str(sessionize_events(spark, sf_dir), "simple")
    # window partitionBy(user_id) and groupBy(user_id, session_id) must
    # not re-shuffle: one shuffle exchange total
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# semantics spot-checks vs hand computation
# ---------------------------------------------------------------------------

def test_rollup_has_subtotals_and_grand_total(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import rollup_returns

    rows = rollup_returns(spark, sf_dir).collect()
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert len(grand) == 1
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert grand[0]["n"] == li_count


def test_range_join_buckets_cover_all_rows(spark, sf_dir):
    from mapreduce_citation_spark.operators.joins import range_join_buckets

    rows = range_join_buckets(spark, sf_dir).collect()
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["n"] for r in rows) == li_count  # buckets partition [1, 50]


def test_session_window_matches_manual_islands(spark, sf_dir):
    from mapreduce_citation_spark.operators.events import events_session_window
    from mapreduce_citation_spark.operators.windows import sessionize_events

    native = events_session_window(spark, sf_dir)
    manual = sessionize_events(spark, sf_dir)
    # same session count per user under the same 30-min gap
    n1 = {r["user_id"]: r["n"] for r in native.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n2 = {r["user_id"]: r["n"] for r in manual.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert n1 == n2


def test_gap_fill_grid_is_dense_and_fill_is_last_observation(spark, sf_dir):
    from mapreduce_citation_spark.operators.events import events_gap_fill_hourly

    rows = events_gap_fill_hourly(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["hour_start"])
        # dense hourly grid: consecutive rows are exactly 1h apart
        for a, b in zip(rs, rs[1:]):
            assert (b["hour_start"] - a["hour_start"]).total_seconds() == 3600
        # ends of the span are observations, not gaps
        assert not rs[0]["is_gap"] and not rs[-1]["is_gap"]
        # forward fill: v_filled on a gap equals the last observed value
        last_v = None
        for r in rs:
            if not r["is_gap"]:
                last_v = r["v_filled"]
            else:
                assert r["n_events"] == 0 and r["v_filled"] == last_v


def test_daily_anomaly_zscores_center_per_user(spark, sf_dir):
    import math

    from mapreduce_citation_spark.operators.events import events_daily_anomaly

    rows = events_daily_anomaly(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in by_user.items():
        if any(r["z"] is None for r in rs):
            # zero-variance guard: all-or-nothing per user, flag False
            assert all(r["z"] is None and r["is_anomaly"] is False for r in rs)
            continue
        zs = [r["z"] for r in rs if not math.isnan(r["z"])]
        if len(zs) < 2:
            continue
        # population z-scores: mean 0, variance 1 (moment form is exact)
        assert abs(sum(zs) / len(zs)) < 1e-9
        assert abs(sum(z * z for z in zs) / len(zs) - 1.0) < 1e-9
        for r in rs:
            assert r["is_anomaly"] == (abs(r["z"]) >= 2.0) or math.isnan(r["z"])


def test_retention_cohort_matrix_accounting(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import (
        orders_retention_cohorts,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    rows = orders_retention_cohorts(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_customers = o.select("o_custkey").distinct().count()
    n_orders = o.count()
    # every order lands in exactly one cell
    assert sum(r["n_orders"] for r in rows) == n_orders
    # month-0 cells: every customer is active in their cohort month
    assert sum(r["n_active"] for r in rows if r["months_since"] == 0) == n_customers
    assert all(r["months_since"] >= 0 for r in rows)


def test_vocab_topk_matches_python_reference(spark, sf_dir):
    import re
    from collections import Counter

    from mapreduce_citation_spark.operators.text import corpus_vocab_topk
    from mapreduce_citation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf: Counter = Counter()
    df: Counter = Counter()
    for r in docs:
        words = re.findall("[a-z0-9]+", r["text"].lower())
        tf.update(words)
        df.update(set(words))
    want = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:200]

    rows = corpus_vocab_topk(spark, sf_dir).collect()
    got = [(r["word"], r["tf"]) for r in rows]
    assert got == want
    assert all(r["df"] == df[r["word"]] for r in rows)


def test_attribution_accounts_for_every_purchase(spark, sf_dir):
    from mapreduce_citation_spark.operators.joins import (
        events_attribution_last_touch,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    rows = events_attribution_last_touch(spark, sf_dir).collect()
    total = sum(r["n_purchases"] for r in rows)
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .count()
    )
    assert total == n_purchases
    channels = {r["channel"] for r in rows}
    assert "purchase" not in channels  # purchases never self-attribute


def test_region_shares_sum_to_one(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import (
        nation_region_revenue_share,
    )

    rows = nation_region_revenue_share(spark, sf_dir).collect()
    by_region: dict[str, float] = {}
    for r in rows:
        by_region[r["region"]] = by_region.get(r["region"], 0.0) + r["region_share"]
        assert 0.0 < r["region_share"] <= 1.0
    assert by_region
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-12


def test_rfm_quintiles_are_balanced(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import (
        customer_rfm_segments,
    )

    rows = customer_rfm_segments(spark, sf_dir).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert set(sizes) == {1, 2, 3, 4, 5}
        # NTILE: bucket sizes differ by at most one
        assert max(sizes.values()) - min(sizes.values()) <= 1
        assert sum(sizes.values()) == n


def test_abc_classes_partition_revenue(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import (
        part_abc_classification,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    rows = {r["abc_class"]: r for r in part_abc_classification(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    # boundary consistency: class A stops at <=50% cumulative share and
    # A+B at <=80%, each within ONE part's revenue of the threshold —
    # the tolerance is the true max per-part revenue (a class average
    # would under-bound it on skewed data)
    total = sum(r["class_revenue"] for r in rows.values())
    from pyspark.sql import functions as F

    max_part_rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)"
            ).alias("rev")
        )
        .agg(F.max("rev"))
        .collect()[0][0]
    )
    assert rows["A"]["class_revenue"] <= 0.5 * total + max_part_rev
    ab = rows["A"]["class_revenue"] + rows["B"]["class_revenue"]
    assert 0.5 * total - max_part_rev <= rows["A"]["class_revenue"]
    assert 0.8 * total - max_part_rev <= ab <= 0.8 * total + max_part_rev


def test_daily_anomaly_zero_variance_user_gets_null_z(spark):
    """A user with identical daily counts has zero variance: the
    integer-moment guard must emit NULL z and is_anomaly=False (not
    0/0, which Spark and DuckDB disagree on)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from mapreduce_citation_spark.operators.events import events_daily_anomaly

    rows = []
    eid = 0
    # user 7: exactly 2 events on each of 3 days -> zero variance
    for day in (1, 2, 3):
        for _ in range(2):
            rows.append((eid, f"2024-02-0{day}T10:0{eid % 6}:00", 7, "view", 1.0, "{}"))
            eid += 1
    # user 8: varying counts (1, 3) -> normal z-scores
    rows.append((eid, "2024-02-01T10:00:00", 8, "view", 1.0, "{}")); eid += 1
    for _ in range(3):
        rows.append((eid, "2024-02-02T11:00:00", 8, "view", 1.0, "{}")); eid += 1

    with tempfile.TemporaryDirectory() as td:
        (
            spark.createDataFrame(
                rows, ["event_id", "raw_ts", "user_id", "event_type", "value", "props"]
            )
            .withColumn("ts", F.to_timestamp("raw_ts"))
            .drop("raw_ts")
            .write.parquet(os.path.join(td, "events.parquet"))
        )
        got = events_daily_anomaly(spark, td).collect()
    u7 = [r for r in got if r["user_id"] == 7]
    u8 = [r for r in got if r["user_id"] == 8]
    assert len(u7) == 3 and all(r["z"] is None and r["is_anomaly"] is False for r in u7)
    assert len(u8) == 2 and all(r["z"] is not None for r in u8)


def test_dau_wau_stickiness_bounds(spark, sf_dir):
    from mapreduce_citation_spark.operators.events import (
        events_dau_wau_stickiness,
    )

    rows = events_dau_wau_stickiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["dau"] <= r["wau"]
        assert abs(r["stickiness"] - r["dau"] / r["wau"]) < 1e-15
        assert 0 < r["stickiness"] <= 1.0


def test_interorder_gaps_accounting(spark, sf_dir):
    from mapreduce_citation_spark.operators.relational import (
        segment_interorder_gaps,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    rows = segment_interorder_gaps(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_customers = o.select("o_custkey").distinct().count()
    # each customer's first order has no gap; every later order has one
    assert sum(r["n_gaps"] for r in rows) == n_orders - n_customers
    for r in rows:
        assert r["avg_gap_days"] >= 0 and r["median_gap_days"] >= 0


def test_scd2_history_reconstructs_event_stream(spark, sf_dir):
    """SCD2 invariants per user — versions contiguous from 1, exactly
    one open (is_current) interval, consecutive states differ,
    intervals chain (valid_to = next valid_from) — and the strong
    round-trip property: EVERY raw event's type equals the state of
    the interval containing its timestamp."""
    import bisect

    import pandas as pd

    from mapreduce_citation_spark.operators.events import events_scd2_history

    hist = pd.DataFrame(
        r.asDict() for r in events_scd2_history(spark, sf_dir).collect()
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    for uid, h in hist.groupby("user_id"):
        h = h.sort_values("version").reset_index(drop=True)
        assert list(h["version"]) == list(range(1, len(h) + 1))
        assert h["is_current"].sum() == 1 and bool(h["is_current"].iloc[-1])
        states = list(h["state"])
        assert all(a != b for a, b in zip(states, states[1:]))
        # intervals chain with no gaps or overlaps
        assert list(h["valid_to"][:-1]) == list(h["valid_from"][1:])
        assert pd.isna(h["valid_to"].iloc[-1])
        # round trip: each event falls in exactly the interval whose
        # state matches it (ties on ts resolved by event_id order,
        # which the interval build also uses)
        u = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
        starts = list(h["valid_from"])
        for _, e in u.iterrows():
            i = bisect.bisect_right(starts, e["ts"]) - 1
            candidates = {h["state"].iloc[i]}
            # events at the exact boundary ts of the next interval may
            # belong to either side of an equal-ts run; accept the
            # state of any interval starting at this ts too
            j = i + 1
            while j < len(h) and h["valid_from"].iloc[j] == e["ts"]:
                candidates.add(h["state"].iloc[j])
                j += 1
            assert e["event_type"] in candidates


def test_mg_heavy_hitters_recall_and_exactness(spark, sf_dir):
    """Misra-Gries guarantees: (1) on an adversarially partitioned
    stream with tiny k, the union of batch summaries still contains
    every key with global frequency > N/k (the deficit bound); (2)
    the registered query's verified output equals the exact truth
    computed in pandas."""
    import pandas as pd

    from pyspark.sql import functions as F

    from mapreduce_citation_spark.operators.events import (
        _MG_KEY,
        events_heavy_hitters_mg,
        mg_summaries,
    )

    # (1) one moderately-heavy key diluted across partitions so it is
    # never locally dominant, plus per-partition-heavy noise keys
    rows = []
    for p in range(8):
        rows += [(p * 1000 + i % 3,) for i in range(60)]  # local noise
        rows += [(777,) for _ in range(12)]  # global hitter, spread thin
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    n = len(rows)
    summ = mg_summaries(df, 4)
    cand = {r["k"] for r in summ.filter(F.col("k") >= 0).collect()}
    counts = pd.Series([k for (k,) in rows]).value_counts()
    for key, cnt in counts.items():
        if cnt * 4 > n:
            assert key in cand, f"heavy key {key} missing from summaries"

    # (2) registered query == pandas exact truth
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id"])
    keyed = ev.apply(
        lambda r: r["user_id"] % 5 if r["event_id"] % 2 == 0
        else r["user_id"] + 10000, axis=1)
    vc = keyed.value_counts()
    total = len(keyed)
    want = {int(k): int(c) for k, c in vc.items() if c * 50 > total}
    got = {r["key"]: r["cnt"] for r in events_heavy_hitters_mg(spark, sf_dir).collect()}
    assert got == want and len(got) >= 5  # the 5 hot keys always qualify


def test_daily_trend_matches_numpy_ols(spark, sf_dir):
    """The closed-form OLS equals numpy's polyfit/corrcoef on the
    same daily counts (to float tolerance), and r² lies in [0, 1]."""
    import numpy as np
    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.events import events_daily_trend

    rows = events_daily_trend(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    ev["x"] = (ev["ts"].dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    for r in rows:
        g = ev[ev["event_type"] == r["event_type"]].groupby("x").size()
        x, y = g.index.to_numpy(float), g.to_numpy(float)
        slope, intercept = np.polyfit(x, y, 1)
        assert r["n_days"] == len(x)
        assert r["slope"] == _pt.approx(slope, rel=1e-9)
        assert r["intercept"] == _pt.approx(intercept, rel=1e-9)
        assert r["r2"] == _pt.approx(np.corrcoef(x, y)[0, 1] ** 2, rel=1e-9)
        assert 0.0 <= r["r2"] <= 1.0


def test_markov_transitions_rows_sum_to_one(spark, sf_dir):
    """Transition-matrix invariants: per-from_type probabilities sum
    to 1 (within float addition of exact ratios); counts match a
    pandas LEAD replay."""
    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.events import (
        events_markov_transitions,
    )

    rows = events_markov_transitions(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["next_type"] = ev.groupby("user_id")["event_type"].shift(-1)
    t = ev.dropna(subset=["next_type"]).groupby(
        ["event_type", "next_type"]
    ).size()
    want = {(a, b): int(n) for (a, b), n in t.items()}
    got = {(r["from_type"], r["to_type"]): r["n"] for r in rows}
    assert got == want
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p"]
    for s in by_from.values():
        assert s == _pt.approx(1.0, abs=1e-12)


def test_degree_histogram_partitions_the_graph(spark, sf_dir):
    """Histogram invariants: buckets are disjoint and complete
    (Σ n_papers = distinct cited papers; Σ total_citations = edge
    count), and each bucket's [min, max] lies inside [2^b, 2^{b+1})."""
    from mapreduce_citation_spark.operators.graph import (
        citation_degree_histogram,
        edges_from_lineitem,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    rows = citation_degree_histogram(spark, sf_dir).collect()
    e = edges_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    n_papers = e.select("to_paper").distinct().count()
    n_edges = e.count()
    assert sum(r["n_papers"] for r in rows) == n_papers
    assert sum(r["total_citations"] for r in rows) == n_edges
    for r in rows:
        b = r["log2_bucket"]
        assert 2 ** b <= r["min_degree"] <= r["max_degree"] < 2 ** (b + 1)


def test_integrity_audit_and_profile(spark, sf_dir):
    """DQ family sanity: the TPC-H-shaped fixture is clean (zero PK
    and FK violations, non-trivial row counts); the profile's
    counters match direct pandas computation column by column."""
    import pandas as pd

    from mapreduce_citation_spark.operators.dq import (
        warehouse_integrity_audit,
        warehouse_profile_events,
    )

    audit = {r["check_name"]: r for r in
             warehouse_integrity_audit(spark, sf_dir).collect()}
    assert len(audit) == 6
    for name, r in audit.items():
        assert r["n_rows"] > 0, name
        assert r["n_violations"] == 0, name

    prof = {r["col"]: r for r in
            warehouse_profile_events(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert set(prof) == set(ev.columns)
    for col, r in prof.items():
        assert r["n_rows"] == len(ev)
        assert r["n_null"] == int(ev[col].isna().sum())
        assert r["n_distinct"] == int(ev[col].nunique())


def test_ses_forecast_matches_python_fold(spark, sf_dir):
    """The integer SES fold equals a python replay over the same
    day-sorted counts, and the smoothed level lies within the
    series' [min, max] envelope (a convexity property of α=1/2
    halving, up to the floor's -1)."""
    import pandas as pd

    from mapreduce_citation_spark.operators.events import events_ses_forecast

    rows = events_ses_forecast(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    ev["day"] = ev["ts"].dt.floor("D")
    for r in rows:
        ys = (
            ev[ev["event_type"] == r["event_type"]]
            .groupby("day").size().sort_index().tolist()
        )
        acc = ys[0]
        for x in ys[1:]:
            acc = (x + acc) // 2
        assert r["n_days"] == len(ys)
        assert r["ses_level"] == acc
        assert r["last_count"] == ys[-1]
        assert min(ys) - 1 <= r["ses_level"] <= max(ys)


def test_daily_acf_matches_numpy_replay(spark, sf_dir):
    """The integer-moment ACF equals a numpy replay of the same
    estimator (full-series-variance denominator, day-lag-validated
    pairs), and every coefficient lies in [-1, 1]."""
    import numpy as np
    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.events import events_daily_acf

    rows = events_daily_acf(spark, sf_dir).collect()
    assert rows
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    ev["x"] = (ev["ts"].dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    for r in rows:
        g = ev[ev["event_type"] == r["event_type"]].groupby("x").size()
        x, y = g.index.to_numpy(int), g.to_numpy(float)
        assert r["n_days"] == len(x)
        ybar = y.mean()
        den = ((y - ybar) ** 2).sum()
        pos = {d: i for i, d in enumerate(x)}
        for k in (1, 2, 3):
            num = sum(
                (y[i] - ybar) * (y[pos[d + k]] - ybar)
                for i, d in enumerate(x) if d + k in pos
                # day-lag semantics: LEAD(x, k) = x + k means the k-th
                # FOLLOWING OBSERVED day is exactly k days later
                and sorted(dd for dd in pos if dd > d)[k - 1] == d + k
            )
            want = num / den
            got = r[f"acf{k}"]
            if num == 0 and got is None:
                continue
            assert got == _pt.approx(want, rel=1e-9)
            assert -1.0 <= got <= 1.0


def test_trailing_rates_match_pandas_replay(spark, sf_dir):
    """RANGE-interval frame counts equal a pandas replay of the
    inclusive [ts - delta, ts] window per user, and invariants hold:
    n_1h <= n_24h, both >= 1 (the row itself is in its own frame)."""
    import pandas as pd

    from mapreduce_citation_spark.operators.events import events_trailing_rates

    rows = events_trailing_rates(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    by_user = {u: g["ts"].sort_values().tolist()
               for u, g in ev.groupby("user_id")}
    ts_of = dict(zip(ev["event_id"], ev["ts"]))
    uid_of = dict(zip(ev["event_id"], ev["user_id"]))
    for r in rows:
        t = ts_of[r["event_id"]]
        series = by_user[uid_of[r["event_id"]]]
        want_1h = sum(1 for x in series
                      if t - pd.Timedelta(hours=1) <= x <= t)
        want_24h = sum(1 for x in series
                       if t - pd.Timedelta(hours=24) <= x <= t)
        assert (r["n_1h"], r["n_24h"]) == (want_1h, want_24h)
        assert 1 <= r["n_1h"] <= r["n_24h"]


def test_snapshot_diff_changelog_replays_to_target(spark, sf_dir):
    """The changelog's defining property: applying it to snapshot 1
    reproduces snapshot 2 exactly (insert adds, delete removes,
    update overwrites, unchanged keys carried over) — verified
    against a pandas rebuild of both snapshots. All three ops must
    occur on this fixture."""
    import pandas as pd

    from mapreduce_citation_spark.operators.events import events_snapshot_diff

    rows = events_snapshot_diff(spark, sf_dir).collect()
    ops = {r["op"] for r in rows}
    assert ops == {"insert", "delete", "update"}

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    cut = pd.Timestamp("2024-01-16 00:00:00")
    s1 = (ev[(ev["ts"] < cut) & (ev["user_id"] % 20 != 0)]
          .groupby("user_id").size().to_dict())
    s2 = (ev[(ev["ts"] >= cut) & (ev["user_id"] % 20 != 1)]
          .groupby("user_id").size().to_dict())

    state = dict(s1)
    for r in rows:
        if r["op"] == "insert":
            assert r["user_id"] not in state and r["old_n"] is None
            state[r["user_id"]] = r["new_n"]
        elif r["op"] == "delete":
            assert r["new_n"] is None
            del state[r["user_id"]]
        else:
            assert state[r["user_id"]] == r["old_n"] != r["new_n"]
            state[r["user_id"]] = r["new_n"]
    assert state == s2


def test_survival_km_matches_lifelines_style_replay(spark, sf_dir):
    """The KM curve equals an exact python replay of the estimator
    (risk sets, event counts, product-limit survival) built from the
    raw events; survival is monotone nonincreasing in (0, 1]."""
    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.events import (
        _KM_HORIZON_H,
        events_survival_km,
    )

    rows = sorted(events_survival_km(spark, sf_dir).collect(),
                  key=lambda r: r["t_hours"])
    assert rows
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    fv = (ev[ev["event_type"] == "view"].groupby("user_id")["ts"].min())
    durs = []
    for u, v in fv.items():
        p = ev[(ev["event_type"] == "purchase") & (ev["user_id"] == u)
               & (ev["ts"] >= v)]["ts"].min()
        if pd.isna(p):
            durs.append((_KM_HORIZON_H, False))
        else:
            h = int((p - v).total_seconds()) // 3600
            durs.append((h, True) if h < _KM_HORIZON_H
                        else (_KM_HORIZON_H, False))
    surv, prev_t = 1.0, -1
    want = []
    for t in sorted({t for t, e in durs if e}):
        n = sum(1 for td, _ in durs if td >= t)
        d = sum(1 for td, e in durs if td == t and e)
        surv *= 1.0 - d / n
        want.append((t, n, d, surv))
        assert t > prev_t
        prev_t = t
    got = [(r["t_hours"], r["n_risk"], r["d_events"], r["survival"])
           for r in rows]
    assert [(t, n, d) for t, n, d, _ in got] == [(t, n, d) for t, n, d, _ in want]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert gs == _pt.approx(ws, rel=1e-12)
    sv = [s for _, _, _, s in got]
    assert all(0 < s <= 1 for s in sv)
    assert all(a >= b for a, b in zip(sv, sv[1:]))


def test_pattern_sequences_first_match_semantics(spark, sf_dir):
    """Pattern instances are strictly ordered in time, one per view,
    and each step really is the FIRST eligible event: a pandas replay
    of the greedy first-click/first-purchase rule matches exactly."""
    import pandas as pd

    from mapreduce_citation_spark.operators.events import (
        events_pattern_sequences,
    )

    rows = events_pattern_sequences(spark, sf_dir).collect()
    assert rows
    view_ids = [r["view_id"] for r in rows]
    assert len(view_ids) == len(set(view_ids))  # one match per view
    for r in rows:
        assert r["view_ts"] <= r["click_ts"] <= r["purchase_ts"]

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])
    win = pd.Timedelta(hours=24)
    by_user = dict(tuple(ev.groupby("user_id")))
    want = {}
    for _, v in ev[ev["event_type"] == "view"].iterrows():
        g = by_user[v["user_id"]]
        cl = g[(g["event_type"] == "click") & (g["ts"] >= v["ts"])
               & (g["ts"] < v["ts"] + win)]
        if not len(cl):
            continue
        c = cl.sort_values(["ts", "event_id"]).iloc[0]
        pu = g[(g["event_type"] == "purchase") & (g["ts"] >= c["ts"])
               & (g["ts"] < c["ts"] + win)]
        if not len(pu):
            continue
        p = pu.sort_values(["ts", "event_id"]).iloc[0]
        want[v["event_id"]] = (c["event_id"], p["event_id"])
    got = {r["view_id"]: (r["click_id"], r["purchase_id"]) for r in rows}
    assert got == want


def test_holt_forecast_matches_python_fold(spark, sf_dir):
    """Holt's packed-BIGINT fold equals an exact python replay of the
    (level, trend) recursion with truncating halvings; the forecast
    is level + trend; SES must lag Holt on a trending planted series
    (the reason the trend component exists)."""
    import pandas as pd

    from mapreduce_citation_spark.operators.events import events_holt_forecast

    rows = events_holt_forecast(spark, sf_dir).collect()
    assert rows
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    ev["day"] = ev["ts"].dt.floor("D")

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for r in rows:
        ys = (ev[ev["event_type"] == r["event_type"]]
              .groupby("day").size().sort_index().tolist())
        l, b = ys[0], ys[1] - ys[0]
        for y in ys[2:]:
            nl = tdiv(y + l + b, 2)
            b = tdiv(b + (nl - l), 2)
            l = nl
        assert (r["holt_level"], r["holt_trend"]) == (l, b)
        assert r["forecast_next"] == l + b
        assert r["n_days"] == len(ys)

    # trending planted series: Holt's forecast tracks the slope, SES lags
    ys = list(range(10, 10 + 2 * 20, 2))  # slope 2
    l, b = ys[0], ys[1] - ys[0]
    ses = ys[0]
    for y in ys[1:]:
        ses = tdiv(y + ses, 2)
    for y in ys[2:]:
        nl = tdiv(y + l + b, 2)
        b = tdiv(b + (nl - l), 2)
        l = nl
    assert abs((l + b) - (ys[-1] + 2)) <= 1   # Holt ~ next point
    assert ses < ys[-1]                        # SES lags the trend


def test_user_features_match_pandas_replay(spark, sf_dir):
    """The feature vector equals a pandas replay per user (counts,
    active days, recency/tenure, decimal-exact cents, exact-ratio
    rates) and type counts tally to n_events minus signups."""
    from decimal import Decimal

    import pandas as pd
    import pytest as _pt

    from mapreduce_citation_spark.operators.events import events_user_features

    rows = events_user_features(spark, sf_dir).collect()
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    )
    horizon = pd.Timestamp("2024-01-31")
    for r in rows[:40]:
        g = ev[ev["user_id"] == r["user_id"]]
        assert r["n_events"] == len(g)
        for t in ("view", "click", "purchase", "error"):
            assert r[f"n_{t}"] == (g["event_type"] == t).sum()
        assert r["n_active_days"] == g["ts"].dt.floor("D").nunique()
        cents = sum(int(Decimal(str(round(v, 2))) * 100) for v in g["value"])
        assert r["value_cents"] == cents
        assert r["recency_days"] == int(
            (horizon - g["ts"].max()).total_seconds()) // 86400
        assert r["tenure_days"] == int(
            (g["ts"].max() - g["ts"].min()).total_seconds()) // 86400
        assert r["purchase_rate"] == _pt.approx(
            (g["event_type"] == "purchase").sum() / len(g), rel=1e-15)


def test_integrity_audit_single_pass_plan(spark, sf_dir):
    """r7 rework pin: the audit reads each table exactly ONCE — a
    FileScan that feeds an InMemoryRelation is the cache fill (one
    physical read however many times the cache is referenced), and no
    table may have a second, uncached scan."""
    import importlib.util
    import os

    from mapreduce_citation_spark.operators.dq import (
        warehouse_integrity_audit,
    )

    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "audit_plans.py")
    spec = importlib.util.spec_from_file_location("audit_plans", tool)
    ap = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ap)

    plan = (
        warehouse_integrity_audit(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scans = ap.count_scans(plan)
    assert scans == {"orders": 1, "customer": 1, "part": 1, "lineitem": 1}


def test_integrity_audit_detects_planted_violations(spark, sf_dir, tmp_path):
    """The audit is not a tautology: a load with a duplicated order
    key, an orphaned order->customer reference, and an orphaned
    lineitem->part reference reports exactly those violation counts
    (and n_rows reflecting the corruption)."""
    import pandas as pd

    from mapreduce_citation_spark.operators.dq import (
        warehouse_integrity_audit,
    )

    src = "/root/testdata/sf0.001"
    o = pd.read_parquet(f"{src}/orders.parquet")
    c = pd.read_parquet(f"{src}/customer.parquet")
    p = pd.read_parquet(f"{src}/part.parquet")
    li = pd.read_parquet(f"{src}/lineitem.parquet")

    dup = o.iloc[[0]]                       # duplicate PK row
    orphan_o = o.iloc[[1]].copy()
    orphan_o["o_orderkey"] = o["o_orderkey"].max() + 10_000  # fresh PK
    orphan_o["o_custkey"] = c["c_custkey"].max() + 10_000   # FK orphan
    o_bad = pd.concat([o, dup, orphan_o], ignore_index=True)
    orphan_li = li.iloc[[0]].copy()
    orphan_li["l_partkey"] = p["p_partkey"].max() + 10_000  # FK orphan
    li_bad = pd.concat([li, orphan_li], ignore_index=True)

    d = tmp_path / "corrupted"
    d.mkdir()
    o_bad.to_parquet(d / "orders.parquet")
    c.to_parquet(d / "customer.parquet")
    p.to_parquet(d / "part.parquet")
    li_bad.to_parquet(d / "lineitem.parquet")

    audit = {r["check_name"]: r for r in
             warehouse_integrity_audit(spark, str(d)).collect()}
    assert audit["pk:orders.o_orderkey"]["n_violations"] == 1
    assert audit["pk:orders.o_orderkey"]["n_rows"] == len(o) + 2
    # the duplicated order row has a VALID custkey; only the planted
    # orphan trips the FK probe
    assert audit["fk:orders.o_custkey->customer"]["n_violations"] == 1
    assert audit["fk:lineitem.l_partkey->part"]["n_violations"] == 1
    # the duplicated o_orderkey must NOT multiply lineitem FK probes
    assert audit["fk:lineitem.l_orderkey->orders"]["n_rows"] == len(li) + 1
    assert audit["fk:lineitem.l_orderkey->orders"]["n_violations"] == 0
    assert audit["pk:customer.c_custkey"]["n_violations"] == 0
    assert audit["pk:part.p_partkey"]["n_violations"] == 0


def test_delete_cascade_matches_pandas(spark, sf_dir):
    """GDPR cascade counts replayed in pandas: cohort, their orders,
    and those orders' line items."""
    import pandas as pd

    from mapreduce_citation_spark.operators.dq import (
        warehouse_delete_cascade,
    )

    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    ck = set(c.loc[c["c_acctbal"] < 0, "c_custkey"])
    ok = set(o.loc[o["o_custkey"].isin(ck), "o_orderkey"])
    want = {
        "customer": len(ck),
        "orders": len(ok),
        "lineitem": int(li["l_orderkey"].isin(ok).sum()),
    }
    got = {r["table_name"]: r["n_cascade"]
           for r in warehouse_delete_cascade(spark, sf_dir).collect()}
    assert got == want
    assert got["customer"] > 0  # the cohort is non-trivial on fixtures


def test_cumulative_users_invariants(spark, sf_dir):
    """Growth-curve identities: cum_users is the running sum of
    new_users, strictly increasing, and ends at the corpus's total
    distinct user count."""
    import pandas as pd

    from mapreduce_citation_spark.operators.events import (
        events_cumulative_users,
    )

    rows = sorted(
        events_cumulative_users(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    run = 0
    for r in rows:
        run += r["new_users"]
        assert r["cum_users"] == run
        assert r["new_users"] > 0
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert rows[-1]["cum_users"] == ev["user_id"].nunique()
