"""Bloom-filter join pruning: the first-principles operator's exact
semantics + selectivity, and the ENGINE's own runtime bloom filter
(InjectRuntimeFilter) plan-pinned in a fresh JVM where the 10 GB
application-side threshold is lowered to fixture scale."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def test_bloom_prefilter_is_exact_and_selective(spark, sf_dir):
    """The bloom pre-filter must be invisible in the join result (no
    false negatives) while pruning most of the fact side before the
    shuffle. Checks: pair results identical; every truly-matching
    fact row survives the probe; the survivor set is a small fraction
    of the fact table (true matches + bloom false positives)."""
    from mapreduce_citation_spark.operators.joins import (
        _t,
        _urgent_orders,
        bloom_bitmap,
        bloom_bitmap_map,
        bloom_prefilter,
        join_bloom_plain,
        join_bloom_prefilter,
    )

    a = sorted(map(tuple, join_bloom_prefilter(spark, sf_dir).collect()))
    b = sorted(map(tuple, join_bloom_plain(spark, sf_dir).collect()))
    assert a == b and len(a) > 0

    o = _urgent_orders(spark, sf_dir)
    bitmap = bloom_bitmap(o, "o_orderkey", 1 << 17)
    assert bitmap.count() <= (1 << 17) // 64  # fixed-size summary
    bm = bloom_bitmap_map(o, "o_orderkey", 1 << 17)
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    survivors = bloom_prefilter(li, "l_orderkey", bm, 1 << 17)
    n_total = li.count()
    n_surv = survivors.count()
    n_true = li.join(o.select("o_orderkey"),
                     li.l_orderkey == F.col("o_orderkey"), "semi").count()
    surv_keys = {r["l_orderkey"] for r in survivors.distinct().collect()}
    true_keys = {
        r["l_orderkey"]
        for r in li.join(o.select("o_orderkey"),
                         li.l_orderkey == F.col("o_orderkey"), "semi")
        .distinct().collect()
    }
    assert true_keys <= surv_keys  # no false negatives
    assert n_true <= n_surv < n_total * 0.5  # real pruning happened


_ENGINE_BLOOM_CHILD = r"""
import io, contextlib, json, sys
repo, sf = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .appName("engine-bloom")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold", "100KB")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(f"{sf}/lineitem.parquet")
o = spark.read.parquet(f"{sf}/orders.parquet").filter(
    (F.col("o_orderpriority") == "1-URGENT")
    & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
)
q = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
    F.count(F.lit(1)).alias("n")
)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    q.explain(True)
plan = buf.getvalue()
rows = q.collect()
plain = (
    li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
)
print(json.dumps({
    "has_bloom": ("bloom_filter" in plan.lower()
                  or "might_contain" in plan.lower()),
    "rows": sorted([r["o_orderpriority"], r["n"]] for r in rows),
    "plain": sorted([r["o_orderpriority"], r["n"]] for r in plain),
}))
spark.stop()
"""


def test_engine_runtime_bloom_filter_injection(tmp_path):
    """Spark's own InjectRuntimeFilter: with the application-side
    scan threshold lowered to fixture scale (the only change — the
    optimization itself is stock), the selective-dim shuffle join
    must plan a bloom filter on the fact side (``might_contain`` /
    ``bloom_filter_agg`` in the plan) and return the same result as
    the unfiltered join. Fresh JVM so the lowered threshold cannot
    leak into the shared test session."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, "-c", _ENGINE_BLOOM_CHILD, repo,
         "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["has_bloom"], "engine did not inject a runtime bloom filter"
    assert got["rows"] == got["plain"] and len(got["rows"]) == 1


def test_zorder_buckets_skip_better_than_linear(spark, sf_dir):
    """The z-order layout's own emitted min/max envelopes must prune
    strictly better than the linear layout for a 2-D box predicate,
    and at least as well for a trailing-dimension predicate (where
    linear prunes nothing). Also pins layout invariants: equal-row
    buckets (NTILE), full code range covered by both layouts."""
    from mapreduce_citation_spark.operators.joins import layout_zorder_stats

    rows = layout_zorder_stats(spark, sf_dir).collect()
    by_layout = {"zorder": [], "linear": []}
    for r in rows:
        by_layout[r["layout"]].append(r)
    assert len(by_layout["zorder"]) == 16 and len(by_layout["linear"]) == 16
    nz = {r["n"] for r in by_layout["zorder"]}
    assert max(nz) - min(nz) <= 1  # NTILE equal-row buckets

    def touched(buckets, u_rng, v_rng):
        (ul, uh), (vl, vh) = u_rng, v_rng
        return sum(
            1 for r in buckets
            if r["max_u"] >= ul and r["min_u"] <= uh
            and r["max_v"] >= vl and r["min_v"] <= vh
        )

    box = ((4, 7), (4, 7))
    z_box = touched(by_layout["zorder"], *box)
    l_box = touched(by_layout["linear"], *box)
    assert z_box < l_box, (z_box, l_box)

    trailing = ((0, 15), (4, 7))  # no constraint on the leading dim
    z_tr = touched(by_layout["zorder"], *trailing)
    l_tr = touched(by_layout["linear"], *trailing)
    assert l_tr == 16  # linear layout cannot prune on the trailing dim
    assert z_tr <= l_tr


def test_interval_overlap_join_exact_and_count_once(spark, sf_dir):
    """The bucketed count-once plan equals the naive quadratic
    overlap join exactly: same (session, promo) pair set, each pair
    exactly once, same integer overlap lengths — verified against a
    pandas interval-intersection replay."""
    import pandas as pd

    from mapreduce_citation_spark.operators.joins import (
        _CAL_EPOCH_US,
        _DAY_US,
        _N_PROMOS,
        interval_overlap_join,
    )

    rows = interval_overlap_join(spark, sf_dir).collect()
    keys = [(r["user_id"], r["session_id"], r["promo_id"]) for r in rows]
    assert len(keys) == len(set(keys))  # count-once

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    want = {}
    for uid, g in ev.groupby("user_id"):
        sid, prev, bounds = 0, None, {}
        for _, r in g.iterrows():
            if prev is None or (r["ts"] - prev) > gap:
                sid += 1
                bounds[sid] = [r["ts"], r["ts"]]
            else:
                bounds[sid][1] = r["ts"]
            prev = r["ts"]
        for sid, (a, b) in bounds.items():
            ss = int(a.value) // 1000  # ns -> us
            se = int(b.value) // 1000
            for i in range(_N_PROMOS):
                ps = _CAL_EPOCH_US + 3 * i * _DAY_US
                pe = ps + 2 * _DAY_US
                if ss < pe and ps <= se:
                    ov = (min(se, pe - 1) - max(ss, ps)) // 1_000_000
                    want[(uid, sid, i)] = ov
    got = {(r["user_id"], r["session_id"], r["promo_id"]): r["overlap_seconds"]
           for r in rows}
    assert got == want and want
