"""Distributed global-order primitives — the prefix-offset
decomposition of unpartitioned window functions.

``Window.orderBy(...)`` with no ``partitionBy`` is the one Spark shape
that silently stops scaling: Catalyst plans ``Exchange
SinglePartition`` + a single-task sort, so a corpus-proportional input
funnels through ONE core regardless of cluster size (measured in this
repo: 7.6× time at a 10× input step for the z-order layout query,
``SCALING_r06c_FIXTURES.json``). The semantics — global ``row_number``
/ ``ntile`` / running ``sum`` — don't need a global sort, only a
global ORDER, and Spark already builds one distributively:
``repartitionByRange`` puts partition *i*'s keys strictly below
partition *i+1*'s.

The decomposition (textbook parallel prefix-scan, MPI-style):

1. ``repartitionByRange(n, keys).sortWithinPartitions(keys)`` — the
   engine's sampled range partitioner; the only corpus-wide shuffle.
2. Per-row partition id + local 1-based rank from pure arithmetic on
   ``monotonically_increasing_id()`` (upper 31 bits = partition id,
   lower 33 bits = the row's 0-based index within the partition in
   physical order — i.e. the sorted order step 1 just produced), so
   the rank-only path needs NO window and NO second shuffle.
3. For running sums, a window PARTITIONED by the partition id (a
   hash exchange whose reduce side is one task per range partition —
   distributed n-ways, spill-capable, never SinglePartition).
4. A tiny per-partition totals table (≤ ``n_parts`` rows — bounded by
   configuration, not by the corpus) turned into EXCLUSIVE prefix
   offsets; broadcast-joined back. ``global = offset[pid] + local``.

Exactness: range partitions are disjoint key ranges in key order and
``sortWithinPartitions`` orders within, so ``offset[pid] + local_rank``
IS the global ``row_number`` for any sampled bounds — the sampling
affects balance, never values. That is why the DuckDB oracles of the
queries built on this helper are unchanged: same semantics, different
physical strategy.

The one remaining unpartitioned window in the plan runs over the
``n_parts``-row totals table and orders by ``_pp_pid`` — the plan-pin
test (``tests/test_prefix.py``) allows exactly that spec and fails on
any other unpartitioned window.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: monotonically_increasing_id packs the partition id above bit 33.
_MID_BASE = 1 << 33

#: Internal column names — prefixed so the plan-pin test can recognize
#: the helper's own (bounded) offsets window by its sort key.
_PID = "_pp_pid"
_LRANK = "_pp_lrank"


def with_global_order(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    rank: str | None = None,
    cumsum: Mapping[str, str] | None = None,
    total: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Attach exact global-order columns to ``df`` without any
    single-partition sort.

    - ``rank``: name for a global 1-based ``row_number`` over
      ``order_cols`` (ties impossible when the caller's key is unique,
      which every caller in this repo guarantees with id tiebreakers).

    **``order_cols`` MUST be globally unique** — for ``rank`` AND for
    ``cumsum``. Determinism under cache eviction depends on it: if a
    persisted partition is evicted and recomputed, the
    ``monotonically_increasing_id`` projection re-runs over the
    recomputed partition, and only a total (tie-free) order guarantees
    ``sortWithinPartitions`` reproduces the identical physical row
    order — with ties, the recomputed local ranks could permute tied
    rows, so per-row ``cumsum`` values (and rank assignments among the
    tied rows) would differ between the offsets aggregate and the
    final join. Callers with a non-unique sort key must append an id
    tiebreaker (every caller in this repo does).
    - ``cumsum``: ``{out_col: in_col}`` — global INCLUSIVE running
      ``sum(in_col)`` in ``order_cols`` order.
    - ``total``: name for a column carrying the global row count
      (derived from the per-partition totals — no extra corpus scan),
      so callers computing ``ntile`` from ranks don't re-aggregate.

    Cost: one range shuffle; plus one pid-hash shuffle iff ``cumsum``
    is requested; plus an ``n_parts``-row offsets table broadcast. The
    repartitioned frame is persisted (MEMORY_AND_DISK — columnar,
    evictable; the repo's corpus-cache rule) because both the offsets
    aggregate and the final join read it.
    """
    cumsum = dict(cumsum or {})
    if rank is None and not cumsum and total is None:
        return df
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    d = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # One evaluation of the nondeterministic id, THEN pure arithmetic
    # on the materialized column (two independent instances in one
    # projection each keep their own counter — don't risk the sync).
    d = d.select("*", F.monotonically_increasing_id().alias("_pp_mid"))
    d = d.select(
        "*",
        (F.col("_pp_mid").bitwiseAND(_MID_BASE - 1) + 1).alias(_LRANK),
        F.shiftright(F.col("_pp_mid"), 33).alias(_PID),
    ).drop("_pp_mid")
    local_cols: list[str] = []
    if cumsum:
        w = (
            Window.partitionBy(_PID)
            .orderBy(_LRANK)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        lsum = [
            F.sum(src).over(w).alias(f"_pp_lc_{out}")
            for out, src in cumsum.items()
        ]
        d = d.select("*", *lsum)
        local_cols = [f"_pp_lc_{out}" for out in cumsum]
    d = d.persist(StorageLevel.MEMORY_AND_DISK)

    # Per-partition totals: ≤ n_parts rows by construction. The
    # exclusive-prefix window over it orders by _pp_pid — the single
    # allowed unpartitioned window (bounded input).
    aggs = [F.count(F.lit(1)).alias("_pp_cnt")] + [
        F.sum(src).alias(f"_pp_t_{out}") for out, src in cumsum.items()
    ]
    totals = d.groupBy(_PID).agg(*aggs)
    woff = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        F.coalesce(F.sum("_pp_cnt").over(woff), F.lit(0)).alias("_pp_off_cnt")
    ] + [
        F.coalesce(F.sum(f"_pp_t_{out}").over(woff), F.lit(0)).alias(
            f"_pp_off_{out}"
        )
        for out in cumsum
    ]
    offsets = totals.select(_PID, *off_cols)
    if total is not None:
        grand = totals.agg(
            F.sum("_pp_cnt").cast("long").alias("_pp_total")
        )
        offsets = offsets.crossJoin(F.broadcast(grand))

    out = d.join(F.broadcast(offsets), _PID)
    proj: list[Column] = [F.col(c) for c in df.columns]
    if rank is not None:
        proj.append(
            (F.col("_pp_off_cnt") + F.col(_LRANK)).cast("long").alias(rank)
        )
    for out_col in cumsum:
        proj.append(
            (F.col(f"_pp_off_{out_col}") + F.col(f"_pp_lc_{out_col}")).alias(
                out_col
            )
        )
    if total is not None:
        proj.append(F.col("_pp_total").alias(total))
    return out.select(*proj)


def ntile_from_rank(rank: str, total: str, k: int) -> Column:
    """SQL ``NTILE(k) OVER (ORDER BY ...)`` computed from a global
    rank + total count — pure integer arithmetic, no window: the first
    ``total % k`` buckets take ``total div k + 1`` rows, the rest
    ``total div k`` (the ANSI NTILE distribution). When ``total < k``
    the ELSE divisor ``total div k`` is 0 and Spark's ``div 0`` yields
    NULL silently — so that case is handled explicitly: ANSI NTILE on
    a short input gives row *i* bucket *i*, which is exactly ``rank``
    (every row is then in the ``rank <= (q+1)*r`` branch with q=0, but
    the guard keeps the short-input semantics from depending on that
    coincidence and makes the division-by-zero path unreachable)."""
    q = f"({total} div {k})"
    r = f"({total} % {k})"
    return F.expr(
        f"CASE WHEN {total} < {k} THEN {rank} "
        f"WHEN {rank} <= ({q} + 1) * {r} "
        f"THEN ({rank} - 1) div ({q} + 1) + 1 "
        f"ELSE {r} + ({rank} - ({q} + 1) * {r} - 1) div {q} + 1 END"
    )
