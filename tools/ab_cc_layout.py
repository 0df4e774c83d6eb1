"""Same-session interleaved A/B: legacy vs loop-invariant edge layout
for ``connected_components`` (the r9 verdict's one `weak`, fixed in
r10 commit 0804998).

Why this tool exists: the r10 fix's clearing evidence so far is
SCALING_GRAPH_r09 vs SCALING_GRAPH_r10 — a CROSS-WINDOW comparison,
exactly the evidence class the house rules forbid for perf
conclusions (this VM's effective CPU drifted 6.3 → 2.2 cal cores
between those runs, and each run's own per-decade ratios are visibly
drift-contaminated: pagerank — whose code did not change — shows
decades 8.43x/1.47x in r9 and 1.48x/7.31x in r10). The within-run
CC/pagerank normalization in NOTES_r10 is drift-robust but indirect.
This is the direct measurement: both CC variants interleaved in ONE
session on the SAME staged graphs.

A = legacy (pre-0804998, reconstructed verbatim from
    `git show 0804998~1:.../graph.py`): undirected edge list
    ``localCheckpoint()``ed — an ExistingRDD scan with NO
    outputPartitioning, rows pinned deserialized — so every min-label
    iteration plans a full Exchange of the corpus-sized edge table;
    plus the old fixpoint check (a second old-labels×new-labels join
    per iteration).
B = current ``connected_components``: edge list
    repartition(b)+sortWithinPartitions+persist(MEMORY_AND_DISK)
    (iterations exchange/sort only the node-sized label table) and
    the inline monotone changed-flag (no fixpoint join).

Method: per graph scale (1x and 10x replicas of the sf0.1 citation
graph, staged by tools/scaling_graph.py), 1 untimed warmup of each
variant, then 10 alternating cold runs (5 per side — the documented
house A/B standard; the committed AB_CC_LAYOUT_r10.json predates this
and used 3 per side, a deviation the r10 ADVICE flagged), clearCache
before each, noop-sink drain. Outputs asserted identical across ALL
runs via an order-independent digest (count + sum of per-row
xxhash64 over (node, component)) — set-level, the r9 ADVICE standard.

Usage: python tools/ab_cc_layout.py [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

BASE = "/root/testdata/sf0.1"
NODE_STRIDE = 10_000_000  # tools/scaling_graph.py staging convention


def _legacy_connected_components(edges, max_iterations: int = 20):
    """Pre-r10 connected_components, verbatim from
    ``git show 0804998~1:mapreduce_citation_spark/operators/graph.py``
    (localCheckpoint'd edge list + old-vs-new fixpoint join)."""
    from pyspark.sql import functions as F

    und = (
        edges.select(F.col("from_paper").alias("a"), F.col("to_paper").alias("b"))
        .union(edges.select(F.col("to_paper"), F.col("from_paper")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels, und.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def main(args: list[str]) -> int:
    json_path = None
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from pyspark.sql import functions as F

    from bench import _calibrate

    from mapreduce_citation_spark.operators.graph import (
        connected_components,
        edges_from_lineitem,
    )
    from mapreduce_citation_spark.session import get_spark
    from mapreduce_citation_spark.sources.readers import load_table

    spark = get_spark("ab-cc-layout")
    spark.sparkContext.setLogLevel("ERROR")

    # stage expanded edge lists (same files scaling_graph.py uses)
    base_edges = edges_from_lineitem(load_table(spark, BASE, "lineitem"))
    staged = []
    for k in (1, 10):
        out = f"benchdata/edges_x{k}/edges.parquet"
        if not os.path.exists(out):
            rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("r")
            (
                base_edges.select("from_paper", "to_paper", rep)
                .select(
                    (F.col("from_paper").cast("long") + F.col("r") * NODE_STRIDE)
                    .cast("string")
                    .alias("from_paper"),
                    (F.col("to_paper").cast("long") + F.col("r") * NODE_STRIDE)
                    .cast("string")
                    .alias("to_paper"),
                )
                .write.mode("overwrite")
                .parquet(out + ".tmp")
            )
            os.rename(out + ".tmp", out)
        staged.append((k, out))

    def digest(df) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("node", "component").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    variants = {
        "legacy_localcheckpoint": _legacy_connected_components,
        "loop_invariant_layout": connected_components,
    }

    def one_run(fn, edges) -> tuple[float, tuple[int, int]]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        labels = fn(edges)
        labels.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        return sec, digest(labels)  # digest untimed-ish (post-drain agg)

    report: dict = {"cal_before": _calibrate(), "node_stride": NODE_STRIDE,
                    "points": {}}
    for k, out in staged:
        edges = spark.read.parquet(out)
        runs: dict[str, list[float]] = {m: [] for m in variants}
        digests: set[tuple[int, int]] = set()
        for mode, fn in variants.items():  # untimed warmup of each
            one_run(fn, edges)
        for i in range(10):
            mode = list(variants)[i % 2]
            sec, dg = one_run(variants[mode], edges)
            runs[mode].append(round(sec, 3))
            digests.add(dg)
            print(f"  x{k} {mode}: {sec:.2f}s (digest {dg})",
                  file=sys.stderr)
        assert len(digests) == 1, (
            f"x{k}: label sets differ across variants/runs: {digests}"
        )
        med = {m: sorted(v)[len(v) // 2] for m, v in runs.items()}
        report["points"][f"x{k}"] = {
            "edges": edges.count(),
            **{f"{m}_runs": v for m, v in runs.items()},
            **{f"{m}_median": med[m] for m in variants},
            "speedup_legacy_over_new": round(
                med["legacy_localcheckpoint"] / med["loop_invariant_layout"], 3
            ),
            "rows": next(iter(digests))[0],
        }
    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
