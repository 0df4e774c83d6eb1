"""100× scaling curve for the iterative graph family (r8 verdict,
next-round #3) — the one family that had only sf1 (×10) decade
evidence while every dedup/ANN/text family carries a K-linearity-
asserted 100× corpus curve.

Expansion (tools/gen_corpus.py style, applied to the citation edge
list): replica r offsets every node id by r·10^7 (far above sf0.1's
max id ~600k), so replicas are DISJOINT subgraphs, each structurally
identical to the base. That yields built-in falsifiers the run
asserts before timing anything:

- node count (pagerank output rows) must be exactly K-linear;
- component count AND labeled-node count must be exactly K-linear
  (disjoint identical replicas: every base component appears K times);
- min-label propagation converges in the SAME number of iterations at
  every K (replica structure is identical), so per-decade time ratios
  measure per-iteration cost per edge, not extra iterations.

Measured per point (1×/10×/100× edges from parquet, house
methodology 1 warmup + 3 timed, median, clearCache between):
``pagerank_fixed_point`` (6 iterations, the scale-mode BIGINT
arithmetic benched as citation_pagerank_scale) and
``connected_components`` (the citation_components core). Flat
per-edge-per-iteration cost = per-decade ratio ≈ 10.

Usage: python tools/scaling_graph.py [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

BASE = "/root/testdata/sf0.1"
NODE_STRIDE = 10_000_000


def main(args: list[str]) -> int:
    json_path = None
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from pyspark.sql import functions as F

    from bench import _calibrate

    from mapreduce_citation_spark.operators.graph import (
        connected_components,
        edges_from_lineitem,
        pagerank_fixed_point,
    )
    from mapreduce_citation_spark.session import get_spark
    from mapreduce_citation_spark.sources.readers import load_table

    spark = get_spark("scaling-graph")
    spark.sparkContext.setLogLevel("ERROR")

    # stage expanded edge lists once (benchdata/, reused across runs)
    base_edges = edges_from_lineitem(load_table(spark, BASE, "lineitem"))
    points = []
    for k in (1, 10, 100):
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
        points.append((out, k))

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    report: dict = {"cal": _calibrate(), "node_stride": NODE_STRIDE,
                    "pagerank_iterations": 6, "points": []}
    base_facts: dict | None = None
    for out, k in points:
        spark.catalog.clearCache()
        edges = spark.read.parquet(out)
        n_edges = edges.count()

        # --- falsifiers first (untimed): K-linearity of the outputs
        ranks = pagerank_fixed_point(edges, iterations=6)
        n_nodes = ranks.count()
        labels = connected_components(edges)
        n_labeled = labels.count()
        n_components = labels.select("component").distinct().count()
        facts = {"edges": n_edges, "nodes": n_nodes,
                 "labeled": n_labeled, "components": n_components}
        if k == 1:
            base_facts = facts
        else:
            for key, v in facts.items():
                assert v == base_facts[key] * k, (
                    f"{key} not K-linear at {k}x: {v} vs "
                    f"{base_facts[key]}*{k} — construction leaked"
                )

        # --- timed runs
        timings: dict[str, float] = {}
        for name, fn in (
            ("pagerank_fixed_point_6it",
             lambda: pagerank_fixed_point(edges, iterations=6)),
            ("connected_components",
             lambda: connected_components(edges)),
        ):
            runs = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                drain(fn())
                runs.append(time.perf_counter() - t0)
            timings[name] = round(sorted(runs)[1], 3)
        report["points"].append({"k": k, **facts, **timings})
        print(f"  x{k}: {facts}, {timings}", file=sys.stderr)

    report["ratios"] = [
        {"k_x": round(hi["k"] / lo["k"], 1),
         **{m: round(hi[m] / lo[m], 2)
            for m in ("pagerank_fixed_point_6it", "connected_components")}}
        for lo, hi in zip(report["points"], report["points"][1:])
    ]
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
