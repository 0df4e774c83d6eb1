"""Day-one 100× curve for the random-walk family (r10 extension),
on the same staged disjoint-replica graphs as tools/scaling_graph.py.

Falsifiers before timing (disjoint identical replicas):
- walk rows (one per node) must be exactly K-linear;
- every walk must stay inside its start node's replica (node ids of
  replica r live in [r·stride, (r+1)·stride) — a cross-replica hop
  would mean the expansion leaked or the adjacency probe matched a
  foreign row).

Timed: ``citation_random_walks``'s core (4 hash-picked hops over the
rank-indexed adjacency), house methodology (1 warmup + 3 timed,
median, clearCache between, noop drain).

Usage: python tools/scaling_walks.py [--json PATH]
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
        WALK_LEN,
        edges_from_lineitem,
    )
    from mapreduce_citation_spark.session import get_spark
    from mapreduce_citation_spark.sources.readers import load_table

    spark = get_spark("scaling-walks")
    spark.sparkContext.setLogLevel("ERROR")

    # stage expanded edge lists (same files scaling_graph.py uses)
    base_edges = edges_from_lineitem(load_table(spark, BASE, "lineitem"))
    staged = []
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
        staged.append((k, out))

    from mapreduce_citation_spark.operators.graph import random_walks

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    report: dict = {"cal": _calibrate(), "node_stride": NODE_STRIDE,
                    "walk_len": WALK_LEN, "points": []}
    base_rows = None
    for k, out in staged:
        spark.catalog.clearCache()
        edges = spark.read.parquet(out)

        # --- falsifiers (untimed)
        walks = random_walks(edges)
        n_rows = walks.count()
        # replica containment: every hop stays in the start's replica
        crossers = walks.filter(
            " OR ".join(
                f"CAST(v{j} AS BIGINT) div {NODE_STRIDE} != "
                f"CAST(start AS BIGINT) div {NODE_STRIDE}"
                for j in range(1, WALK_LEN + 1)
            )
        ).count()
        assert crossers == 0, f"x{k}: {crossers} walks crossed replicas"
        if k == 1:
            base_rows = n_rows
        else:
            assert n_rows == base_rows * k, (
                f"x{k}: walk rows {n_rows} != {base_rows}*{k}"
            )

        timings = {}
        for name, fn in (
            ("random_walks", lambda: random_walks(edges)),
        ):
            # untimed noop-drain warmup (r10 ADVICE): the falsifier pass
            # above drains via count(), which Catalyst prunes — it does
            # not prime the full plan's codegen, so without this the
            # first timed run could be cold and skew a median-of-3
            spark.catalog.clearCache()
            drain(fn())
            runs = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                drain(fn())
                runs.append(time.perf_counter() - t0)
            timings[name] = round(sorted(runs)[1], 3)
        report["points"].append(
            {"k": k, "edges": edges.count(), "walk_rows": n_rows, **timings}
        )
        print(f"  x{k}: rows={n_rows}, {timings}", file=sys.stderr)

    report["ratios"] = [
        {"k_x": round(hi["k"] / lo["k"], 1),
         "random_walks": round(hi["random_walks"] / lo["random_walks"], 2)}
        for lo, hi in zip(report["points"], report["points"][1:])
    ]
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
