"""Round-count evidence for star-contraction components (r10): the
operator's 100 TB case is DIAMETER independence — O(log n) rounds
where min-label propagation pays O(diameter) — so the probe measures
exactly that axis, on path graphs (diameter = n − 1, the worst case
for label propagation and the best articulated contrast).

Per path size n ∈ {100, 1k, 10k, 100k} (zero-padded string ids so the
lexicographic order both engines use equals numeric order):

- star: wall time + ROUNDS to fixpoint (via the stats hook) + output
  asserted correct (every node labeled with the path minimum);
- min-label: run ONLY at n = 100 with max_iterations raised to cover
  the diameter — its round count IS the diameter (99 propagation
  rounds + the fixpoint-detection round), which is the point; at
  n ≥ 1k the label loop would need thousands of edge-join rounds and
  is reported as projected rounds, not run.

This is an attribution probe (single runs), not a drift tracker; the
citation-graph curve lives in SCALING_GRAPH_r10.json where min-label
wins on a small-diameter graph — the two artifacts together are the
trade's measured boundary.

Usage: python tools/probe_star_diameter.py [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (100, 1_000, 10_000, 100_000)
MINLABEL_SIZES = (100,)


def main(args: list[str]) -> int:
    json_path = None
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from bench import _calibrate

    from mapreduce_citation_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("probe-star-diameter")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"cal": _calibrate(), "points": []}
    for n in SIZES:
        width = len(str(n))
        ids = [f"n{i:0{width}d}" for i in range(n)]
        edges = spark.createDataFrame(
            [(ids[i], ids[i + 1]) for i in range(n - 1)],
            ["from_paper", "to_paper"],
        )
        spark.catalog.clearCache()
        stats: dict = {}
        t0 = time.perf_counter()
        labels = connected_components_star(edges, max_rounds=40, stats=stats)
        rows = labels.collect()
        star_sec = round(time.perf_counter() - t0, 3)
        assert len(rows) == n and all(
            r["component"] == ids[0] for r in rows
        ), f"star labeling wrong at n={n}"
        point = {
            "n": n,
            "diameter": n - 1,
            "star_sec": star_sec,
            "star_rounds": stats["rounds"],
        }
        if n in MINLABEL_SIZES:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            got = {
                r["node"]: r["component"]
                for r in connected_components(
                    edges, max_iterations=n + 1
                ).collect()
            }
            point["minlabel_sec"] = round(time.perf_counter() - t0, 3)
            point["minlabel_rounds"] = n - 1 + 1  # diameter + detection
            assert got == {v: ids[0] for v in ids}
        else:
            point["minlabel_rounds_projected"] = n - 1 + 1
        report["points"].append(point)
        print(f"  n={n}: {point}", file=sys.stderr)

    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
