"""Citation-graph analytics beyond in-degree — the natural extensions
of the reference's domain (SURVEY.md: the reference computes only
op #11's citation counts).

Graph here: the lineitem-derived bipartite citation graph — each order
"cites" the parts it contains (richer than the orders→customer edge
list used for the flagship query: one citer cites many papers, so
co-citation is non-trivial).

- co-citation: papers cited together by the same citer (the classic
  similarity signal for cited papers).
- bibliographic coupling: citers sharing cited papers.
- PageRank: DataFrame-iterative power method — each iteration is one
  join + one aggregation, both shuffling on node id; lineage stays
  linear in iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

_EDGES_CTE = """
WITH edges AS (
  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS from_paper,
                  CAST(l_partkey AS VARCHAR) AS to_paper
  FROM lineitem
)
"""


def edges_from_lineitem(li: DataFrame) -> DataFrame:
    """Bipartite citation edges: order cites part (distinct pairs —
    a line-item repeat is not a second citation)."""
    return li.select(
        F.col("l_orderkey").cast("string").alias("from_paper"),
        F.col("l_partkey").cast("string").alias("to_paper"),
    ).distinct()


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialized: every caller self-joins or iterates over the edge
    # list, and the distinct-pairs derivation (a lineitem scan + a
    # shuffle) must not replay once per join side / per iteration
    return edges_from_lineitem(
        load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()


@register(
    "citation_cocitation",
    oracle=_EDGES_CTE
    + """
SELECT a.to_paper AS paper_a, b.to_paper AS paper_b, COUNT(*) AS n_cociting
FROM edges a JOIN edges b
  ON a.from_paper = b.from_paper AND a.to_paper < b.to_paper
GROUP BY a.to_paper, b.to_paper
ORDER BY n_cociting DESC, paper_a ASC, paper_b ASC
LIMIT 20
""",
    tags=("graph", "citation", "cocitation"),
)
def citation_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-cited paper pairs: self-join on the citer, count
    co-occurrences — pairs materialize per-citer (bounded by the max
    citation list length), never globally."""
    e = _edges(spark, sf_dir)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.from_paper") == F.col("b.from_paper"))
               & (F.col("a.to_paper") < F.col("b.to_paper")))
        .groupBy(
            F.col("a.to_paper").alias("paper_a"),
            F.col("b.to_paper").alias("paper_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_cociting"))
        .orderBy(
            F.col("n_cociting").desc(), F.col("paper_a").asc(), F.col("paper_b").asc()
        )
        .limit(20)
    )


@register(
    "citation_coupling",
    oracle=_EDGES_CTE
    + """
SELECT a.from_paper AS citer_a, b.from_paper AS citer_b, COUNT(*) AS n_shared
FROM edges a JOIN edges b
  ON a.to_paper = b.to_paper AND a.from_paper < b.from_paper
GROUP BY a.from_paper, b.from_paper
HAVING COUNT(*) >= 3
ORDER BY n_shared DESC, citer_a ASC, citer_b ASC
LIMIT 20
""",
    tags=("graph", "citation", "coupling"),
)
def citation_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bibliographically-coupled citer pairs (≥3 shared
    references): self-join on the cited paper."""
    e = _edges(spark, sf_dir)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.to_paper") == F.col("b.to_paper"))
               & (F.col("a.from_paper") < F.col("b.from_paper")))
        .groupBy(
            F.col("a.from_paper").alias("citer_a"),
            F.col("b.from_paper").alias("citer_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .orderBy(F.col("n_shared").desc(), F.col("citer_a").asc(), F.col("citer_b").asc())
        .limit(20)
    )


def pagerank(
    edges: DataFrame, iterations: int = 8, damping: float = 0.85
) -> DataFrame:
    """DataFrame-iterative PageRank (power method).

    Per iteration: contributions = edges ⋈ ranks (shuffle on
    from/node), then sum per target (shuffle on to). Dangling mass
    (nodes with no out-edges — every 'part' in the bipartite graph)
    is redistributed uniformly so total rank stays 1. Returns
    (node, rank). Deterministic up to float summation order (the
    pytest oracle replays the same algorithm in pure python and
    compares to 1e-9)."""
    # materialize the loop-invariant relations once, and break lineage
    # every iteration (localCheckpoint) — otherwise iteration k re-runs
    # iterations 1..k-1 and the job is O(k²) in shuffles. (The edges
    # input arrives materialized from _edges; callers passing a lazy
    # DataFrame should localCheckpoint it first.)
    nodes = (
        edges.select(F.col("from_paper").alias("node"))
        .union(edges.select("to_paper"))
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.count()
    out_deg = edges.groupBy(F.col("from_paper").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    ).localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n_total).alias("rank"))
    for _ in range(iterations):
        with_deg = ranks.join(out_deg, "node", "left")
        # Dangling mass as a LAZY 1-row aggregate folded in via a
        # broadcast crossJoin (the q22 lazy-scalar pattern,
        # relational.py) — no driver-side collect per iteration: the
        # whole iteration is ONE job, and at 100 TB the dangling sum
        # rides the same pass instead of costing an extra full scan of
        # the ranks per iteration.
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        contribs = (
            edges.join(
                with_deg.filter(F.col("out_deg").isNotNull()),
                edges.from_paper == F.col("node"),
            )
            .select(
                F.col("to_paper").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_rank"))
        )
        # same association order as the python replay oracle:
        # (1-d)/n + (d * dangling) / n, then + d * in_rank
        base = F.lit((1.0 - damping) / n_total) + (
            F.lit(damping) * F.col("_dangling")
        ) / F.lit(float(n_total))
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return ranks


def connected_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components by min-label propagation to fixpoint.

    Each node starts labeled with itself; every iteration each node
    takes the min label among itself and its neighbors (edges treated
    undirected); stop when no label changes. Iterations are join+agg
    on node id; lineage broken per iteration (localCheckpoint); the
    fixpoint check is a cheap count on the changed set — the standard
    loop-until-converged pattern on DataFrames. Returns (node,
    component) where component is the smallest node label in the
    component."""
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


@register(
    "citation_components",
    tags=("graph", "components", "iterative", "rows-only"),
)
def citation_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component sizes of the bipartite citation graph
    (top-20 components). Rows-only (iterative); pytest replays with a
    union-find oracle."""
    labels = connected_components(_edges(spark, sf_dir))
    return (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.col("n_nodes").desc(), F.col("component").asc())
        .limit(20)
    )


@register(
    "citation_pagerank",
    tags=("graph", "citation", "pagerank", "iterative", "rows-only"),
)
def citation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 papers by PageRank on the bipartite citation graph
    (6 iterations). Rows-only for the driver (iterative, not SQL);
    the pytest oracle replays the identical algorithm in python."""
    ranks = pagerank(_edges(spark, sf_dir), iterations=6)
    return ranks.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(20)
