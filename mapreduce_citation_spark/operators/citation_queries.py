"""Registry entries for the reference's query surface (SURVEY.md §2).

The driver fixtures have no citation table, so these run the
reference's exact semantics over an isomorphic edge list derived from
``orders``: each order cites its customer (see
``citations.edges_from_orders``). The oracle SQL derives the same
edges, so the correctness gate checks the full operator chain:
scan → project/cast → groupBy count → order → limit → rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..citations import CitationAnalytics, edges_from_orders
from ..registry import register
from ..sources.readers import load_table

#: Shared oracle CTE: the orders-derived citation edge list.
_EDGES_CTE = """
WITH edges AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS from_paper,
         CAST(o_custkey  AS VARCHAR) AS to_paper
  FROM orders
)
"""


def _analytics(spark: SparkSession, sf_dir: str) -> CitationAnalytics:
    return CitationAnalytics(edges_from_orders(load_table(spark, sf_dir, "orders")))


@register(
    "citation_counts",
    oracle=_EDGES_CTE
    + """
SELECT to_paper AS paper_id, COUNT(*) AS citations
FROM edges GROUP BY to_paper
""",
    bench=True,
    tags=("citation", "aggregate"),
)
def citation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree per cited paper — ops #5-12 (reference mapper.py:70-78,
    reducer.py:66-108, master.py:196-204, all Catalyst-automatic here)."""
    return _analytics(spark, sf_dir).citation_counts()


@register(
    "top_cited",
    oracle=_EDGES_CTE
    + """
, counts AS (
  SELECT to_paper AS paper_id, COUNT(*) AS citations
  FROM edges GROUP BY to_paper
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY citations DESC, paper_id ASC) AS INT) AS rank,
       paper_id, citations
FROM counts
ORDER BY citations DESC, paper_id ASC
LIMIT 30
""",
    bench=True,
    tags=("citation", "topk", "rank"),
)
def top_cited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked top-30 most cited — ops #13-15 (master.py:217-219).
    Deterministic tie-break: citations desc, paper_id (string) asc."""
    return _analytics(spark, sf_dir).top_cited(30)


@register(
    "citing_papers",
    oracle=_EDGES_CTE
    + """
SELECT to_paper AS paper_id,
       COUNT(DISTINCT from_paper) AS n_citing
FROM edges GROUP BY to_paper
""",
    tags=("citation", "aggregate", "distinct"),
)
def citing_papers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-citer counts — op #17, the check.py:11 oracle model.
    (The collect_list variant is covered in pytest; arrays are kept out
    of the hash-compare.)"""
    return _analytics(spark, sf_dir).citing_papers().select("paper_id", "n_citing")
