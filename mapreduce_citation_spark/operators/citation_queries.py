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


#: One staged edge-list text file per source realpath per process.
_EDGE_STAGE: dict[str, str] = {}


def _staged_edge_file(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    key = os.path.realpath(os.path.join(sf_dir, "orders.parquet"))
    if key not in _EDGE_STAGE:
        d = tempfile.mkdtemp(prefix="edgelist_")
        from pyspark.sql import functions as F

        (
            load_table(spark, sf_dir, "orders")
            .select(
                F.concat_ws(
                    "\t",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(d)
        )
        _EDGE_STAGE[key] = d
    return _EDGE_STAGE[key]


@register(
    "citation_counts_datasource",
    oracle=_EDGES_CTE
    + """
SELECT to_paper AS paper_id, COUNT(*) AS citations
FROM edges GROUP BY to_paper
""",
    tags=("citation", "datasource", "connector", "range-partitioning"),
)
def citation_counts_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship citation count THROUGH the custom ``edgelist``
    Python DataSource (``sources/edgelist_datasource.py``): the
    orders-derived edge list is staged as the reference's text
    format, then read back via the connector — whose plan-time BYTE
    RANGE partitioning is the explicit form of SURVEY op #5 (the
    reference master's hand-scheduled mapper ranges) — and
    aggregated. Same oracle as ``citation_counts``: the connector
    must be invisible in the result (no line lost or duplicated at
    any range boundary)."""
    from ..sources.edgelist_datasource import register_edgelist_source

    register_edgelist_source(spark)
    path = _staged_edge_file(spark, sf_dir)
    edges = (
        spark.read.format("edgelist")
        .option("path", path)
        .option("splits", "8")
        .load()
    )
    from pyspark.sql import functions as F

    return edges.groupBy(F.col("to_paper").alias("paper_id")).agg(
        F.count(F.lit(1)).alias("citations")
    )


@register(
    "citation_counts_roundtrip_sink",
    oracle=_EDGES_CTE
    + """
SELECT to_paper AS paper_id, COUNT(*) AS citations
FROM edges GROUP BY to_paper
""",
    tags=("citation", "datasource", "connector", "custom-sink"),
)
def citation_counts_roundtrip_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full custom-connector ROUND TRIP: edges written through the
    ``edgelist`` WRITER (two-phase task-temp → driver-rename commit,
    ``sources/edgelist_datasource.py:EdgeListWriter``), read back
    through the byte-range READER, aggregated — the whole
    source-and-sink surface of the connector must be invisible in
    the result (same oracle as ``citation_counts``)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..citations import edges_from_orders
    from ..sources.edgelist_datasource import register_edgelist_source

    register_edgelist_source(spark)
    out = os.path.join(tempfile.mkdtemp(prefix="edges_sink_"), "edges")
    edges = edges_from_orders(load_table(spark, sf_dir, "orders"))
    edges.write.format("edgelist").option("path", out).mode("append").save()
    back = (
        spark.read.format("edgelist")
        .option("path", out)
        .option("splits", "4")
        .load()
    )
    return back.groupBy(F.col("to_paper").alias("paper_id")).agg(
        F.count(F.lit(1)).alias("citations")
    )
