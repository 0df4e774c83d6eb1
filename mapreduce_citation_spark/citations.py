"""Citation analytics — the reference's entire observable query surface.

The reference computes one pipeline (SURVEY.md §2): count citations per
cited paper from a tab-separated edge list, rank the top-30 by count
descending with paper-id-ascending tie-break, and write a fixed-width
text report (reference: master/master.py:193-226). Its hand-rolled
engine — driver-resident range partitioning (master.py:91-127), md5
hash shuffle (mapper.py:37-40), map-side combine (mapper.py:70-78),
k-way heap merge + sort aggregation (reducer.py:66-108), master-side
re-aggregation (master.py:196-204) — is all replaced by the Catalyst
plan for ``groupBy().count().orderBy(...).limit(k)``:

    FileScan → HashAggregate(partial) → Exchange(hashpartitioning)
    → HashAggregate(final) → TakeOrderedAndProject

which is map-side combine, hash shuffle, final merge, and a true
top-k (no global sort materialization) — by construction, at any
partition count.

Determinism spec (SURVEY.md §5): order is ``(-citations, paper_id
asc)`` with paper_id compared lexicographically as a string — the
master's behavior (master.py:218), not check.py's tie-unstable sort
(check.py:28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.readers import read_edges_text

TOP_K = 30  # reference: master/master.py:218 slices [:30]


class CitationAnalytics:
    """Public engine API around a citation edge DataFrame.

    ``edges`` must have string columns ``from_paper``, ``to_paper``
    ("from cites to"). Duplicate edges count — the reference counts
    occurrences, not distinct citers (mapper.py:78).
    """

    def __init__(self, edges: DataFrame):
        for c in ("from_paper", "to_paper"):
            if c not in edges.columns:
                raise ValueError(f"edges missing column {c!r}; has {edges.columns}")
        self.edges = edges

    # -- sources ------------------------------------------------------
    @classmethod
    def from_text(
        cls, spark: SparkSession, path: str, malformed: str = "drop"
    ) -> "CitationAnalytics":
        """Load from the reference's native format (ops #1–4)."""
        return cls(read_edges_text(spark, path, malformed=malformed))

    # -- queries ------------------------------------------------------
    def citation_counts(self) -> DataFrame:
        """In-degree per cited paper (ops #5–12, all engine-automatic).

        One row per distinct ``to_paper``; ``citations`` is a count of
        edge occurrences. Partial aggregation before the shuffle is
        planned by Catalyst (the reference hand-codes it at
        mapper.py:70-78).
        """
        return (
            self.edges.groupBy(F.col("to_paper").alias("paper_id"))
            .agg(F.count(F.lit(1)).alias("citations"))
        )

    def top_cited(self, k: int = TOP_K) -> DataFrame:
        """Ranked top-k most-cited (ops #13–15).

        ``orderBy(...).limit(k)`` plans TakeOrderedAndProject: each
        partition keeps only its local top-k, the driver merges k×P
        rows — no global sort. Rank is assigned after the take, over
        ≤k rows, so the unpartitioned window is trivially safe.
        """
        topk = (
            self.citation_counts()
            .orderBy(F.col("citations").desc(), F.col("paper_id").asc())
            .limit(k)
        )
        w = Window.orderBy(F.col("citations").desc(), F.col("paper_id").asc())
        return topk.withColumn("rank", F.row_number().over(w)).select(
            "rank", "paper_id", "citations"
        )

    def citing_papers(self) -> DataFrame:
        """Per-paper citing list (op #17, check.py:11's oracle model).

        Returns ``paper_id``, sorted ``citing`` array, ``n_citing``
        (distinct citers). ``sort_array`` makes the collected list
        deterministic — collect order under parallel merge is not.
        """
        return self.edges.groupBy(F.col("to_paper").alias("paper_id")).agg(
            F.sort_array(F.collect_set("from_paper")).alias("citing"),
            F.count_distinct("from_paper").alias("n_citing"),
        )

    # -- report sink (op #16) ----------------------------------------
    def format_report(self, k: int = TOP_K, timestamp: str | None = None) -> str:
        """Fixed-width text report, layout-identical to the reference
        (master/master.py:208-224): 50×'=' rules, title, Rank/Paper
        ID/Citations columns, thousands separators, 31×'-' rules,
        'Generated on:' footer.

        Only the ≤k result rows are collected; everything upstream ran
        distributed. ``timestamp`` is injectable for golden-file tests.
        """
        import time as _time

        rows = self.top_cited(k).collect()
        out = []
        out.append("=" * 50)
        out.append(f"Top {k} Most Cited Papers")
        out.append("=" * 50)
        out.append("")
        out.append(f"{'Rank':<6}{'Paper ID':<15}{'Citations':>10}")
        out.append("-" * 31)
        for r in rows:
            out.append(f"{r['rank']:<6}{r['paper_id']:<15}{r['citations']:>10,}")
        out.append("")
        out.append("-" * 31)
        ts = timestamp or _time.strftime("%Y-%m-%d %H:%M:%S")
        out.append(f"Generated on: {ts}")
        return "\n".join(out) + "\n"

    def write_report(self, path: str, k: int = TOP_K) -> None:
        with open(path, "w") as f:
            f.write(self.format_report(k))


def edges_from_orders(orders: DataFrame) -> DataFrame:
    """Derive a citation-shaped edge list from the ``orders`` fixture.

    The driver testdata has no citation table, so the flagship query
    runs the reference's exact semantics over an isomorphic graph:
    each order "cites" its customer (edge o_orderkey → o_custkey), so
    citation count == orders per customer. IDs are cast to string to
    preserve the reference's string-ID ordering semantics.
    """
    return orders.select(
        F.col("o_orderkey").cast("string").alias("from_paper"),
        F.col("o_custkey").cast("string").alias("to_paper"),
    )
