"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Thin view over ``mapreduce_citation_spark.registry`` — every operator
module registers its Spark callable + DuckDB oracle there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_citation_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's ranked top-30 most-cited query
    (SURVEY.md §2 ops #1-15) over the sf0.001 fixtures."""
    from mapreduce_citation_spark.operators.citation_queries import top_cited

    return top_cited(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return registry.oracle_sql()
