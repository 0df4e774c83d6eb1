"""Sinks: parquet (partitioned/bucketed-style), CSV, JSON writers.

The reference's only sinks are shuffle CSV files and the formatted
report (SURVEY.md §2 ops #8, #16). The engine's real sinks are
columnar and partition-aware:

- ``write_parquet``: the default — columnar, predicate-pushdown-able
  on read, optionally hive-partitioned by low-cardinality columns so
  downstream scans prune whole directories.
- ``write_csv`` / ``write_json``: interchange formats (schema-on-read;
  keep a schema alongside — these readers re-apply it).

All writers ``coalesce`` only when asked: at 100 TB you want one file
per task, not a driver-side funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """Schema'd CSV read — never inferSchema in a pipeline (extra pass
    + nondeterministic types)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format Spark ships
    natively (Hive-ecosystem consumers); same pushdown/pruning story
    as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
