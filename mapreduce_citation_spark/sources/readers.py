"""Sources: edge-list text readers + fixture-table loaders.

The reference's only source is a line-delimited tab-separated edge
list with ``#`` comment lines, blank lines, and malformed rows that
are dropped rather than fatal (reference: worker/mapper/mapper.py:74-80,
master/master.py:96-106, check.py:15-25). Here that whole pipeline is a
declarative scan: Spark plans FileScan → Filter → Project with
whole-stage codegen, splits the file by byte ranges (no driver-resident
partitioning pass like master/master.py:91-127), and pushes the
projection down.

Fixture tables are columnar parquet (TESTDATA.md); ``load_table``
is the one place scan options live.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: Schema of the citation edge list: "from_paper cites to_paper".
#: IDs stay strings end-to-end — lexicographic tie-break ordering is
#: semantic (reference: master/master.py:218 sorts the string id).
EDGE_SCHEMA = StructType(
    [
        StructField("from_paper", StringType(), nullable=False),
        StructField("to_paper", StringType(), nullable=False),
    ]
)

#: Fixture tables available at each scale-factor dir (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_edges_text(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    comment: str = "#",
    malformed: str = "drop",
) -> DataFrame:
    """Read a citation edge list from line-delimited text.

    Implements SURVEY.md §2 ops #1–4 declaratively:

    #1 text scan, #2 comment/blank filter, #3 split-parse into
    (from_paper, to_paper), #4 malformed-row policy. ``malformed``:

    - ``"drop"`` (reference behavior, mapper.py:74-80): rows that do
      not split into exactly two non-empty fields are silently dropped.
    - ``"fail"``: raise on first malformed row (strict-ETL mode).
    - ``"keep"``: malformed rows surface with NULL fields so callers
      can count/quarantine them (dead-letter pattern).

    Everything stays JVM-side: trim/startswith/split are codegen'd
    built-ins, so this scan pipelines scan→filter→project in one
    whole-stage-codegen span.
    """
    raw = spark.read.text(path)
    line = F.trim(F.col("value"))
    data = raw.filter((line != F.lit("")) & (~line.startswith(comment)))
    parts = F.split(line, sep, -1)
    parsed = data.select(
        parts.getItem(0).alias("from_paper"),
        F.when(F.size(parts) == 2, parts.getItem(1)).alias("to_paper"),
        F.size(parts).alias("_nfields"),
    )
    ok = (
        (F.col("_nfields") == 2)
        & (F.col("from_paper") != "")
        & (F.col("to_paper") != "")
    )
    if malformed == "drop":
        out = parsed.filter(ok)
    elif malformed == "fail":
        out = parsed.withColumn(
            "from_paper",
            F.when(ok, F.col("from_paper")).otherwise(
                F.raise_error(F.concat(F.lit("malformed edge row: "), F.col("from_paper")))
            ),
        )
    elif malformed == "keep":
        out = parsed.withColumn(
            "from_paper", F.when(ok, F.col("from_paper"))
        ).withColumn("to_paper", F.when(ok, F.col("to_paper")))
    else:
        raise ValueError(f"malformed policy must be drop|fail|keep, got {malformed!r}")
    return out.select("from_paper", "to_paper")


def read_edges_csv(
    spark: SparkSession, path: str, sep: str = "\t", comment: str = "#"
) -> DataFrame:
    """Schema'd CSV variant of the edge scan (DROPMALFORMED).

    Same result as ``read_edges_text(..., malformed='drop')`` for
    well-formed files, but lets the CSV datasource handle comments and
    malformed rows natively — the idiomatic production path.
    """
    return (
        spark.read.schema(EDGE_SCHEMA)
        .options(sep=sep, comment=comment, mode="DROPMALFORMED")
        .csv(path)
        .filter(F.col("from_paper").isNotNull() & F.col("to_paper").isNotNull())
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (columnar parquet scan with pushdown).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    cannot read natively (PARQUET_TYPE_ILLEGAL); read it as bigint
    nanos under ``legacy.parquet.nanosAsLong`` and convert to a
    microsecond timestamp by truncation — the same ns→us conversion
    DuckDB applies, so oracle comparisons agree.

    The configs are set here, at the single table-loading choke point,
    because the driver hands queries an arbitrary SparkSession — the
    engine cannot assume its own session factory built it. Both confs
    are runtime-settable; UTC pins the instant→NTZ cast so the wall
    clock matches DuckDB's naive timestamps on any host timezone.

    PUBLIC-API SIDE EFFECT: loading ``events`` mutates the session
    (``session.timeZone=UTC``, ``legacy.parquet.nanosAsLong=true``)
    and deliberately does NOT restore the previous values — Spark
    reads these confs lazily at *execution* time, so restoring them
    after this call would silently mis-execute the still-lazy
    DataFrame returned here. Callers who need a different session
    timezone for unrelated queries should use a separate session (or
    re-set the conf after collecting the events results).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV, not /: float division loses precision above 2^53
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several fixture tables at once; defaults to all of them."""
    use = names or FIXTURE_TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
