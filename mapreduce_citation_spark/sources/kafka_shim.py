"""Kafka-shaped streaming source.

The real connector (``spark-sql-kafka-0-10``) is not deployable in
this environment (no package installs), so this module provides the
same CONTRACT two ways:

- ``kafka_source_available(spark)`` probes for the real data source;
  when present, ``read_topic_stream`` uses it directly — downstream
  plans are written against kafka's exact output schema and run
  unchanged on a real cluster.
- Otherwise a file-backed emulation: ``write_topic`` lays out records
  as JSON files shaped exactly like kafka's consumer output —
  ``key``/``value`` as binary (base64 in the files, decoded by the
  JSON reader), ``topic``, ``partition``, ``offset``, ``timestamp``,
  ``timestampType`` — with kafka's semantics: records are assigned to
  a partition by KEY (all records of one key land in one partition,
  the ordering unit kafka actually guarantees) and offsets are
  monotonically increasing within each partition.

The emulation's partitioner is ``abs(hash_key) % n_partitions`` over
a deterministic integer key so tests and DuckDB oracles can replay
placement exactly (the real kafka default partitioner is murmur2 over
the key bytes — same shape, different hash; plans must not depend on
WHICH partition a key lands in, only on per-key co-location).

At 100 TB this file shim disappears and the same downstream plan
consumes a real cluster: maxOffsetsPerTrigger bounds micro-batches,
watermarks bound state, and the (partition, offset) pair is the
replayable position exactly as here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Kafka's consumer output schema, byte for byte what the real source
#: produces (spark-sql-kafka-0-10's fixed schema).
KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

_KAFKA_AVAILABLE: bool | None = None


def kafka_source_available(spark: SparkSession) -> bool:
    """True iff the real kafka data source is on the classpath."""
    global _KAFKA_AVAILABLE
    if _KAFKA_AVAILABLE is None:
        try:
            spark.readStream.format("kafka").option(
                "kafka.bootstrap.servers", "localhost:9092"
            ).option("subscribe", "__probe__").load()
            _KAFKA_AVAILABLE = True
        except Exception:
            _KAFKA_AVAILABLE = False
    return _KAFKA_AVAILABLE


def write_topic(
    records: DataFrame,
    topic_dir: str,
    topic: str,
    key_col: str,
    value_col: str,
    ts_col: str,
    n_partitions: int = 4,
) -> None:
    """Produce ``records`` into a file-backed topic (append).

    Kafka semantics replicated: partition = deterministic hash of the
    key (per-key co-location), offset = arrival order within the
    partition (here: ts, then key — deterministic on both engines so
    oracles can replay it). A second produce into an existing topic
    continues each partition's offsets from its current max (read
    back from the topic; the collect is bounded at ``n_partitions``
    rows), so the monotone-offset contract holds across produces.
    ``value_col`` must be a string column
    (serialize upstream, e.g. ``to_json``); it lands as UTF-8 bytes
    exactly like a kafka producer's serializer."""
    spark = records.sparkSession
    path = os.path.join(topic_dir, topic)
    base = F.lit(0).cast("long")
    if os.path.isdir(path):
        existing = (
            read_topic_batch(spark, topic_dir, topic)
            .groupBy("partition")
            .agg(F.max("offset").alias("_max_off"))
            .collect()
        )
        if existing:
            next_off = {r["partition"]: r["_max_off"] + 1 for r in existing}
            mapping = F.create_map(
                *[F.lit(x) for kv in next_off.items() for x in kv]
            )
            base = F.coalesce(
                mapping[F.col("partition")], F.lit(0)
            ).cast("long")
    shaped = (
        records.select(
            F.col(key_col).cast("string").alias("_k"),
            F.col(value_col).cast("string").alias("_v"),
            F.col(ts_col).cast("timestamp").alias("timestamp"),
        )
        .withColumn(
            "partition",
            F.pmod(F.abs(F.hash(F.col("_k"))), F.lit(n_partitions)).cast("int"),
        )
        .withColumn(
            "offset",
            F.row_number()
            .over(Window.partitionBy("partition").orderBy("timestamp", "_k"))
            .cast("long")
            - F.lit(1)
            + base,
        )
        .select(
            F.col("_k").cast("binary").alias("key"),
            F.col("_v").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            "partition",
            "offset",
            "timestamp",
            F.lit(0).alias("timestampType"),  # 0 = CreateTime
        )
    )
    shaped.write.mode("append").json(path)


def read_topic_stream(
    spark: SparkSession,
    topic_dir: str,
    topic: str,
    bootstrap_servers: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Consume a topic as a stream in kafka's output schema.

    Uses the real kafka source when it's on the classpath AND
    ``bootstrap_servers`` is given; otherwise streams the file-backed
    emulation (each produced file batch = one micro-batch candidate,
    the file-source analogue of maxOffsetsPerTrigger)."""
    if bootstrap_servers is not None and kafka_source_available(spark):
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
        )
    reader = spark.readStream.schema(KAFKA_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(os.path.join(topic_dir, topic))


def read_topic_batch(spark: SparkSession, topic_dir: str, topic: str) -> DataFrame:
    """Batch view of the same topic (backfill / oracle side)."""
    return spark.read.schema(KAFKA_SCHEMA).json(os.path.join(topic_dir, topic))
