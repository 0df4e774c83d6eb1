"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched pandas stages.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind ``decode_stub`` (clearly marked; swap in
PIL/librosa on a real cluster). Everything Spark-side is real and
tested: the binary column representation, the metadata struct schema,
the ``mapInPandas`` batch iterator signature, and the partition-
preserving pipeline shape — which is what has to be right at 100 TB
(payload bytes never shuffle; features are computed in place and only
the small feature columns move).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources.readers import load_table

#: Schema of an ingested multimodal asset: payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

#: Output schema of the fake feature extractor.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def ingest_assets(docs: DataFrame) -> DataFrame:
    """documents → multimodal asset table: the text payload stands in
    for opaque media bytes (binary column + metadata), exactly the
    representation a real image/audio ingest would produce."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image/png")
        .otherwise("audio/wav")
        .alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("checksum"),
    )


def decode_stub(payload: bytes, mime: str) -> dict:
    """STUB decode — the real implementation needs PIL/ffmpeg (absent
    in this container). Deterministic fake: dimensions derived from
    the payload's first bytes so tests are stable. Raises for unknown
    mime types the way a real decoder would."""
    if mime not in ("image/png", "audio/wav"):
        raise NotImplementedError(f"no decoder for mime {mime!r}")
    b0 = payload[0] if payload else 0
    b1 = payload[1] if len(payload) > 1 else 0
    return {
        "width": 64 + (b0 % 64),
        "height": 64 + (b1 % 64),
        "n_channels": 3 if mime == "image/png" else 1,
    }


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas: the decode
    runs per-partition on pandas batches (payload bytes stay where
    they are; no shuffle), emitting only the small feature columns.

    The batch closure must be SELF-CONTAINED: cloudpickle serializes
    references to module-level names of this package by import path,
    and Spark's python workers don't necessarily have the package on
    their sys.path (the driver harness hands us its own session). So
    the decode logic and column list are captured by value here —
    ``decode_stub`` above stays the documented/testable reference
    implementation of the same logic."""
    out_cols = [f.name for f in FEATURE_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload: bytes, mime: str) -> dict:
            # keep in sync with decode_stub (by-value copy — see above)
            if mime not in ("image/png", "audio/wav"):
                raise NotImplementedError(f"no decoder for mime {mime!r}")
            b0 = payload[0] if payload else 0
            b1 = payload[1] if len(payload) > 1 else 0
            return {
                "width": 64 + (b0 % 64),
                "height": 64 + (b1 % 64),
                "n_channels": 3 if mime == "image/png" else 1,
            }

        for pdf in it:
            feats = [decode(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "mime", pdf["mime"].values)
            out["n_bytes"] = pdf["n_bytes"].values
            yield out[out_cols]

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


#: Output schema of the frame sampler (one row per sampled frame).
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_checksum", StringType()),
    ]
)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling: each asset's payload yields one "frame" per
    ``every_n_bytes`` slice (a deterministic stand-in for video frame
    extraction — the real decoder is stubbed, the 1→N row-explosion
    plumbing is real). mapInPandas lets one input row emit many output
    rows without a shuffle; downstream per-frame featurization
    parallelizes over the expanded rows. Closure is self-contained
    (see extract_features)."""
    import hashlib as _hl

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                for i in range(0, max(len(p), 1), every_n_bytes):
                    chunk = p[i : i + every_n_bytes]
                    rows.append(
                        (
                            doc_id,
                            i // every_n_bytes,
                            chunk,
                            _hl.md5(chunk).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_checksum"]
            )

    return assets.mapInPandas(frames, FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
WITH expanded AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(greatest(ceil(length(text) / 64.0), 1) AS BIGINT))) AS i
  FROM documents
),
frames AS (
  SELECT doc_id, md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_checksum
  FROM expanded
)
SELECT doc_id, COUNT(*) AS n_frames,
       COUNT(DISTINCT frame_checksum) AS n_distinct_frames,
       MIN(frame_checksum) AS first_checksum_sorted
FROM frames
GROUP BY doc_id
""",
    tags=("multimodal", "frame-sample", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset frame statistics from the sampled frames. The oracle
    recomputes the same 64-byte slicing in SQL (ASCII payloads make
    byte slices == char slices), checking the full 1→N pandas
    pipeline against a pure-SQL reconstruction."""
    assets = ingest_assets(load_table(spark, sf_dir, "documents"))
    fr = sample_frames(assets, 64)
    return fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.count_distinct("frame_checksum").alias("n_distinct_frames"),
        F.min("frame_checksum").alias("first_checksum_sorted"),
    )


@register(
    "multimodal_ingest_stats",
    oracle="""
SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
       COUNT(*) AS n_assets,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_distinct_payloads
FROM documents
GROUP BY 1
""",
    tags=("multimodal", "ingest"),
)
def multimodal_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest accounting per mime type: asset counts, payload bytes,
    distinct-checksum counts (dedup precursor on binary columns)."""
    assets = ingest_assets(load_table(spark, sf_dir, "documents"))
    return assets.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct("checksum").alias("n_distinct_payloads"),
    )


@register(
    "multimodal_decode_features",
    tags=("multimodal", "pandas-udf", "rows-only"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + featurize via the mapInPandas pipeline (stubbed codec,
    real plumbing). Rows-only for the driver: the fake decode is not
    SQL; per-batch shape and determinism are pinned in pytest."""
    assets = ingest_assets(load_table(spark, sf_dir, "documents"))
    feats = extract_features(assets)
    return feats.groupBy("mime", "n_channels").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("width").cast("long")).alias("sum_width"),
        F.sum(F.col("height").cast("long")).alias("sum_height"),
        F.sum("n_bytes").alias("total_bytes"),
    )
