"""Edge-case battery: empty inputs, null keys, degenerate shapes —
the failure class a 100 TB pipeline hits on day one (empty partitions,
null join keys) that fixture-driven oracles never exercise."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from mapreduce_citation_spark.citations import CitationAnalytics
from mapreduce_citation_spark.sources.readers import read_edges_text


def test_comments_only_file_yields_empty(spark, tmp_path):
    f = tmp_path / "only_comments.txt"
    f.write_text("# header\n# another\n\n\n")
    edges = read_edges_text(spark, str(f))
    assert edges.count() == 0


def test_empty_edges_through_full_pipeline(spark):
    schema = StructType(
        [StructField("from_paper", StringType()), StructField("to_paper", StringType())]
    )
    ca = CitationAnalytics(spark.createDataFrame([], schema))
    assert ca.citation_counts().count() == 0
    assert ca.top_cited(30).count() == 0
    report = ca.format_report(timestamp="t")
    assert "Top 30 Most Cited Papers" in report  # header/footer still render
    assert report.endswith("Generated on: t\n")


def test_null_keys_groupby_and_join(spark):
    # nulls form their own group in groupBy but never match in joins —
    # the SQL semantics every operator must respect
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("a", 3), (None, 4)], ["k", "v"]
    )
    groups = {r["k"]: r["n"] for r in
              df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert groups == {"a": 2, None: 2}
    other = spark.createDataFrame([("a", 10), (None, 20)], ["k", "w"])
    joined = df.join(other, "k").collect()
    assert all(r["k"] == "a" for r in joined)  # null keys never join
    assert len(joined) == 2


def test_asof_join_empty_right(spark):
    import datetime as dt

    from mapreduce_citation_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1))], ["e", "k", "ts"]
    )
    right = spark.createDataFrame(
        [], "k string, rts timestamp, v long"
    )
    out = asof_join(left, right, "k", "k", "ts", "rts", ["v"]).collect()
    assert len(out) == 1 and out[0]["v"] is None


def test_dedup_lsh_no_documents(spark, tmp_path):
    # an empty documents table must flow through the whole LSH pipeline
    import pyspark.sql.functions as F

    from mapreduce_citation_spark.operators.dedup import exploded_word_shingles

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exploded_word_shingles(empty).count() == 0


def test_single_token_docs_have_no_shingles(spark):
    from mapreduce_citation_spark.operators.dedup import exploded_word_shingles

    docs = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "three words here")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]
        for r in exploded_word_shingles(docs, 3).select("doc_id").distinct().collect()
    }
    assert got == {3}  # k=3 shingles need ≥3 tokens


def test_report_ties_use_string_order(spark):
    # numeric-looking IDs tie-break lexicographically: "10" < "9"
    edges = spark.createDataFrame(
        [("c1", "9"), ("c2", "10")], ["from_paper", "to_paper"]
    )
    rows = CitationAnalytics(edges).top_cited(2).collect()
    assert [r["paper_id"] for r in rows] == ["10", "9"]


_BATCH_RETRY_CHILD = r"""
import json, os, sys
repo, outdir, markers = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession, functions as F

# local[4,2]: second task attempts are REAL; a first-attempt failure
# retries instead of failing the job
spark = (
    SparkSession.builder.master("local[4,2]")
    .appName("batch-retry")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 1000, 1, 4).select(F.col("id"))

def batches(it):
    import pandas as pd
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid, attempt = tc.partitionId(), tc.attemptNumber()
    first = True
    for pdf in it:
        out = pd.DataFrame({"id": pdf["id"], "v": pdf["id"] * 2})
        yield out  # PARTIAL output escapes before the crash
        if first and pid == 0 and attempt == 0:
            with open(os.path.join(markers, f"fail_{pid}_{attempt}"), "w") as f:
                f.write("x")
            raise RuntimeError("injected first-attempt failure after partial output")
        first = False

res = df.mapInPandas(batches, "id long, v long")
res.write.mode("overwrite").parquet(outdir)
back = spark.read.parquet(outdir)
print(json.dumps({
    "n": back.count(),
    "n_distinct": back.select("id").distinct().count(),
    "sum_v": back.agg(F.sum("v")).collect()[0][0],
}))
spark.stop()
"""


def test_batch_mapinpandas_exactly_once_under_task_retry(tmp_path):
    """Batch-side exactly-once under TASK retry: a mapInPandas stage
    (the multimodal-decode shape) yields partial output then dies on
    every first attempt of partition 0; the parquet task-commit
    protocol must discard the failed attempt's output so the retried
    partition lands exactly once — no loss, no duplication."""
    import json
    import os
    import subprocess
    import sys as _sys

    markers = tmp_path / "markers"
    markers.mkdir()
    out = tmp_path / "out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, "-c", _BATCH_RETRY_CHILD, repo, str(out), str(markers)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert len(os.listdir(markers)) >= 1  # the injection really fired
    assert got["n"] == got["n_distinct"] == 1000
    assert got["sum_v"] == 2 * sum(range(1000))


def test_corrupt_parquet_file_policies(spark, tmp_path):
    """Corrupt-input tolerance: a truncated parquet part fails the
    read by default (fail-fast is the safe default) but is skipped
    under ignoreCorruptFiles — the lakehouse triage switch for a
    partially-written directory."""
    import glob
    import os

    import pytest

    d = str(tmp_path / "data")
    spark.range(1000).repartition(4).write.parquet(d)
    part = sorted(glob.glob(f"{d}/part-*.parquet"))[0]
    size = os.path.getsize(part)
    with open(part, "r+b") as f:
        f.truncate(size // 3)  # destroy footer + magic

    with pytest.raises(Exception):
        spark.read.parquet(d).count()

    # schema inference reads every footer (and throws on the corrupt
    # one regardless of the option) — a recovery read supplies the
    # schema explicitly, as a real triage run would
    n = (
        spark.read.schema("id bigint")
        .option("ignoreCorruptFiles", "true")
        .parquet(d)
        .count()
    )
    assert 0 < n < 1000  # the other parts survive, the corrupt one is skipped
