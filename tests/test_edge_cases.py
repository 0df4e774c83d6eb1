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
