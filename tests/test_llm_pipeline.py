"""Tests for the LLM-data-pipeline operators: dedup, similarity
search, text analysis, multimodal plumbing. Properties that the
DuckDB oracle can't express (LSH recall, SimHash locality, decode
batch shape) are pinned here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_exact_dedup_on_planted_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique doc")],
        ["doc_id", "text"],
    )
    # same logic as dedup_exact, on a controlled input
    out = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_n = sorted((r["n"], r["keep_id"]) for r in out)
    assert by_n == [(1, 3), (2, 1)]  # dup group keeps min id


def test_lsh_candidates_superset_of_true_pairs(spark, sf_dir):
    """LSH at 4×4 bands must recall the fixture's ~0.98-Jaccard planted
    near-dups found by the exhaustive method (recall ≈ 1 at j≫0.8)."""
    from mapreduce_citation_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    lsh = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    true = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert true, "fixture should contain planted near-duplicates"
    assert true <= lsh  # every verified pair surfaced as a candidate


def test_simhash_locality(spark):
    """Near-identical token multisets → small Hamming distance;
    unrelated docs → large."""
    from mapreduce_citation_spark.functions.text_funcs import (
        simhash_spark,
        tokens_spark,
    )

    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base + "extra"
    far = "completely different words appear in this other document entirely " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    rows = docs.select(
        "doc_id", F.expr(simhash_spark(tokens_spark("text"))).alias("sh")
    ).collect()
    sh = {r["doc_id"]: r["sh"] for r in rows}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert ham(sh[1], sh[2]) <= 6
    assert ham(sh[1], sh[3]) > ham(sh[1], sh[2])


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def test_lsh_ann_results_subset_of_brute_rankings(spark, sf_dir):
    """Every ANN hit must be a true neighbor with the same cosine the
    brute-force path computes (re-rank inside the bucket is exact)."""
    from mapreduce_citation_spark.operators.similarity import (
        knn_brute_cosine,
        knn_lsh_ann,
    )

    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in knn_brute_cosine(spark, sf_dir).collect()
    }
    ann_rows = knn_lsh_ann(spark, sf_dir).collect()
    assert ann_rows, "ANN should return candidates on the fixture"
    # cosines must agree exactly where both paths scored the same pair
    for r in ann_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute:
            assert abs(brute[key] - r["cosine"]) == 0.0


def test_knn_brute_self_similarity_excluded(spark, sf_dir):
    from mapreduce_citation_spark.operators.similarity import knn_brute_cosine

    rows = knn_brute_cosine(spark, sf_dir).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    assert all(1 <= r["rank"] <= 5 for r in rows)
    # cosine is bounded
    assert all(-1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9 for r in rows)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_quality_scores_on_known_text(spark):
    from mapreduce_citation_spark.functions.text_funcs import tokens_spark

    docs = spark.createDataFrame([(1, "the cat the mat")], ["doc_id", "text"])
    row = docs.select(
        F.expr(f"size({tokens_spark('text')})").alias("n_tokens"),
        F.expr(f"size(array_distinct({tokens_spark('text')}))").alias("n_types"),
    ).collect()[0]
    assert row["n_tokens"] == 4 and row["n_types"] == 3


def test_lang_id_deterministic_tiebreak(spark, sf_dir):
    from mapreduce_citation_spark.operators.text import text_lang_id

    df = text_lang_id(spark, sf_dir)
    preds = {r["lang_pred"] for r in df.collect()}
    assert preds <= {"en", "es", "de", "fr", "zh", "unknown"}
    # running twice yields identical predictions (pure function of text)
    again = {r["doc_id"]: r["lang_pred"] for r in text_lang_id(spark, sf_dir).collect()}
    first = {r["doc_id"]: r["lang_pred"] for r in df.collect()}
    assert first == again


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_roundtrip_payload_is_faithful(spark, sf_dir):
    from mapreduce_citation_spark.operators.multimodal import ingest_assets
    from mapreduce_citation_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    assets = ingest_assets(docs)
    back = assets.select(
        "doc_id", F.decode("payload", "UTF-8").alias("text2")
    ).join(docs.select("doc_id", "text"), "doc_id")
    assert back.filter(F.col("text") != F.col("text2")).count() == 0


def test_decode_stub_raises_on_unknown_mime():
    from mapreduce_citation_spark.operators.multimodal import decode_stub

    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "video/mp4")


def test_feature_extraction_schema_and_determinism(spark, sf_dir):
    from mapreduce_citation_spark.operators.multimodal import (
        extract_features,
        ingest_assets,
    )
    from mapreduce_citation_spark.sources.readers import load_table

    assets = ingest_assets(load_table(spark, sf_dir, "documents").limit(50))
    f1 = extract_features(assets)
    assert [f.name for f in f1.schema.fields] == [
        "doc_id", "mime", "width", "height", "n_channels", "n_bytes",
    ]
    rows1 = sorted(map(tuple, f1.collect()))
    rows2 = sorted(map(tuple, extract_features(assets).collect()))
    assert rows1 == rows2
    assert all(64 <= r[2] < 128 for r in rows1)  # width in the stub's range


def test_multimodal_features_channels_by_mime(spark, sf_dir):
    from mapreduce_citation_spark.operators.multimodal import (
        multimodal_decode_features,
    )

    rows = multimodal_decode_features(spark, sf_dir).collect()
    chan = {r["mime"]: r["n_channels"] for r in rows}
    assert chan == {"image/png": 3, "audio/wav": 1}
