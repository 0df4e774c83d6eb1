"""Text-analysis operators over ``documents``: token statistics,
quality scoring, language ID, fingerprinting, and regex (BPE-ish)
token counting — the per-document featurization stage of an LLM data
pipeline.

Everything is a map-side projection or a low-cardinality aggregate:
no UDFs, no shuffles beyond the final groupBy, so at 100 TB the cost
is one scan. All ratios are int/int divisions → bit-identical doubles
in both engines.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text_funcs import (
    bottomk_fingerprint_duck,
    bottomk_fingerprint_spark,
    shingles_duck,
    shingles_spark,
    tokens_duck,
    tokens_spark,
)
from ..registry import register
from ..sources.readers import load_table
from .dedup import PARA_SEG

_TOK_S = tokens_spark("text")
_TOK_D = tokens_duck("text")

#: Stopword profiles for the marker-based language scorer. The fixture
#: vocabulary is synthetic, so the scores are about engine semantics
#: (argmax + deterministic tie-break), not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "es": ("data", "row", "line"),
    "de": ("group", "key", "hash"),
    "fr": ("query", "table", "scan"),
    "zh": ("batch", "stream", "window"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _in_list(langwords: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in langwords)


@register(
    "text_token_stats",
    oracle=f"""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(len({_TOK_D})) AS BIGINT) AS total_tokens,
       CAST(SUM(len({_TOK_D})) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
""",
    bench=True,
    tags=("text", "aggregate"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per (lang, source): doc/token/char totals."""
    d = _docs(spark, sf_dir)
    ntok = F.expr(f"size({_TOK_S})")
    return (
        d.select("lang", "source", ntok.alias("ntok"), "n_chars")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            (F.sum("ntok").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "text_quality_scores",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TOK_D}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({_TOK_D})) AS BIGINT) AS n_types,
       CAST(len(list_distinct({_TOK_D})) AS DOUBLE) / len({_TOK_D}) AS type_token_ratio,
       CAST(len(list_filter({_TOK_D}, t -> t IN ('the', 'a', 'of'))) AS DOUBLE)
         / len({_TOK_D}) AS stopword_ratio,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_TOK_D}) AS avg_token_len
FROM documents
WHERE len({_TOK_D}) > 0
""",
    tags=("text", "quality"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token/type counts, type-token
    ratio, stopword ratio, mean token length — the standard cheap
    quality-filter signals (all exact int/int ratios)."""
    d = _docs(spark, sf_dir)
    ntok = F.expr(f"size({_TOK_S})")
    ntypes = F.expr(f"size(array_distinct({_TOK_S}))")
    nstop = F.expr(f"size(filter({_TOK_S}, t -> t IN ('the', 'a', 'of')))")
    nchars_nospace = F.length(F.regexp_replace("text", " ", ""))
    return (
        d.select(
            "doc_id",
            ntok.cast("long").alias("n_tokens"),
            ntypes.cast("long").alias("n_types"),
            (ntypes.cast("double") / ntok).alias("type_token_ratio"),
            (nstop.cast("double") / ntok).alias("stopword_ratio"),
            (nchars_nospace.cast("double") / ntok).alias("avg_token_len"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def _score_s(words: tuple[str, ...]) -> str:
    return f"size(filter({_TOK_S}, t -> t IN ({_in_list(words)})))"


def _score_d(words: tuple[str, ...]) -> str:
    return f"len(list_filter({_TOK_D}, t -> t IN ({_in_list(words)})))"


def _argmax_case(score_fn) -> str:
    """CASE chain picking the max-scoring language, name-asc tie-break
    (langs evaluated in sorted order, >= keeps the earlier winner)."""
    langs = sorted(LANG_MARKERS)
    cases = []
    for lang in langs:
        others = [
            f"{score_fn(LANG_MARKERS[lang])} >= {score_fn(LANG_MARKERS[o])}"
            if o > lang
            else f"{score_fn(LANG_MARKERS[lang])} > {score_fn(LANG_MARKERS[o])}"
            for o in langs
            if o != lang
        ]
        cases.append(f"WHEN {' AND '.join(others)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'unknown' END"


@register(
    "text_lang_id",
    oracle=f"""
SELECT doc_id, lang,
       {_argmax_case(_score_d)} AS lang_pred,
       CASE WHEN ({_argmax_case(_score_d)}) = lang THEN 1 ELSE 0 END AS is_match
FROM documents
""",
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word (n-gram-profile) language ID: score each language's
    stopword list against the token set, argmax with deterministic
    name-ascending tie-break. On real corpora the markers are
    character n-gram profiles; the operator shape is identical."""
    d = _docs(spark, sf_dir)
    pred = F.expr(_argmax_case(_score_s))
    return d.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        F.when(pred == F.col("lang"), 1).otherwise(0).alias("is_match"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
SELECT doc_id,
       {bottomk_fingerprint_duck(shingles_duck('text', 3))} AS fingerprint
FROM documents
""",
    tags=("text", "fingerprint"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch fingerprint: md5 over the 4 smallest shingle
    hashes — a compact containment-preserving document signature
    (rolling-hash winnowing's set-sketch cousin), map-side only."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.expr(bottomk_fingerprint_spark(shingles_spark("text", 3))).alias(
            "fingerprint"
        ),
    )


@register(
    "text_normalize",
    oracle=r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g'))) AS norm_hash,
       length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                  ' +', ' ', 'g'))) AS norm_len
FROM documents
""",
    tags=("text", "normalize", "cleaning"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase → strip non-alnum →
    collapse whitespace → trim): the first stage of every LLM cleaning
    pipeline and the input to exact dedup. Hash + length keep the
    compare scalar. Note DuckDB regexp_replace needs the 'g' flag —
    Spark's is global by default."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("norm_hash"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@register(
    "text_redact_numbers",
    oracle=r"""
SELECT doc_id,
       md5(regexp_replace(text, '[0-9]+', '[NUM]', 'g')) AS redacted_hash,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_redactions
FROM documents
""",
    tags=("text", "redaction", "cleaning"),
)
def text_redact_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking: replace digit runs with a placeholder and
    count redactions (the operator shape for masking emails/SSNs —
    swap the pattern)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace("text", "[0-9]+", "[NUM]").cast("binary")).alias(
            "redacted_hash"
        ),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))
        .cast("long")
        .alias("n_redactions"),
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({_TOK_D})) AS term,
         len({_TOK_D}) AS doc_len
  FROM documents
),
tf AS (
  SELECT d.doc_id, t.term, t.doc_len,
         len(list_filter({_TOK_D.replace('text', 'd.text')}, x -> x = t.term)) AS tf
  FROM documents d JOIN tok t ON d.doc_id = t.doc_id
),
df AS (
  SELECT term, COUNT(*) AS df FROM tok GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, score, CAST(rn AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rn
  FROM scored
) t
WHERE rn <= 3 AND doc_id < 100
""",
    tags=("text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (linear-idf variant: score =
    tf · N/df — a rational number, exact in double, so cross-engine
    ranking is bit-deterministic; log-idf would differ in ulps between
    libm implementations and flip mathematically-tied ranks). The
    classic two-aggregation shape — computed from ONE tokenize pass:
    the per-(doc, term) frequency table is materialized once and the
    document frequency is just its per-term row count (a second
    documents scan for distinct terms would redo the explode); the
    corpus size folds in as a lazy 1-row broadcast, not a driver
    count()."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(F.expr(_TOK_S)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias(
                "score"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "term", "score", "rank")
    )


@register(
    "doc_winnowing_fingerprints",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOK_D} AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS pos,
         t
  FROM toks
),
hashed AS (
  SELECT doc_id, pos,
         md5(array_to_string(t[CAST(pos AS INT):CAST(pos + 2 AS INT)], ' ')) AS h
  FROM grams
),
winnowed AS (
  SELECT doc_id, pos,
         MAX(pos) OVER (PARTITION BY doc_id) AS max_pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
  FROM hashed
)
SELECT doc_id,
       COUNT(DISTINCT sel) AS n_fingerprints,
       md5(array_to_string(list_sort(list(DISTINCT sel)), '')) AS sketch
FROM winnowed
WHERE pos + 3 <= max_pos
GROUP BY doc_id
""",
    tags=("text", "fingerprint", "winnowing"),
)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm's core):
    positional word-3-gram hashes, a w=4 sliding window selects each
    window's minimum hash, distinct selected hashes form the sketch —
    guaranteeing any sufficiently long match between two documents
    shares a fingerprint. Positional n-grams via posexplode + lead
    (codegen-friendly); the window min is one pass per doc partition."""
    winnowed = winnowed_fingerprints(_docs(spark, sf_dir))
    return winnowed.groupBy("doc_id").agg(
        F.count_distinct("sel").alias("n_fingerprints"),
        F.md5(
            F.array_join(F.array_sort(F.collect_set("sel")), "").cast("binary")
        ).alias("sketch"),
    )


def winnowed_fingerprints(d: DataFrame) -> DataFrame:
    """(doc_id, sel) winnowing selections (MOSS core): positional
    word-3-gram hashes, a w=4 sliding window selects each window's
    minimum — shared by ``doc_winnowing_fingerprints`` (per-doc
    sketch) and ``dedup_winnowing_pairs`` (pairing)."""
    tok = d.repartition(F.col("doc_id")).select(
        "doc_id", F.posexplode(F.expr(_TOK_S)).alias("pos", "w0")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.withColumn("w1", F.lead("w0", 1).over(w))
        .withColumn("w2", F.lead("w0", 2).over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "pos", F.md5(F.concat_ws(" ", "w0", "w1", "w2")).alias("h"))
    )
    # Standard winnowing selects a minimum only from FULL w=4 windows:
    # the trailing <4-hash partial windows at each document's tail are
    # excluded (their minima would not be guaranteed shared by a
    # matching suffix in another document).
    w_min = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    w_doc = Window.partitionBy("doc_id")
    return (
        grams.withColumn("max_pos", F.max("pos").over(w_doc))
        .withColumn("sel", F.min("h").over(w_min))
        .filter(F.col("pos") + 3 <= F.col("max_pos"))
        .select("doc_id", "sel")
    )


@register(
    "token_count_regex",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
FROM documents
""",
    tags=("text", "tokenize"),
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting: word pieces = letter runs, digit
    runs, or single punctuation — the cheap pre-tokenizer count used
    for data budgeting (the regex is identical RE2/Java syntax)."""
    d = _docs(spark, sf_dir)
    # idx=0 (whole match): Spark defaults to capture group 1, DuckDB to 0
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).cast("long").alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0))
        .cast("long")
        .alias("n_numbers"),
    )


@register(
    "doc_length_histogram",
    oracle=f"""
SELECT CAST((len({_TOK_D}) // 16) * 16 AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_docs,
       CAST(SUM(len({_TOK_D})) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1
""",
    tags=("text", "audit", "histogram"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (width-16 buckets) — the sequence-length
    distribution every batching/packing strategy is tuned against.
    Integer bucket arithmetic (DIV), so both engines land every doc in
    the same bucket; one map-side projection + tiny rollup."""
    d = _docs(spark, sf_dir)
    ntok = F.expr(f"size({_TOK_S})").cast("long")
    return (
        d.select(((ntok / 16).cast("long") * 16).alias("bucket_lo"), ntok.alias("nt"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
        )
    )


def _grams_duck(k: int = 3) -> str:
    """Word k-grams WITH multiplicity (DuckDB) — shingles_duck minus
    the list_distinct, for repetition measurement."""
    t = _TOK_D
    return (
        f"list_transform(generate_series(1, greatest(len({t}) - {k - 1}, 0)), "
        f"i -> array_to_string(({t})[i:i+{k - 1}], ' '))"
    )


@register(
    "text_repetition_scores",
    oracle=f"""
WITH g AS (
  SELECT doc_id, unnest({_grams_duck(3)}) AS s FROM documents
),
c AS (
  SELECT doc_id, s, COUNT(*) AS cnt FROM g GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
       CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS dup_gram_ratio,
       CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_gram_frac
FROM c
GROUP BY doc_id
""",
    tags=("text", "quality", "repetition"),
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals — the duplicated-n-gram rules the
    published web-corpus filters (Gopher, C4-style) apply: the
    fraction of word-3-grams that are repeats, and the share of the
    single most frequent 3-gram. Degenerate generated/boilerplate
    text scores high on both and gets filtered.

    Plan: non-distinct gram explode (doc-partitioned, no extra
    shuffle), per-(doc, gram) count, then a per-doc rollup — both
    aggregations cluster on doc_id, so hash(doc_id) partitioning from
    the explode front-end serves the whole pipeline: ONE exchange
    total at any scale."""
    from .dedup import exploded_word_shingles

    d = _docs(spark, sf_dir)
    grams = exploded_word_shingles(d, 3, distinct=False)
    per_gram = grams.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
        (
            (F.sum("cnt") - F.count(F.lit(1))).cast("double")
            / F.sum("cnt").cast("double")
        ).alias("dup_gram_ratio"),
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_gram_frac"
        ),
    )


@register(
    "text_unigram_rarity",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK_D}) AS term FROM documents
),
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
bits AS (
  SELECT t.doc_id, CAST(length(bin(CAST(c.c AS BIGINT))) AS BIGINT) AS b
  FROM tok t JOIN cnt c USING (term)
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(SUM(b) AS BIGINT) AS sum_freq_bits,
       CAST(SUM(b) AS DOUBLE) / count(*) AS mean_freq_bits
FROM bits
GROUP BY doc_id
""",
    tags=("text", "quality", "perplexity-proxy"),
)
def text_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score (CCNet-shaped): per document,
    the mean QUANTIZED log-frequency of its tokens under the corpus's
    own unigram distribution — rare-token-heavy docs score low
    mean_freq_bits, common-word docs high, the same axis a KenLM
    perplexity filter ranks on (up to the model).

    The log is deliberately integer-exact: bits(c) = length(bin(c)) =
    floor(log2 c)+1, computed on exact counts — no libm `log`, whose
    last-ulp behavior differs between the JVM and DuckDB (the same
    reason ``text_tfidf_top_terms`` uses linear idf). Integer sums
    then divide once, correctly rounded — bit-identical cross-engine
    without any sorted-fold machinery.

    Shape: one tokenize pass (multiplicity kept), corpus counts (one
    map-side-combinable shuffle on term), join back (term-keyed; the
    count table is Zipf-small relative to the token stream), per-doc
    integer aggregation. All linear; at 100 TB the hot shuffle is the
    token→count join, which AQE broadcast-converts when the
    vocabulary fits."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(F.expr(_TOK_S)).alias("term"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    bits = tok.join(cnt, "term").select(
        "doc_id",
        F.length(F.expr("bin(c)")).cast("long").alias("b"),
    )
    return bits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("b").cast("long").alias("sum_freq_bits"),
        (F.sum("b").cast("double") / F.count(F.lit(1))).alias("mean_freq_bits"),
    )


@register(
    "text_bigram_lm",
    oracle=f"""
WITH t AS (
  SELECT {_TOK_D} AS toks FROM documents
),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
  FROM t WHERE len(toks) >= 2
),
c AS (
  SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS n_pair FROM bg GROUP BY 1, 2
)
SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
       CAST(SUM(n_pair) OVER (PARTITION BY w1) AS BIGINT) AS n_prefix,
       CAST(n_pair AS DOUBLE) / SUM(n_pair) OVER (PARTITION BY w1) AS cond_p
FROM c
ORDER BY n_pair DESC, w1 ASC, w2 ASC
LIMIT 100
""",
    tags=("text", "lm", "ngram"),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model counts — the classic MapReduce workload
    (count pairs, normalize per prefix) as two aggregations: top-100
    bigrams with their conditional probability P(w2|w1) =
    n_pair / n_prefix (exact-int numerator/denominator, one IEEE
    division — deterministic on both engines).

    Shape: map-side bigram explode (adjacent-token pairs, no
    self-join), one map-side-combinable shuffle to count pairs, one
    w1-keyed window for the prefix totals (same shuffle key a
    dedicated prefix-count aggregation would use), TakeOrdered
    top-100. Linear in token count; the LM-table shape (shuffle on
    the n-gram, re-key on the prefix) is the same at any n."""
    d = _docs(spark, sf_dir)
    toks = d.select(F.expr(_TOK_S).alias("toks")).where(F.size("toks") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS w1, "
                "element_at(toks, i + 1) AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    w = Window.partitionBy("w1")
    return (
        c.select(
            "w1",
            "w2",
            "n_pair",
            F.sum("n_pair").over(w).cast("long").alias("n_prefix"),
            (
                F.col("n_pair").cast("double")
                / F.sum("n_pair").over(w)
            ).alias("cond_p"),
        )
        .orderBy(F.col("n_pair").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(100)
    )


_WINNOW_MAXDF = 1000  # boilerplate guard, same rationale as dedup._ES_MAXDF


@register(
    "dedup_winnowing_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOK_D} AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS pos,
         t
  FROM toks
),
hashed AS (
  SELECT doc_id, pos,
         md5(array_to_string(t[CAST(pos AS INT):CAST(pos + 2 AS INT)], ' ')) AS h
  FROM grams
),
winnowed AS (
  SELECT doc_id, pos,
         MAX(pos) OVER (PARTITION BY doc_id) AS max_pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
  FROM hashed
),
sel_d AS (
  SELECT DISTINCT doc_id, sel FROM winnowed WHERE pos + 3 <= max_pos
),
eligible AS (
  SELECT sel FROM sel_d GROUP BY sel HAVING count(*) BETWEEN 2 AND {_WINNOW_MAXDF}
),
gg AS (SELECT s.doc_id, s.sel FROM sel_d s JOIN eligible USING (sel))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM gg a JOIN gg b ON a.sel = b.sel AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING count(*) >= 2
""",
    tags=("dedup", "winnowing", "fingerprint", "pairs"),
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-based near-dup PAIRS — the MOSS matching step:
    documents sharing >= 2 winnowed fingerprints, with the shared
    count as evidence. Winnowing guarantees any sufficiently long
    token match selects a common fingerprint, so this detects long
    verbatim overlaps the word-shingle MinHash family can dilute.

    Same scale discipline as the substring family: distinct
    (doc_id, sel) materialized once, fingerprint document-frequency
    capped at 1000 (boilerplate guard, mirrored in the oracle) so
    the pair join stays linear in true near-dup mass; pairs
    materialize only for fingerprints that actually repeat."""
    sel_d = (
        winnowed_fingerprints(_docs(spark, sf_dir))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    eligible = (
        sel_d.groupBy("sel")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _WINNOW_MAXDF))
        .select("sel")
    )
    gg = sel_d.join(eligible, "sel")
    a = gg.select(F.col("doc_id").alias("doc_a"), "sel")
    b = gg.select(F.col("doc_id").alias("doc_b"), "sel")
    return (
        a.join(b, "sel")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@register(
    "corpus_vocab_topk",
    oracle=r"""
SELECT word, COUNT(*) AS tf,
       COUNT(DISTINCT doc_id) AS df
FROM (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
)
GROUP BY word
ORDER BY tf DESC, word ASC
LIMIT 200
""",
    tags=("text", "vocabulary", "topk"),
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-200 terms by total frequency with
    document frequency — the counting pass a tokenizer-training
    (BPE/unigram) pipeline starts from.

    Scale shape: explode is map-side; one hash aggregation on the
    term key computes tf AND df together (df via count(distinct
    doc_id), which Spark expands to a two-phase partial-distinct agg
    — no second pass over the corpus); top-k is
    TakeOrderedAndProject, never a global sort."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("word"),
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("word").asc())
        .limit(200)
    )


#: Gopher-style quality rules as self-contained boolean SQL over a
#: ``documents`` row — ONE definition consumed by ``corpus_quality_gate``
#: (per-rule funnel accounting) and ``corpus_curation_funnel``
#: (pipeline.py). All bounds are integer cross-multiplications, so the
#: booleans are exact on both engines; repeated subexpressions are
#: CSE'd by both optimizers.
# NOTE the doubled backslash: Spark's SQL parser unescapes string
# literals (so the literal must read \\s to mean regex \s), DuckDB's
# does not (single \s suffices there).
_QG_TOKCHARS_S = "length(regexp_replace(text, '\\\\s', ''))"
_QG_TOKCHARS_D = "length(regexp_replace(text, '\\s', '', 'g'))"
_QG_DIGITS_S = "length(regexp_replace(text, '[^0-9]', ''))"
_QG_DIGITS_D = "length(regexp_replace(text, '[^0-9]', '', 'g'))"

QG_RULES_SPARK: dict[str, str] = {
    "r_len": f"size({_TOK_S}) BETWEEN 5 AND 500",
    "r_word_len": (
        f"2 * size({_TOK_S}) <= {_QG_TOKCHARS_S}"
        f" AND {_QG_TOKCHARS_S} <= 12 * size({_TOK_S})"
    ),
    "r_symbol": f"5 * {_QG_DIGITS_S} <= {_QG_TOKCHARS_S}",
    "r_stop": f"arrays_overlap({_TOK_S}, array('the', 'a', 'of'))",
}
QG_RULES_DUCK: dict[str, str] = {
    "r_len": f"len({_TOK_D}) BETWEEN 5 AND 500",
    "r_word_len": (
        f"2 * len({_TOK_D}) <= {_QG_TOKCHARS_D}"
        f" AND {_QG_TOKCHARS_D} <= 12 * len({_TOK_D})"
    ),
    "r_symbol": f"5 * {_QG_DIGITS_D} <= {_QG_TOKCHARS_D}",
    "r_stop": f"list_has_any({_TOK_D}, ['the', 'a', 'of'])",
}
#: conjunction of all rules (the keep decision)
QG_KEEP_SPARK = " AND ".join(f"({e})" for e in QG_RULES_SPARK.values())
QG_KEEP_DUCK = " AND ".join(f"({e})" for e in QG_RULES_DUCK.values())


@register(
    "corpus_quality_gate",
    oracle=f"""
WITH r AS (
  SELECT source,
         ({QG_RULES_DUCK["r_len"]}) AS r_len,
         ({QG_RULES_DUCK["r_word_len"]}) AS r_word_len,
         ({QG_RULES_DUCK["r_symbol"]}) AS r_symbol,
         ({QG_RULES_DUCK["r_stop"]}) AS r_stop
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN r_len THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
       CAST(SUM(CASE WHEN r_word_len THEN 1 ELSE 0 END) AS BIGINT) AS pass_word_len,
       CAST(SUM(CASE WHEN r_symbol THEN 1 ELSE 0 END) AS BIGINT) AS pass_symbol,
       CAST(SUM(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS pass_stop,
       CAST(SUM(CASE WHEN r_len AND r_word_len AND r_symbol AND r_stop
                THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM r
GROUP BY source
""",
    tags=("text", "quality", "gopher-rules", "pipeline"),
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gate with per-rule funnel accounting, by
    source — the rules are the shared ``QG_RULES_*`` definitions
    (integer cross-multiplication bounds, e.g. ``2·ntok ≤ tokchars ≤
    12·ntok`` instead of a float mean), so the booleans and counts
    are exact on both engines and ``corpus_curation_funnel``
    (pipeline.py) gates on the very same predicates.

    Scale shape: pure map-side featurization + one aggregation on the
    tiny source key — at 100 TB, one scan; the per-rule pass counts
    are what a curation run reports to decide which rule is doing the
    filtering."""
    d = _docs(spark, sf_dir)
    r = d.select(
        "source",
        *[F.expr(e).alias(name) for name, e in QG_RULES_SPARK.items()],
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        cnt("r_len").alias("pass_len"),
        cnt("r_word_len").alias("pass_word_len"),
        cnt("r_symbol").alias("pass_symbol"),
        cnt("r_stop").alias("pass_stop"),
        F.sum(
            F.when(
                F.col("r_len")
                & F.col("r_word_len")
                & F.col("r_symbol")
                & F.col("r_stop"),
                1,
            ).otherwise(0)
        ).alias("n_keep"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (merge learning)
# ---------------------------------------------------------------------------

#: Symbol-wrapping sentinels for the merge-as-string-replace encoding:
#: every symbol is stored as SEP1+sym+SEP2, so a merge of (x, y) is
#: replace(SEP1 x SEP2 SEP1 y SEP2 → SEP1 xy SEP2) — leftmost
#: non-overlapping, which is exactly classic BPE's greedy merge scan
#: (each occurrence is wrapped individually, so consecutive matches
#: never share boundary bytes). Control chars: ASCII fixture text
#: cannot contain them.
_BPE_SEP1, _BPE_SEP2 = chr(31), chr(30)


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled DuckDB replay of ``text_bpe_merges`` — the same
    iteration-unrolling strategy as the pagerank/k-means oracles.
    Validated against a classic python BPE implementation (tuple
    symbols, greedy left-to-right merge) before registration."""
    s1, s2 = "chr(31)", "chr(30)"

    def pairs(src: str, p: str, t: str) -> str:
        return f"""
{p} AS (
  SELECT z.pr[1] AS l, z.pr[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_zip(ls[1:len(ls)-1], ls[2:len(ls)])) AS pr, freq
    FROM (SELECT string_split(trim(s, {s1}||{s2}), {s2}||{s1}) AS ls, freq
          FROM {src})
  ) z
  GROUP BY 1, 2
),
{t} AS (SELECT l, r, cnt FROM {p} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"""

    def merge(src: str, t: str, dst: str) -> str:
        return f"""
{dst} AS (
  SELECT replace(s, {s1}||t.l||{s2}||{s1}||t.r||{s2},
                 {s1}||t.l||t.r||{s2}) AS s, freq
  FROM {src}, {t} t
)"""

    ctes = [
        f"""words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
),
it0 AS (
  SELECT regexp_replace(word, '(.)', {s1}||'\\1'||{s2}, 'g') AS s, freq
  FROM words
)"""
    ]
    outs = []
    for i in range(1, n_merges + 1):
        ctes.append(pairs(f"it{i - 1}", f"p{i}", f"t{i}"))
        if i < n_merges:
            ctes.append(merge(f"it{i - 1}", f"t{i}", f"it{i}"))
        outs.append(
            f"SELECT {i} AS it, l AS left_sym, r AS right_sym, "
            f"cnt AS pair_count, l || r AS new_token FROM t{i}"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(outs)


def bpe_merge_table(docs: DataFrame, n_merges: int) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus — the TRAINING
    loop of a byte-pair-encoding tokenizer, as a declarative
    fixed-iteration plan:

    1. corpus → word-frequency dict (the classic compression: every
       subsequent pass touches the VOCABULARY, not the corpus — at
       100 TB this is the only corpus-wide shuffle);
    2. per iteration: adjacent-symbol pair counts weighted by word
       freq → global argmax (count desc, pair asc — deterministic
       tie-break) → merge applied to the dict via sentinel-wrapped
       ``F.replace`` (leftmost non-overlapping = classic BPE's greedy
       scan), with the 1-row winner cross-joined on (the vetted
       scalar-fold pattern — no driver round-trip, no collect).

    Output: one row per learned merge (it, left_sym, right_sym,
    pair_count, new_token). Integer counts only — no floats."""
    sep1, sep2 = F.lit(_BPE_SEP1), F.lit(_BPE_SEP2)
    words = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # wrap every char as SEP1+c+SEP2 ($1 = regex group in Spark's
    # replacement syntax; the oracle's RE2 spelling is \1)
    wrapped = words.select(
        F.regexp_replace(
            "word", "(.)", _BPE_SEP1 + "$1" + _BPE_SEP2
        ).alias("s"),
        "freq",
    ).persist(StorageLevel.MEMORY_AND_DISK)

    out = None
    cur = wrapped
    for i in range(1, n_merges + 1):
        ls = F.split(F.expr(f"trim(BOTH '{_BPE_SEP1}{_BPE_SEP2}' FROM s)"),
                     _BPE_SEP2 + _BPE_SEP1)
        toks = cur.select(ls.alias("ls"), "freq")
        pairs = (
            toks.select(
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("ls"), 1, F.size("ls") - 1).alias("l"),
                        F.slice(F.col("ls"), 2, F.size("ls") - 1).alias("r"),
                    )
                ).alias("pr"),
                "freq",
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1)
        row = top.select(
            F.lit(i).alias("it"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.col("cnt").alias("pair_count"),
            F.concat("l", "r").alias("new_token"),
        )
        out = row if out is None else out.unionAll(row)
        if i < n_merges:
            t = top.select(F.col("l").alias("_ml"), F.col("r").alias("_mr"))
            cur = (
                cur.crossJoin(t)
                .select(
                    F.replace(
                        F.col("s"),
                        F.concat(sep1, F.col("_ml"), sep2, sep1, F.col("_mr"), sep2),
                        F.concat(sep1, F.col("_ml"), F.col("_mr"), sep2),
                    ).alias("s"),
                    "freq",
                )
                .localCheckpoint()
            )
    return out


@register(
    "text_bpe_merges",
    oracle=_bpe_oracle(3),
    tags=("text", "bpe", "tokenizer", "iterative", "llm"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three BPE merges learned from the documents corpus (see
    ``bpe_merge_table``); the oracle unrolls the same three
    iterations in SQL, so the pair counting, the argmax tie-break,
    AND the greedy merge application are all hash-gated."""
    return bpe_merge_table(load_table(spark, sf_dir, "documents"), 3)


def _bpe_encode_oracle(n_merges: int) -> str:
    """Unrolled DuckDB replay of ``text_bpe_encode``: the SAME
    training CTEs as ``_bpe_oracle`` (pair counts, deterministic
    argmax, greedy sentinel-wrapped merge) but carrying the WORD
    through every iteration and applying ALL merges (the trainer
    stops short of applying the last one — training only needs its
    identity, encoding needs its effect), then joining per-word token
    counts back onto each document's word stream."""
    s1, s2 = "chr(31)", "chr(30)"
    ctes = [
        f"""words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
),
it0 AS (
  SELECT word, regexp_replace(word, '(.)', {s1}||'\\1'||{s2}, 'g') AS s, freq
  FROM words
)"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(f"""
p{i} AS (
  SELECT z.pr[1] AS l, z.pr[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_zip(ls[1:len(ls)-1], ls[2:len(ls)])) AS pr, freq
    FROM (SELECT string_split(trim(s, {s1}||{s2}), {s2}||{s1}) AS ls, freq
          FROM it{i - 1})
  ) z
  GROUP BY 1, 2
),
t{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
it{i} AS (
  SELECT word,
         replace(s, {s1}||t.l||{s2}||{s1}||t.r||{s2},
                 {s1}||t.l||t.r||{s2}) AS s, freq
  FROM it{i - 1}, t{i} t
)""")
    return (
        "WITH " + ",".join(ctes) + f""",
vocab AS (
  SELECT word,
         len(string_split(trim(s, {s1}||{s2}), {s2}||{s1})) AS n_tok
  FROM it{n_merges}
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_tok) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
      FROM documents) d
JOIN vocab v ON d.word = v.word
WHERE d.word <> ''
GROUP BY d.doc_id"""
    )


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(3),
    tags=("text", "bpe", "tokenizer", "apply", "llm"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY — the missing half of the train→apply
    story (``text_bpe_merges`` learns, this encodes): re-derives the
    same 3 merges over the word-frequency dict, applies ALL of them
    to the VOCABULARY (one row per distinct word — every subsequent
    pass is vocab-sized, the trainer's classic compression), and maps
    each document's word stream through the resulting word→token-count
    table, yielding per-doc BPE token counts (doc_id, n_words,
    n_tokens). This is the token-accounting pass a training-data
    pipeline runs corpus-wide: at 100 TB the corpus is touched twice
    (word-freq shuffle + the apply join on the word key, tokenization's
    inherent cost) and the iterations never touch it. The 1-row merge
    winners fold in by crossJoin (vetted scalar pattern, no collect);
    the apply join carries no broadcast hint — the vocab is
    data-dependent, so AQE picks the strategy from measured sizes.
    Integer outputs only — hash-exact against the unrolled oracle."""
    return bpe_encode_counts(load_table(spark, sf_dir, "documents"), 3)


def bpe_encode_counts(docs: DataFrame, n_merges: int) -> DataFrame:
    """Learn ``n_merges`` BPE merges and encode every document: see
    ``text_bpe_encode`` (the registered 3-merge instance) for the
    plan shape and scale notes. Pytest replays this against a classic
    tuple-symbol python BPE on a planted corpus."""
    sep1, sep2 = F.lit(_BPE_SEP1), F.lit(_BPE_SEP2)
    words = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        "word",
        F.regexp_replace(
            "word", "(.)", _BPE_SEP1 + "$1" + _BPE_SEP2
        ).alias("s"),
        "freq",
    ).localCheckpoint()
    for _ in range(n_merges):
        ls = F.split(F.expr(f"trim(BOTH '{_BPE_SEP1}{_BPE_SEP2}' FROM s)"),
                     _BPE_SEP2 + _BPE_SEP1)
        pairs = (
            cur.select(F.col("s"), "freq")
            .select(ls.alias("ls"), "freq")
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("ls"), 1, F.size("ls") - 1).alias("l"),
                        F.slice(F.col("ls"), 2, F.size("ls") - 1).alias("r"),
                    )
                ).alias("pr"),
                "freq",
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        t = (
            pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(),
                          F.col("r").asc())
            .limit(1)
            .select(F.col("l").alias("_ml"), F.col("r").alias("_mr"))
        )
        cur = (
            cur.crossJoin(t)
            .select(
                "word",
                F.replace(
                    F.col("s"),
                    F.concat(sep1, F.col("_ml"), sep2,
                             sep1, F.col("_mr"), sep2),
                    F.concat(sep1, F.col("_ml"), F.col("_mr"), sep2),
                ).alias("s"),
                "freq",
            )
            .localCheckpoint()  # per-iteration state (vocab-sized)
        )
    ls = F.split(F.expr(f"trim(BOTH '{_BPE_SEP1}{_BPE_SEP2}' FROM s)"),
                 _BPE_SEP2 + _BPE_SEP1)
    vocab = cur.select("word", F.size(ls).alias("n_tok"))
    return (
        docs.select(
            "doc_id", F.explode(F.split("text", r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


@register(
    "text_pmi_collocations",
    oracle=f"""
WITH t AS (
  SELECT {_TOK_D} AS toks FROM documents
),
u AS (
  SELECT unnest(toks) AS w FROM t
),
uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY w),
nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uc),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
  FROM t WHERE len(toks) >= 2
),
bc AS (
  SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM bg GROUP BY 1, 2
),
nb AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n_bg FROM bc)
SELECT w1, w2, n_pair, cx.c AS n_w1, cy.c AS n_w2,
       CAST(n_pair * n_uni * n_uni AS DOUBLE)
         / CAST(n_bg * cx.c * cy.c AS DOUBLE) AS lift
FROM bc
JOIN uc cx ON cx.w = bc.w1
JOIN uc cy ON cy.w = bc.w2, nu, nb
WHERE n_pair >= 5
ORDER BY lift DESC, w1 ASC, w2 ASC
LIMIT 20
""",
    tags=("text", "pmi", "collocations", "ngram"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLOCATION mining: top-20 bigrams by pointwise-mutual-
    information lift — p(w1 w2) / (p(w1)·p(w2)) with pair probability
    over the bigram total and word probabilities over the unigram
    total — the phrase-discovery statistic a tokenizer/vocabulary
    pipeline runs before merging multi-word units (PMI itself is
    log2(lift); log is monotone, so ranking by lift IS ranking by PMI
    and the gate avoids libm entirely). n_pair ≥ 5 prunes
    hapax-pair noise, the classic collocation-extraction floor.

    Determinism: lift's numerator and denominator are each ONE
    product of exact BIGINTs evaluated in an identical expression
    tree on both engines (n_pair·n_uni² ≤ 2^57 at sf0.1; a 10^12-
    token corpus moves the products to DECIMAL), then one division —
    correctly-rounded doubles, bitwise-stable ordering with (w1, w2)
    tie-breaks.

    Shape: two map-side explodes (unigram, bigram) each feeding one
    map-side-combinable count shuffle; the pair→word-count joins key
    on the word (broadcast-eligible by AQE measurement — word counts
    are vocabulary-sized); the two 1-row totals ride scalar folds;
    TakeOrdered top-20. The documents double-scan is the two-role
    token stream (unigram + bigram passes over the same column)."""
    d = _docs(spark, sf_dir)
    toks = d.select(F.expr(_TOK_S).alias("toks"))
    # both count tables are vocabulary-sized and feed 2-3 consumers
    # each; materialized once so the corpus tokenization runs exactly
    # twice (unigram pass + bigram pass), not once per consumer (the
    # unmaterialized plan re-derived the token stream FIVE times)
    uc = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nu = uc.agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("n_uni"))
    bc = (
        toks.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nb = bc.agg(F.expr("CAST(SUM(n_pair) AS BIGINT)").alias("n_bg"))
    cx = uc.select(F.col("w").alias("w1"), F.col("c").alias("n_w1"))
    cy = uc.select(F.col("w").alias("w2"), F.col("c").alias("n_w2"))
    return (
        bc.filter(F.col("n_pair") >= 5)
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2", "n_pair", "n_w1", "n_w2",
            (
                F.expr("CAST(n_pair * n_uni * n_uni AS DOUBLE)")
                / F.expr("CAST(n_bg * n_w1 * n_w2 AS DOUBLE)")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


#: Training context length for the packing operator. Chosen so the
#: fixture corpus packs several documents per window AND a visible
#: fraction of documents straddle a boundary — both branches of the
#: spans arithmetic stay exercised at every SF.
PACK_CONTEXT_LEN = 512


@register(
    "corpus_sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOK_D}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {PACK_CONTEXT_LEN} AS BIGINT) AS window_id,
       CAST((cum - n_tokens) % {PACK_CONTEXT_LEN} AS BIGINT) AS offset_in_window,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (cum - 1) // {PACK_CONTEXT_LEN}
                 - (cum - n_tokens) // {PACK_CONTEXT_LEN} + 1 END
            AS BIGINT) AS windows_spanned
FROM c
""",
    # bench since r10 (r9 verdict #5): round-over-round tracking for
    # the prefix-offset global cumsum under bench conditions
    bench=True,
    tags=("text", "packing", "llm", "training"),
)
def corpus_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING — the GPT-style pretraining batch layout:
    concatenate every document's tokens in one global (doc_id) order
    and slice the stream into fixed ``PACK_CONTEXT_LEN``-token
    training windows. Per document: the window its first token lands
    in, the offset inside that window, and how many windows it spans
    (boundary documents span ≥ 2 — the rows a packing loader must
    split). This is the token-accounting half of batch construction;
    the actual token materialization is the trivial gather that
    follows it.

    Spark-first at 100 TB: the global running token count is the
    textbook unpartitioned-window trap (``Exchange SinglePartition``
    — one core regardless of cluster size), so it runs on the repo's
    prefix-offset decomposition (``prefix.with_global_order``: range
    shuffle + per-partition scan + an ≤n_partitions-row offsets
    broadcast — the same machinery as the exact global quantiles).
    All arithmetic is BIGINT (cross-engine exact; ``div``/``//`` and
    ``%`` agree on the nonnegative operands here), so the DuckDB
    window-cumsum oracle is a hard hash match."""
    from .prefix import with_global_order

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.expr(_TOK_S)).cast("long").alias("n_tokens"),
    )
    g = with_global_order(t, ["doc_id"], cumsum={"cum": "n_tokens"})
    L = PACK_CONTEXT_LEN
    before = F.col("cum") - F.col("n_tokens")
    return g.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {L}").cast("long").alias("window_id"),
        (before % L).cast("long").alias("offset_in_window"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.expr(f"(cum - 1) div {L} - (cum - n_tokens) div {L} + 1")
        )
        .cast("long")
        .alias("windows_spanned"),
    )


#: Chunking geometry: 64-token chunks, 16-token overlap (stride 48).
CHUNK_LEN, CHUNK_OVERLAP = 64, 16


@register(
    "doc_chunk_windows",
    oracle=f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOK_D}) AS BIGINT) AS n_tokens FROM documents
),
ks AS (
  -- scalar generate_series returns a LIST, so column arguments are
  -- fine here (the table-function form rejects lateral columns)
  SELECT doc_id, n_tokens,
         unnest(generate_series(0, CAST(
           CASE WHEN n_tokens <= {CHUNK_LEN} THEN 0
                ELSE (n_tokens - {CHUNK_OVERLAP} - 1)
                     // {CHUNK_LEN - CHUNK_OVERLAP}
           END AS BIGINT))) AS k
  FROM t WHERE n_tokens > 0
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       CAST(k * {CHUNK_LEN - CHUNK_OVERLAP} AS BIGINT) AS start_tok,
       CAST(LEAST(k * {CHUNK_LEN - CHUNK_OVERLAP} + {CHUNK_LEN}, n_tokens)
            AS BIGINT) AS end_tok
FROM ks
""",
    # bench since r10 (r9 verdict #5)
    bench=True,
    tags=("text", "chunking", "llm", "rag"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAPPING CHUNK WINDOWS — the RAG/embedding-pipeline
    pre-pass: each document is cut into ``CHUNK_LEN``-token chunks
    with ``CHUNK_OVERLAP``-token overlap (stride = len − overlap).
    Emits (doc_id, chunk_id, start_tok, end_tok) per chunk; the last
    chunk clamps to the document end, and the chunk count is the
    smallest k covering every token with the overlap honored:
    1 + ⌈(n − len) / stride⌉ for n > len, exactly 1 otherwise (empty
    documents emit nothing).

    Pure MAP-SIDE plan at any scale: token count + an
    ``explode(sequence(...))`` — no shuffle, no window, no UDF; one
    whole-stage-codegen span over the documents scan. The integer
    chunk-count expression ⌈(n−o−…)⌉ is shared with the DuckDB
    ``generate_series`` oracle via the same BIGINT arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    stride = CHUNK_LEN - CHUNK_OVERLAP
    t = d.select(
        "doc_id",
        F.size(F.expr(_TOK_S)).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    last_k = F.when(F.col("n_tokens") <= CHUNK_LEN, F.lit(0).cast("long")).otherwise(
        F.expr(f"(n_tokens - {CHUNK_OVERLAP} - 1) div {stride}")
    )
    return (
        t.select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0).cast("long"), last_k)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("long").alias("start_tok"),
            F.least(
                F.col("chunk_id") * stride + CHUNK_LEN, F.col("n_tokens")
            )
            .cast("long")
            .alias("end_tok"),
        )
    )


#: Boilerplate geometry: non-overlapping 8-token segments (the
#: fixture's text has no newlines, so fixed token segments stand in
#: for CCNet's lines); a segment is boilerplate when it appears
#: verbatim in >= 2 distinct documents.
BOILER_SEG, BOILER_MIN_DOCS = 8, 2

#: r15 (VERDICT r14 #6): the (doc_id, n_tok, segs) base frame has two
#: consumers — the segment-hash stream and the final apply join — so
#: without a cache the scan + tokenize + segment transform runs twice
#: (the r7 cache rule: same projection, no distinguishing pushdown →
#: cache). "persist" (default) materializes it MEMORY_AND_DISK;
#: "none" keeps the recompute shape reachable for tools/ab_r15.py.
BOILER_BASE_CACHE = "persist"


@register(
    "text_boilerplate_strip",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOK_D} AS t FROM documents
),
base AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
         CASE WHEN len(t) >= {BOILER_SEG} THEN
           list_transform(range(0, CAST(len(t) // {BOILER_SEG} AS BIGINT)),
             i -> array_to_string(
               t[CAST(i * {BOILER_SEG} + 1 AS INT):CAST(i * {BOILER_SEG} + {BOILER_SEG} AS INT)],
               ' '))
         ELSE CAST([] AS VARCHAR[]) END AS segs
  FROM toks
),
ph AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT doc_id, unnest(list_transform(segs, s -> md5(s))) AS h FROM base
  )
),
bad AS (SELECT h FROM ph GROUP BY h HAVING count(*) >= {BOILER_MIN_DOCS}),
hits AS (
  SELECT p.doc_id, list(p.h) AS bad_list
  FROM ph p JOIN bad USING (h) GROUP BY p.doc_id
),
stripped AS (
  SELECT b.doc_id, b.n_tok, b.segs,
         CASE WHEN h.bad_list IS NULL THEN b.segs
              ELSE list_filter(b.segs,
                               s -> NOT list_contains(h.bad_list, md5(s)))
         END AS kept
  FROM base b LEFT JOIN hits h USING (doc_id)
)
SELECT doc_id,
       CAST(len(segs) AS BIGINT) AS n_segs,
       CAST(len(segs) - len(kept) AS BIGINT) AS n_removed,
       CAST(len(kept) * {BOILER_SEG} + n_tok % {BOILER_SEG} AS BIGINT)
         AS kept_tokens,
       -- DuckDB array_to_string([]) is NULL where Spark array_join is ''
       md5(coalesce(array_to_string(kept, ' '), '')) AS cleaned_digest
FROM stripped
""",
    # bench since the r10 extension: round-over-round tracking for the
    # newest dedup-family mechanism (hash-df + row-local strip apply)
    bench=True,
    tags=("text", "dedup", "boilerplate", "llm"),
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-DOC BOILERPLATE REMOVAL — the CCNet/RefinedWeb line-dedup
    pass: segments that appear verbatim in ``BOILER_MIN_DOCS``+
    distinct documents (headers, footers, licence blocks, scraped nav
    chrome) are stripped from EVERY document, and the cleaned text is
    re-emitted with per-doc accounting (segment counts, surviving
    token count, md5 digest of the cleaned text — the digest makes the
    APPLY half hash-gated, not just the stats). The fixture's text has
    no newline structure, so CCNet's "line" is stood in by
    non-overlapping ``BOILER_SEG``-token segments; the pipeline is
    segmentation-agnostic.

    Scale shape (100 TB): the document frequency count runs on
    (doc_id, segment-hash) pairs deduped INSIDE the row
    (``array_distinct`` — the r6 rule: never partial-aggregate a
    near-unique key stream) and explicitly repartitioned by the hash
    so the planner gets one complete-mode, spill-capable aggregate.
    Only 16-byte hashes cross the wire for counting; the corpus-sized
    token data moves once, in the final doc_id-keyed apply join. The
    per-doc strip itself is a row-local higher-order filter against
    that doc's (tiny) boilerplate set — never a token-level join."""
    d = _docs(spark, sf_dir)
    seg = BOILER_SEG
    base = d.select("doc_id", F.expr(_TOK_S).alias("t")).select(
        "doc_id",
        F.size("t").cast("long").alias("n_tok"),
        F.expr(
            f"CASE WHEN size(t) >= {seg} THEN "
            f"transform(sequence(0, size(t) div {seg} - 1), "
            f"i -> array_join(slice(t, i * {seg} + 1, {seg}), ' ')) "
            f"ELSE array() END"
        ).alias("segs"),
    )
    if BOILER_BASE_CACHE == "persist":
        # two consumers (hash stream + apply join) — cache so the
        # tokenize/segment pass runs once (r7 rule; A/B'd in r15)
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    # (doc_id, h) pair stream has two consumers (the df count and the
    # hits join) — persisted columnar/evictable so the segment hashes
    # compute once (r7 cache rule: same projection, no distinguishing
    # pushdown)
    ph = (
        base.select(
            "doc_id",
            F.explode(
                F.expr("array_distinct(transform(segs, s -> md5(s)))")
            ).alias("h"),
        )
        .repartition(F.col("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bad = (
        ph.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DOCS)
        .select("h")
    )
    hits = ph.join(bad, "h").groupBy("doc_id").agg(
        F.collect_set("h").alias("bad_list")
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            "segs",
            F.expr(
                "CASE WHEN bad_list IS NULL THEN segs "
                "ELSE filter(segs, s -> NOT array_contains(bad_list, md5(s))) "
                "END"
            ).alias("kept"),
        )
        .select(
            "doc_id",
            F.size("segs").cast("long").alias("n_segs"),
            (F.size("segs") - F.size("kept")).cast("long").alias("n_removed"),
            (F.size("kept") * seg + F.col("n_tok") % seg)
            .cast("long")
            .alias("kept_tokens"),
            F.md5(F.array_join("kept", " ")).alias("cleaned_digest"),
        )
    )


@register(
    "text_bigram_surprisal",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOK_D} AS toks FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
  FROM t WHERE len(toks) >= 2
),
p AS (
  SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS n_pair FROM bg GROUP BY 1, 2
),
pref AS (
  SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_pref FROM p GROUP BY w1
),
sc AS (
  SELECT g.doc_id,
         CAST(length(bin(CAST(f.n_pref AS BIGINT)))
              - length(bin(CAST(p.n_pair AS BIGINT))) AS BIGINT) AS sbits
  FROM bg g
  JOIN p ON g.b.w1 = p.w1 AND g.b.w2 = p.w2
  JOIN pref f ON g.b.w1 = f.w1
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(sbits) AS BIGINT) AS sum_surprisal_bits,
       CAST(SUM(sbits) AS DOUBLE) / COUNT(*) AS mean_surprisal_bits
FROM sc
GROUP BY doc_id
""",
    tags=("text", "lm", "perplexity-proxy", "llm"),
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM-LM PERPLEXITY SCORING — the APPLY half of
    ``text_bigram_lm`` (train/apply symmetry, like kmeans→assign and
    BPE train→encode): every document is scored under the corpus's
    own bigram model, surprisal of each adjacent pair quantized to
    integer bits as bits(n_prefix) − bits(n_pair) =
    ⌊log2 n_prefix⌋ − ⌊log2 n_pair⌋ ≈ −log2 P(w2|w1). High mean
    surprisal = improbable word transitions — the KenLM-perplexity
    axis a quality filter ranks on, with the same integer-exact
    quantization convention as ``text_unigram_rarity`` (no libm
    ``log``, bit-identical cross-engine).

    Scale shape: the corpus tokenizes exactly twice (once to build
    the pair-count table, once to score); the prefix table derives
    from the VOCAB-SIZED pair table, never a third corpus pass. Both
    count tables are Zipf-small, so at 100 TB the scoring joins are
    AQE broadcast candidates; every aggregation is map-side
    combinable."""
    d = _docs(spark, sf_dir)
    bg = (
        d.select("doc_id", F.expr(_TOK_S).alias("toks"))
        .where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    # vocab-sized count table, referenced twice (scoring join + the
    # prefix rollup) — checkpointed so the corpus tokenizes exactly
    # twice, the PMI-collocation convention for small count tables
    p = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .localCheckpoint()
    )
    pref = p.groupBy("w1").agg(F.sum("n_pair").cast("long").alias("n_pref"))
    sc = (
        bg.join(p, ["w1", "w2"])
        .join(pref, ["w1"])
        .select(
            "doc_id",
            (
                F.length(F.expr("bin(n_pref)")) - F.length(F.expr("bin(n_pair)"))
            )
            .cast("long")
            .alias("sbits"),
        )
    )
    return sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("sbits").cast("long").alias("sum_surprisal_bits"),
        (F.sum("sbits").cast("double") / F.count(F.lit(1))).alias(
            "mean_surprisal_bits"
        ),
    )


#: Linear quality-classifier model (fastText-filter shape): integer
#: weights over integer doc features, bias folded in as a feature
#: with constant value 1. Kept as DATA (a weights table), not code —
#: the apply is an unpivot + join + rollup, the same plan a learned
#: model with thousands of features would use.
CLF_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("f_tok", 2),
    ("f_stop", 10),
    ("f_dig", -3),
    ("bias", -60),
)


@register(
    "corpus_classifier_scores",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         CAST(len({_TOK_D}) AS BIGINT) AS f_tok,
         CAST(len(list_filter({_TOK_D},
              x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT) AS f_stop,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS f_dig,
         CAST(1 AS BIGINT) AS bias
  FROM documents
),
unp AS (
  SELECT doc_id, 'f_tok' AS feature, f_tok AS value FROM feats
  UNION ALL SELECT doc_id, 'f_stop', f_stop FROM feats
  UNION ALL SELECT doc_id, 'f_dig', f_dig FROM feats
  UNION ALL SELECT doc_id, 'bias', bias FROM feats
),
w AS (
  SELECT * FROM (VALUES {", ".join(f"('{f}', {wt})" for f, wt in CLF_WEIGHTS)})
  AS t(feature, weight)
)
SELECT u.doc_id,
       CAST(SUM(u.value * w.weight) AS BIGINT) AS score,
       CAST(CASE WHEN SUM(u.value * w.weight) >= 0 THEN 1 ELSE 0 END
            AS BIGINT) AS passed
FROM unp u JOIN w USING (feature)
GROUP BY u.doc_id
""",
    tags=("text", "quality", "classifier", "llm"),
)
def corpus_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR QUALITY-CLASSIFIER APPLY — the fastText/DCLM-style
    learned-filter inference pass, with the model held as a WEIGHTS
    TABLE rather than hard-coded arithmetic: per-doc integer features
    (token count, marker-stopword count, digit-char count, constant
    bias) unpivot to (doc_id, feature, value), join the 4-row model,
    and roll up to the dot-product score and the >= 0 decision. The
    unpivot + model-join + rollup is exactly the plan a real learned
    model with a large sparse feature space would use — swapping in
    trained weights changes data, not the query.

    Scale shape: feature extraction is one codegen'd scan projection;
    the unpivot is a row-local 4x expand; the model join is a
    broadcast against a constant-size table; the rollup re-keys on
    doc_id. Integer features x integer weights keep the score (and
    the decision boundary) bit-identical cross-engine."""
    d = _docs(spark, sf_dir)
    feats = d.select(
        "doc_id",
        F.expr(f"CAST(size({_TOK_S}) AS BIGINT)").alias("f_tok"),
        F.expr(
            f"CAST(size(filter({_TOK_S}, "
            f"x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT)"
        ).alias("f_stop"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", ""))
        )
        .cast("long")
        .alias("f_dig"),
        F.lit(1).cast("long").alias("bias"),
    )
    unp = feats.select(
        "doc_id",
        F.expr(
            "stack(4, 'f_tok', f_tok, 'f_stop', f_stop, "
            "'f_dig', f_dig, 'bias', bias) AS (feature, value)"
        ),
    )
    w = spark.createDataFrame(list(CLF_WEIGHTS), ["feature", "weight"])
    return (
        unp.join(w, "feature")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("value") * F.col("weight")).cast("long").alias("score"),
            F.when(F.sum(F.col("value") * F.col("weight")) >= 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("passed"),
        )
    )


#: Epoch-shuffle geometry: 2 training epochs over 8 loader shards.
SHUFFLE_EPOCHS, SHUFFLE_SHARDS = 2, 8


@register(
    "corpus_epoch_shuffle",
    oracle=f"""
WITH e AS (
  SELECT doc_id, unnest(range(0, {SHUFFLE_EPOCHS})) AS epoch FROM documents
),
h AS (
  SELECT doc_id, epoch,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
              CAST(epoch AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM e
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       doc_id,
       CAST(hv % {SHUFFLE_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY epoch, hv % {SHUFFLE_SHARDS}
         ORDER BY hv, doc_id) AS BIGINT) AS pos_in_shard
FROM h
""",
    tags=("text", "shuffle", "llm", "training"),
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH-SEEDED DETERMINISTIC SHUFFLE — the training-loader
    assignment pass: for each epoch, every document gets a loader
    SHARD (hash mod ``SHUFFLE_SHARDS``) and a POSITION inside that
    shard (rank of the 60-bit md5(doc_id|epoch), doc_id tiebreak).
    Different epochs see independent permutations, every epoch is
    reproducible from the corpus alone (no RNG state to persist), and
    adding a document permutes nothing outside its own shard — the
    three properties a petabyte-scale pretraining loader needs.

    Scale shape: one scan, a 2x epoch explode, and a row_number
    window PARTITIONED BY (epoch, shard) — 16 independent partitions,
    never an Exchange SinglePartition (the packing operator's trap,
    avoided by construction here because positions are per-shard)."""
    d = _docs(spark, sf_dir)
    hv = (
        f"CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '|', "
        f"CAST(epoch AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    h = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))).alias(
            "epoch"
        ),
    ).select("doc_id", "epoch", F.expr(hv).alias("hv"))
    w = Window.partitionBy(
        "epoch", F.expr(f"hv % {SHUFFLE_SHARDS}")
    ).orderBy("hv", "doc_id")
    return h.select(
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        F.expr(f"hv % {SHUFFLE_SHARDS}").cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


#: Per-source token budget for the selection operator.
SELECT_BUDGET_TOKENS = 2000


@register(
    "corpus_budget_selection",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, source,
         CAST(len({_TOK_D}) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({_TOK_D},
              x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT) AS f_stop,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS f_dig
  FROM documents
),
scored AS (
  SELECT doc_id, source, n_tokens,
         2 * n_tokens + 10 * f_stop - 3 * f_dig - 60 AS score
  FROM feats
),
ranked AS (
  SELECT doc_id, source, n_tokens, score,
         SUM(n_tokens) OVER (PARTITION BY source
             ORDER BY score DESC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
       CAST(MIN(score) AS BIGINT) AS cutoff_score,
       CAST(SUM(CAST(n_tokens = 0 AS BIGINT)) AS BIGINT) AS n_empty
FROM ranked
WHERE cum <= {SELECT_BUDGET_TOKENS}
GROUP BY source
""",
    tags=("text", "sampling", "mixing", "llm"),
)
def corpus_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET CORPUS SELECTION — the data-mixing step: within
    each source, rank documents by the linear quality score
    (``corpus_classifier_scores``'s arithmetic) and keep the best
    documents whose RUNNING token total stays inside a fixed
    per-source budget (greedy prefix under a deterministic total
    order — score desc, doc_id tiebreak). Emits per-source
    accounting: docs kept, tokens kept, the score cutoff.

    Scale shape: one scan, then a source-partitioned running-sum
    window (sources are the parallelism unit, no SinglePartition) and
    a source-keyed rollup. Integer scores/token counts make the
    greedy boundary bit-identical cross-engine — the running sum is
    an INTEGER cumsum, exempt from the float segment-tree hazard the
    house rules flag for running aggregates."""
    d = _docs(spark, sf_dir)
    feats = d.select(
        "doc_id",
        "source",
        F.expr(f"CAST(size({_TOK_S}) AS BIGINT)").alias("n_tokens"),
        F.expr(
            f"CAST(size(filter({_TOK_S}, "
            f"x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT)"
        ).alias("f_stop"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", ""))
        )
        .cast("long")
        .alias("f_dig"),
    )
    scored = feats.select(
        "doc_id",
        "source",
        "n_tokens",
        (
            2 * F.col("n_tokens") + 10 * F.col("f_stop") - 3 * F.col("f_dig") - 60
        ).alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.select(
        "source",
        "n_tokens",
        "score",
        F.sum("n_tokens").over(w).alias("cum"),
    )
    return (
        ranked.filter(F.col("cum") <= SELECT_BUDGET_TOKENS)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.sum("n_tokens").cast("long").alias("tokens_selected"),
            F.min("score").cast("long").alias("cutoff_score"),
            F.sum((F.col("n_tokens") == 0).cast("long"))
            .cast("long")
            .alias("n_empty"),
        )
    )


@register(
    "corpus_epoch_packed_shuffle",
    oracle=f"""
WITH e AS (
  SELECT doc_id, CAST(len({_TOK_D}) AS BIGINT) AS n_tokens,
         unnest(range(0, {SHUFFLE_EPOCHS})) AS epoch
  FROM documents
),
h AS (
  SELECT doc_id, n_tokens, epoch,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
              CAST(epoch AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM e
),
r AS (
  SELECT epoch, doc_id, n_tokens, hv % {SHUFFLE_SHARDS} AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY epoch, hv % {SHUFFLE_SHARDS}
           ORDER BY hv, doc_id) AS pos_in_shard,
         SUM(n_tokens) OVER (
           PARTITION BY epoch, hv % {SHUFFLE_SHARDS}
           ORDER BY hv, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM h
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       doc_id,
       CAST(shard AS BIGINT) AS shard,
       CAST(pos_in_shard AS BIGINT) AS pos_in_shard,
       n_tokens,
       CAST((cum - n_tokens) // {PACK_CONTEXT_LEN} AS BIGINT) AS window_id,
       CAST((cum - n_tokens) % {PACK_CONTEXT_LEN} AS BIGINT)
         AS offset_in_window,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (cum - 1) // {PACK_CONTEXT_LEN}
                 - (cum - n_tokens) // {PACK_CONTEXT_LEN} + 1 END
            AS BIGINT) AS windows_spanned
FROM r
""",
    tags=("text", "shuffle", "packing", "llm", "training"),
)
def corpus_epoch_packed_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH SHUFFLE → SHARD-LOCAL PACKING, composed (r10 verdict #5)
    — the actual tensor-feed layout a pretraining loader materializes:
    for every epoch, every document lands in a loader shard at a
    deterministic position (``corpus_epoch_shuffle``'s 60-bit
    md5(doc_id|epoch) assignment), and each shard's token stream is
    independently packed into fixed ``PACK_CONTEXT_LEN``-token windows
    in shuffle order (``corpus_sequence_packing``'s window/offset/span
    arithmetic, applied per (epoch, shard) instead of globally). The
    composition pins the property neither primitive shows alone:
    shard-local packing preserves the global token accounting — per
    epoch, Σ over shards of packed tokens equals the corpus token
    total (the replay pytest's invariant), so no token is dropped or
    double-fed by sharding.

    Scale shape: ONE pass — scan, epoch explode, then a single window
    Exchange PARTITIONED BY (epoch, shard) computing both the position
    rank and the running token cumsum over the same (hv, doc_id)
    order. 2×shards independent partitions, never the global packer's
    SinglePartition trap (per-shard positions make the prefix-offset
    machinery unnecessary here — the partition key IS the parallelism
    unit). All arithmetic BIGINT, so the DuckDB window mirror is a
    hard hash match."""
    d = _docs(spark, sf_dir)
    hv = (
        f"CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '|', "
        f"CAST(epoch AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    h = d.select(
        "doc_id",
        F.expr(f"CAST(size({_TOK_S}) AS BIGINT)").alias("n_tokens"),
        F.explode(F.sequence(F.lit(0), F.lit(SHUFFLE_EPOCHS - 1))).alias(
            "epoch"
        ),
    ).select("doc_id", "n_tokens", "epoch", F.expr(hv).alias("hv"))
    w = Window.partitionBy(
        "epoch", F.expr(f"hv % {SHUFFLE_SHARDS}")
    ).orderBy("hv", "doc_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    L = PACK_CONTEXT_LEN
    g = h.select(
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        F.expr(f"hv % {SHUFFLE_SHARDS}").cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
        "n_tokens",
        F.sum("n_tokens").over(wsum).alias("cum"),
    )
    return g.select(
        "epoch",
        "doc_id",
        "shard",
        "pos_in_shard",
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {L}").cast("long").alias("window_id"),
        ((F.col("cum") - F.col("n_tokens")) % L)
        .cast("long")
        .alias("offset_in_window"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.expr(f"(cum - 1) div {L} - (cum - n_tokens) div {L} + 1")
        )
        .cast("long")
        .alias("windows_spanned"),
    )


#: DSIR geometry: hashed-bigram feature buckets and the target domain
#: whose distribution importance weights are computed against (the
#: fixture's sources are src0..src19; src0 is the deterministic pick).
DSIR_BUCKETS, DSIR_TARGET = 64, "src0"


@register(
    "corpus_dsir_weights",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, {_TOK_D} AS toks FROM documents
),
bg AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i] || '|' || toks[i + 1])) AS g
  FROM t WHERE len(toks) >= 2
),
f AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
           % {DSIR_BUCKETS} AS b
  FROM bg
),
counts AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_r,
         CAST(SUM(CAST(source = '{DSIR_TARGET}' AS BIGINT)) AS BIGINT) AS n_t
  FROM f GROUP BY b
),
tot AS (
  SELECT CAST(SUM(n_r) AS BIGINT) AS r_tot,
         CAST(SUM(n_t) AS BIGINT) AS t_tot
  FROM counts
),
sb AS (
  SELECT b, CAST(length(bin(n_t + 1)) - length(bin(n_r + 1)) AS BIGINT)
           AS sbits
  FROM counts
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(sbits) AS BIGINT) AS sum_sbits
  FROM f JOIN sb USING (b) GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
       CAST(COALESCE(p.sum_sbits, 0) + COALESCE(p.n_feats, 0)
            * (SELECT length(bin(r_tot + {DSIR_BUCKETS}))
                 - length(bin(t_tot + {DSIR_BUCKETS})) FROM tot)
            AS BIGINT) AS weight_bits
FROM documents d LEFT JOIN per p USING (doc_id)
""",
    tags=("text", "sampling", "dsir", "llm", "training"),
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") — the hashed-n-gram
    data-selection pass: every document gets an importance weight
    log(p_target/p_raw) under bag-of-hashed-bigram models of a TARGET
    domain (``DSIR_TARGET``'s documents) vs the raw corpus, with
    Laplace (+1) smoothing over ``DSIR_BUCKETS`` hash buckets. The
    weight feeds a resampling step the registry already carries
    (``corpus_pps_systematic_sample`` / ``corpus_budget_selection``).

    Cross-engine determinism: no libm ``log`` anywhere — the
    per-occurrence log-ratio is quantized to integer BITS exactly as
    ``text_bigram_surprisal`` does (bits(x) = ⌊log2 x⌋ + 1 via binary
    string length): sbits(b) = bits(n_t[b]+1) − bits(n_r[b]+1), plus
    the per-occurrence normalizer bits(R+B) − bits(T+B). Everything
    is BIGINT; the DuckDB mirror is a hard hash match.

    Scale shape: the corpus tokenizes exactly TWICE (the surprisal
    convention) — one pass builds the 64-row bucket count table via a
    single conditional aggregate (n_r and n_t in the same map-side
    combine, so target counting costs no extra pass), one pass scores
    against the broadcast 64-row sbits table. The totals fold is a
    lazy 1-row broadcast (the q22 scalar pattern — no driver collect);
    the per-doc rollup exchanges only (doc_id, sbits) pairs."""
    B = DSIR_BUCKETS
    d = _docs(spark, sf_dir)
    bg = (
        d.select("doc_id", "source", F.expr(_TOK_S).alias("toks"))
        .where(F.size("toks") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> concat(element_at(toks, i), '|', "
                    "element_at(toks, i + 1)))"
                )
            ).alias("g"),
        )
    )
    f = bg.select(
        "doc_id",
        "source",
        F.expr(
            f"CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT) % {B}"
        ).alias("b"),
    )
    counts = f.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_r"),
        F.sum((F.col("source") == DSIR_TARGET).cast("long"))
        .cast("long")
        .alias("n_t"),
    )
    # bucket tables are DSIR_BUCKETS-row by construction; checkpointed
    # so the two consumers (sbits + totals) don't re-run the corpus
    # aggregate (the PMI small-count-table convention)
    counts = counts.localCheckpoint()
    tot = counts.agg(
        F.sum("n_r").cast("long").alias("r_tot"),
        F.sum("n_t").cast("long").alias("t_tot"),
    )
    sb = counts.select(
        "b",
        (
            F.length(F.expr("bin(n_t + 1)")) - F.length(F.expr("bin(n_r + 1)"))
        )
        .cast("long")
        .alias("sbits"),
    )
    per = (
        f.join(F.broadcast(sb), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("sbits").cast("long").alias("sum_sbits"),
        )
    )
    kbits = F.length(F.expr(f"bin(r_tot + {B})")) - F.length(
        F.expr(f"bin(t_tot + {B})")
    )
    return (
        d.select("doc_id", "source")
        .join(per, "doc_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            (
                F.coalesce("sum_sbits", F.lit(0))
                + F.coalesce("n_feats", F.lit(0)) * kbits
            )
            .cast("long")
            .alias("weight_bits"),
        )
    )


@register(
    "text_dup_paragraph_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOK_D} AS t FROM documents
),
segd AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {{seg}} THEN
           list_transform(range(0, CAST(len(t) // {{seg}} AS BIGINT)),
             i -> array_to_string(
               t[CAST(i * {{seg}} + 1 AS INT):CAST(i * {{seg}} + {{seg}} AS INT)],
               ' '))
         ELSE CAST([] AS VARCHAR[]) END AS segs
  FROM toks
)
SELECT doc_id,
       CAST(len(segs) AS BIGINT) AS n_paras,
       CAST(len(segs) - len(list_distinct(segs)) AS BIGINT) AS n_dup_within,
       CAST(COALESCE(list_max(list_transform(list_distinct(segs),
            d -> len(list_filter(segs, s -> s = d)))), 0) AS BIGINT)
         AS top_para_count
FROM segd
""".replace("{seg}", str(PARA_SEG)),
    tags=("text", "quality", "paragraph", "llm"),
)
def text_dup_paragraph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-DOC duplicate-paragraph stats — the Gopher repetition
    rule family's paragraph grain (Rae et al.: "fraction of duplicate
    lines/paragraphs"), complementing the CROSS-doc paragraph family
    (`dedup_paragraph_neardup`) and the 3-gram repetition scorer:
    per document, how many of its 16-token paragraphs are verbatim
    repeats of an earlier paragraph in the SAME document, and the
    multiplicity of its most-repeated paragraph. Degenerate generated
    text (looping decoders, boilerplate spam) scores high here before
    any cross-doc machinery runs.

    Scale shape: the cheapest plan in the family — ONE scan, zero
    shuffles, zero joins: segmentation and both dup counts are
    row-local array expressions (the most-frequent count is an
    O(p²) HOF over a ~dozen-paragraph array, constant per row). At
    100 TB this is a pure map pass a curation run gets for free on
    the same scan as the other per-doc featurizers."""
    seg = PARA_SEG  # dedup.py's paragraph grain — same stand-in (r11 ADVICE)
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.expr(_TOK_S).alias("t"),
    ).select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(t) >= {seg} THEN "
            f"transform(sequence(0, size(t) div {seg} - 1), "
            f"i -> array_join(slice(t, i * {seg} + 1, {seg}), ' ')) "
            f"ELSE array() END"
        ).alias("segs"),
    ).select(
        "doc_id",
        F.size("segs").cast("long").alias("n_paras"),
        (F.size("segs") - F.size(F.array_distinct("segs")))
        .cast("long")
        .alias("n_dup_within"),
        F.coalesce(
            F.expr(
                "array_max(transform(array_distinct(segs), "
                "d -> size(filter(segs, s -> s = d))))"
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("top_para_count"),
    )


#: Fixed BM25 retrieval workload: retrieval needs a query set, and the
#: gate needs a deterministic one, so the queries are data (fixture
#: vocabulary), not user input — the same convention as CLF_WEIGHTS.
BM25_QUERIES: tuple[tuple[str, str], ...] = (
    ("q_hash_join", "hash join table"),
    ("q_stream_window", "stream window batch"),
    ("q_scan_filter", "fast scan filter"),
)
BM25_TOPK = 10


def bm25_scores(d: DataFrame, queries=BM25_QUERIES) -> DataFrame:
    """Per-(query, doc) BM25 scores with k1 = 6/5, b = 3/4 — the
    Robertson/Spärck Jones ranking the RAG retrieval stage
    (``doc_chunk_windows`` feeds chunks; this ranks them) runs before
    a reranker. Everything is exact cross-engine:

    - idf is the Lucene variant log((N + 1)/(df + 0.5)), quantized to
      integer bits as bits(2N + 2) − bits(2df + 1) — the
      ``text_bigram_surprisal`` convention (no libm log), always ≥ 0;
    - the tf-saturation term tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
      is cross-multiplied by 10·T (avgdl = T/N) into a single BIGINT
      ratio: 22·tf·T / (10·T·tf + 3·T + 9·dl·N) — one exact integer
      division per term, bit-identical in both engines;
    - the per-(query, doc) sum over matched terms is the house
      value-sorted fold (deterministic association order).

    Scale shape: postings are filtered to the QUERY VOCABULARY before
    anything shuffles (the isin predicate rides the explode — at
    100 TB only query-term postings move, the inverted-index access
    path expressed declaratively); df is vocab-bounded and broadcast;
    corpus totals are the lazy 1-row broadcast fold. The corpus
    tokenizes exactly twice (stats + postings — the surprisal
    convention). BIGINT headroom: bits·22·tf·T stays under 2^63 up to
    ~10^12 corpus tokens; past that the T factor pair (22·tf·T, 10·T·tf
    + …) would rescale by gcd 2T without changing any ratio."""
    toks = d.select("doc_id", F.expr(_TOK_S).alias("t"))
    return bm25_scores_tokens(toks, queries=queries)


def bm25_scores_tokens(
    toks: DataFrame,
    queries=BM25_QUERIES,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """BM25 scoring over a PRE-TOKENIZED corpus — generic in the
    retrieval-unit key so document grain (``key_cols=('doc_id',)``)
    and chunk grain (``('doc_id', 'chunk_id')``) share the exact
    arithmetic and the inverted-index-shaped plan. ``toks`` carries
    the key columns plus a token-array column ``t``; the unit count,
    df, and average length are all computed at the unit grain."""
    spark = toks.sparkSession
    keys = list(key_cols)
    qvocab = sorted({w for _, qt in queries for w in qt.split()})
    qterms = spark.createDataFrame(
        [(qid, w) for qid, qt in queries for w in sorted(set(qt.split()))],
        ["query_id", "term"],
    )
    tf = (
        toks.select(
            *keys,
            F.size("t").cast("long").alias("dl"),
            F.explode("t").alias("term"),
        )
        .filter(F.col("term").isin(qvocab))
        .groupBy(*keys, "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        # two consumers (df rollup + scoring join) on a postings table
        # already reduced to query-vocabulary terms
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("t")).cast("long").alias("t_tot"),
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            *keys,
            (
                (
                    F.length(F.expr("bin(2 * n_docs + 2)"))
                    - F.length(F.expr("bin(2 * df + 1)"))
                ).cast("long")
                * 22
                * F.col("tf")
                * F.col("t_tot")
            )
            .cast("double")
            .alias("num"),
            (
                F.lit(10) * F.col("t_tot") * F.col("tf")
                + F.lit(3) * F.col("t_tot")
                + F.lit(9) * F.col("dl") * F.col("n_docs")
            ).alias("den"),
        )
        .select("query_id", *keys, (F.col("num") / F.col("den")).alias("c"))
    )
    return contrib.groupBy("query_id", *keys).agg(
        F.expr(
            "aggregate(array_sort(collect_list(c)), 0D, (a, x) -> a + x)"
        ).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )


def _bm25_oracle(queries=BM25_QUERIES, topk: int = BM25_TOPK) -> str:
    vals = ", ".join(f"('{qid}', '{qt}')" for qid, qt in queries)
    qvocab = sorted({w for _, qt in queries for w in qt.split()})
    inlist = ", ".join(f"'{w}'" for w in qvocab)
    return f"""
WITH q(query_id, qtext) AS (VALUES {vals}),
qterms AS (
  SELECT DISTINCT query_id, unnest({tokens_duck('qtext')}) AS term FROM q
),
toks AS (SELECT doc_id, {_TOK_D} AS t FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(t)) AS BIGINT) AS t_tot
  FROM toks
),
posting AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term FROM toks
),
tf AS (
  SELECT doc_id, term, dl, CAST(COUNT(*) AS BIGINT) AS tf
  FROM posting WHERE term IN ({inlist})
  GROUP BY doc_id, term, dl
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(CAST(length(bin(2 * s.n_docs + 2))
                   - length(bin(2 * df.df + 1)) AS BIGINT)
              * 22 * tf.tf * s.t_tot AS DOUBLE)
         / (10 * s.t_tot * tf.tf + 3 * s.t_tot + 9 * tf.dl * s.n_docs) AS c
  FROM tf JOIN qterms qt USING (term) JOIN df USING (term) CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         list_reduce(list_sort(list(c)), (a, b) -> a + b) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, score, n_terms, CAST(rn AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) z
WHERE rn <= {topk}
"""


@register(
    "text_bm25_topk",
    oracle=_bm25_oracle(),
    tags=("text", "retrieval", "bm25", "llm"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} retrieval over the fixed query workload (r11
    verdict #6): the standard sparse-retrieval scorer a RAG pipeline
    runs over the chunk/document store — see :func:`bm25_scores` for
    the exact-integer formulation and the inverted-index-shaped plan.
    Deterministic top-k: score desc, doc_id asc (ties are real — docs
    sharing tf/dl profiles — and the tie-break is part of the
    contract, the ``text_tfidf_top_terms`` convention)."""
    scored = bm25_scores(_docs(spark, sf_dir))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "score", "n_terms", "rank")
    )


def _bm25_chunk_oracle(queries=BM25_QUERIES, topk: int = BM25_TOPK) -> str:
    """DuckDB mirror of :func:`text_bm25_chunk_topk`: the
    ``doc_chunk_windows`` geometry slices each token list into
    overlapping chunks, then the document-grain BM25 pipeline runs
    verbatim with (doc_id, chunk_id) as the retrieval unit."""
    stride = CHUNK_LEN - CHUNK_OVERLAP
    vals = ", ".join(f"('{qid}', '{qt}')" for qid, qt in queries)
    qvocab = sorted({w for _, qt in queries for w in qt.split()})
    inlist = ", ".join(f"'{w}'" for w in qvocab)
    return f"""
WITH q(query_id, qtext) AS (VALUES {vals}),
qterms AS (
  SELECT DISTINCT query_id, unnest({tokens_duck('qtext')}) AS term FROM q
),
toks AS (SELECT doc_id, {_TOK_D} AS t FROM documents),
tn AS (
  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks WHERE len(t) > 0
),
ks AS (
  SELECT doc_id, t, n,
         unnest(generate_series(0, CAST(
           CASE WHEN n <= {CHUNK_LEN} THEN 0
                ELSE (n - {CHUNK_OVERLAP} - 1) // {stride}
           END AS BIGINT))) AS k
  FROM tn
),
ch AS (
  SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
         t[CAST(k * {stride} + 1 AS BIGINT)
           :CAST(LEAST(k * {stride} + {CHUNK_LEN}, n) AS BIGINT)] AS ct
  FROM ks
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(len(ct)) AS BIGINT) AS t_tot
  FROM ch
),
posting AS (
  SELECT doc_id, chunk_id, CAST(len(ct) AS BIGINT) AS dl, unnest(ct) AS term
  FROM ch
),
tf AS (
  SELECT doc_id, chunk_id, term, dl, CAST(COUNT(*) AS BIGINT) AS tf
  FROM posting WHERE term IN ({inlist})
  GROUP BY doc_id, chunk_id, term, dl
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT qt.query_id, tf.doc_id, tf.chunk_id,
         CAST(CAST(length(bin(2 * s.n_units + 2))
                   - length(bin(2 * df.df + 1)) AS BIGINT)
              * 22 * tf.tf * s.t_tot AS DOUBLE)
         / (10 * s.t_tot * tf.tf + 3 * s.t_tot + 9 * tf.dl * s.n_units) AS c
  FROM tf JOIN qterms qt USING (term) JOIN df USING (term) CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, chunk_id,
         list_reduce(list_sort(list(c)), (a, b) -> a + b) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM contrib GROUP BY query_id, doc_id, chunk_id
)
SELECT query_id, doc_id, chunk_id, score, n_terms, CAST(rn AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id ASC, chunk_id ASC) AS rn
  FROM scored
) z
WHERE rn <= {topk}
"""


@register(
    "text_bm25_chunk_topk",
    oracle=_bm25_chunk_oracle(),
    tags=("text", "retrieval", "bm25", "rag", "chunking", "llm"),
)
def text_bm25_chunk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} retrieval at CHUNK grain (r12 verdict #8) — the
    actual RAG access pattern: the ``doc_chunk_windows`` geometry
    (64-token chunks, 16 overlap) defines the retrieval units, and the
    document-grain scorer runs verbatim over them via
    :func:`bm25_scores_tokens` with key (doc_id, chunk_id) — df,
    unit count, and average length all at chunk grain, postings still
    filtered to the query vocabulary BEFORE any shuffle. The chunk
    slices are a pure map-side pass (tokenize → explode(sequence) →
    slice — no shuffle, no UDF); tie-break score desc, doc_id asc,
    chunk_id asc is part of the contract."""
    d = _docs(spark, sf_dir)
    stride = CHUNK_LEN - CHUNK_OVERLAP
    t = (
        d.select("doc_id", F.expr(_TOK_S).alias("t"))
        .select("doc_id", "t", F.size("t").cast("long").alias("n"))
        .filter(F.col("n") > 0)
    )
    last_k = F.when(
        F.col("n") <= CHUNK_LEN, F.lit(0).cast("long")
    ).otherwise(F.expr(f"(n - {CHUNK_OVERLAP} - 1) div {stride}"))
    chunks = (
        t.select(
            "doc_id",
            "t",
            "n",
            F.explode(
                F.sequence(F.lit(0).cast("long"), last_k)
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr(
                f"slice(t, chunk_id * {stride} + 1, "
                f"least(chunk_id * {stride} + {CHUNK_LEN}, n) "
                f"- chunk_id * {stride})"
            ).alias("t"),
        )
    )
    scored = bm25_scores_tokens(chunks, key_cols=("doc_id", "chunk_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc(), F.col("chunk_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "chunk_id", "score", "n_terms", "rank")
    )
