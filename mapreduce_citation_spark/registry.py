"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``,
- an equivalent DuckDB ANSI-SQL oracle (or ``None`` for genuinely
  non-SQL-expressible ops, which get the weaker rows-only check),
- whether it belongs to the bench headline set.

``__spark_entry__.py`` and ``bench.py`` are thin views over this
module. Column names are part of the contract: the driver hash-compares
Spark vs DuckDB results after sorting columns by name, so the Spark
DataFrame and the oracle SQL must alias every computed column
identically.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None
    bench: bool = False
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}

#: Modules whose import populates the registry.
_QUERY_MODULES = (
    "mapreduce_citation_spark.operators.citation_queries",
    "mapreduce_citation_spark.operators.relational",
    "mapreduce_citation_spark.operators.windows",
    "mapreduce_citation_spark.operators.joins",
    "mapreduce_citation_spark.operators.stats",
    "mapreduce_citation_spark.operators.graph",
    "mapreduce_citation_spark.operators.events",
    "mapreduce_citation_spark.operators.dedup",
    "mapreduce_citation_spark.operators.similarity",
    "mapreduce_citation_spark.operators.text",
    "mapreduce_citation_spark.operators.multimodal",
    "mapreduce_citation_spark.operators.streaming_queries",
    "mapreduce_citation_spark.operators.tpch_extra",
    "mapreduce_citation_spark.operators.pipeline",
    "mapreduce_citation_spark.operators.mining",
    "mapreduce_citation_spark.operators.dq",
)

#: Explicit ordering of the registry's public view. External checkers
#: that sample a prefix of ``queries()`` must see every operator
#: family, so the north-star surface (citation + SURVEY §2 scalars +
#: LLM-pipeline dedup/similarity/text/multimodal/events/graph/stats +
#: the custom-operator showcases) is pinned to the first 50 slots.
#: Names not listed here follow in registration order; names listed
#: here but not (yet) registered are skipped.
_PRIORITY = (
    # SURVEY §2: the reference's citation pipeline.
    "citation_counts",
    "top_cited",
    "citing_papers",
    # SURVEY §2.2 scalar functions.
    # (r5 rotation: scalar_datetime_funcs → beyond-window; r6b:
    # scalar_math_funcs follows — the scalar family stays represented
    # by scalar_string_funcs.)
    "scalar_string_funcs",
    # Core relational representatives (r6b rotation:
    # q3_shipping_priority → beyond-window, still benched +
    # full-sweep-gated; the agg family stays via q1, and the join+topk
    # shape is covered by the join block below).
    "q1_pricing_summary",
    # r6b NEW capabilities joining the window (all-or-nothing swap —
    # out: scalar_math_funcs, q3_shipping_priority, dedup_simhash_pairs,
    # knn_pq_ann, text_unigram_rarity, multimodal_decode_features,
    # corpus_mixture_weights; every displaced family keeps an in-window
    # representative, see each block's comment):
    "basket_brand_pairs",
    # r6c NEW capabilities joining the window (all-or-nothing swap —
    # out: multimodal_audio_fp_pairs, knn_lsh_ann,
    # streaming_stream_stream_funnel, stats_percentiles,
    # doc_winnowing_fingerprints, join_hot_key_salted,
    # text_tfidf_top_terms, citation_components; every displaced
    # family keeps an in-window representative, see each block):
    "multimodal_audio_minhash_pairs",
    "citation_link_prediction",
    "streaming_funnel_left_outer",
    "events_daily_acf",
    "embedding_power_iteration",
    "layout_zorder_stats",
    "text_pmi_collocations",
    "citation_label_propagation",
    # r6c SECOND batch (all-or-nothing swap — out: citation_pagerank
    # (gate mode; the fixed-point scale mode stays), citation_triangles,
    # orders_retention_cohorts, dedup_substring_spans,
    # multimodal_ingest_stats, text_lang_id, knn_brute_cosine,
    # streaming_session_counts, events_scd2_history,
    # embedding_kcenter_coreset, join_partition_pruned; every displaced
    # family keeps an in-window representative, see each block):
    "citation_hits",
    "events_trailing_rates",
    "stats_ks_two_sample",
    # (r7 rotation, all-or-nothing swap — out: citation_bfs_depths
    # (graph stays via link prediction, LPA, HITS, pagerank-scale) and
    # events_holt_forecast (forecast/timeseries stays via daily_acf +
    # trailing_rates; holt remains full-sweep-gated); in: the two
    # families the window never carried — dq (the single-pass
    # integrity audit, reworked this round to one scan per table) and
    # the relational-shape block (pivot as its representative). The
    # family-coverage invariant is now pinned by
    # tests/test_registry.py::test_priority_window_covers_every_family.)
    "warehouse_integrity_audit",
    "pivot_status_by_priority",
    # (r7 second batch, all-or-nothing swap — in: the round's three
    # new capabilities, so they are driver-gated like every prior
    # round's additions: text_bpe_encode (tokenizer APPLY),
    # warehouse_delete_cascade (GDPR cascade pre-flight),
    # streaming_cumulative_users (fifteenth live family, first-touch
    # identity state). Out: events_snapshot_diff (the dimension-
    # history axis stays via events_scd2-family full-sweep gating and
    # CDC twins), events_pattern_sequences (sequence mining stays
    # full-sweep-gated; events keeps 4 in-window reps), dedup_clusters
    # (dedup keeps exact/minhash/cosine/substring/decontamination —
    # clusters remains the funnel's dependency and full-sweep-gated).)
    "text_bpe_encode",
    "warehouse_delete_cascade",
    "streaming_cumulative_users",
    "events_survival_km",
    "events_user_features",
    "interval_overlap_join",
    "embedding_pca_scores",
    "text_bpe_merges",
    # (r6c: multimodal_audio_fp_pairs → beyond-window — the audio
    # dedup family stays via the stronger gram-sketch
    # multimodal_audio_minhash_pairs; the pigeonhole Hamming pairing
    # stays in-window via multimodal_phash_pairs. r6c second batch:
    # embedding_kcenter_coreset → beyond-window (embedding selection
    # stays via kmeans + power iteration + the PCA apply),
    # citation_triangles → beyond-window (graph stays via LPA, link
    # prediction, HITS, BFS, pagerank-scale), events_scd2_history →
    # beyond-window (the dimension-history axis stays via
    # events_snapshot_diff).)
    "join_bloom_prefilter",
    # LLM-pipeline: deduplication — every family in-window, including
    # the full suffix-array-style substring trio and decontamination.
    # (r5 rotation: dedup_ngram_jaccard — minhash's ground-truth twin
    # — moved beyond-window to make room.)
    "dedup_exact",
    "dedup_minhash_lsh",
    # (dedup_simhash / knn_brute_cosine_pandas: beyond-window — their
    # stronger siblings stay. r6b: dedup_simhash_pairs also rotates
    # beyond-window — the pigeonhole Hamming-pairing strategy stays
    # in-window via multimodal_phash_pairs/audio_fp_pairs, which share
    # its block-join machinery.)
    "dedup_embedding_cosine",
    # (r6 rotation: dedup_substring_strip → beyond-window — the
    # substring family stays represented by pairs + spans +
    # decontamination; multimodal_phash_pairs joins the window so the
    # new image near-dup capability is driver-gated.)
    "dedup_exact_substring_pairs",
    # (r6c second batch: dedup_substring_spans → beyond-window — the
    # substring family stays via pairs + decontamination.)
    "decontaminate_eval_overlap",
    # LLM-pipeline: similarity search (all four ANN strategies) +
    # clustering (r5b: embedding_kmeans joins the window — a new
    # family: fixed-point Lloyd's with a hash-exact oracle; in
    # exchange stats_correlation rotates beyond-window, the stats
    # family staying represented by percentiles + approx).
    # (r5 rotation: embedding_label_stats → beyond-window.)
    # (r6b: knn_pq_ann → beyond-window — ANN stays represented by
    # brute + LSH + IVF; PQ remains benched + full-sweep-gated.)
    # (r6c: knn_lsh_ann → beyond-window — ANN stays via brute + IVF,
    # and the sign-LSH banding strategy stays in-window via
    # dedup_embedding_cosine, which shares its band machinery;
    # embedding_power_iteration joins above. Second batch:
    # knn_brute_cosine follows — ANN stays via IVF, brute remains
    # benched + full-sweep-gated.)
    "knn_ivf_ann",
    "embedding_kmeans",
    # LLM-pipeline: text analysis.
    # (r5 rotation: doc_fingerprint / token_count_regex →
    # beyond-window — winnowing and token_stats cover those families;
    # unigram rarity joins the window.)
    # (r6b: text_unigram_rarity → beyond-window; the text family
    # stays represented by the four below + text_bpe_merges above.)
    "text_token_stats",
    "text_quality_scores",
    # (r6c second batch: text_lang_id → beyond-window — the text
    # family stays via token_stats/quality/bpe/pmi; lang-ID remains
    # full-sweep-gated with its confusion-matrix pipeline twin.)
    # (r6c: text_tfidf_top_terms and doc_winnowing_fingerprints →
    # beyond-window — the text family stays via token_stats/quality/
    # lang_id/bpe + the new text_pmi_collocations; winnowing remains
    # full-sweep-gated with its pairing twin.)
    # LLM-pipeline: end-to-end compositions (r6b:
    # corpus_mixture_weights → beyond-window; the pipeline family
    # stays via pipeline_filter_funnel).
    "pipeline_filter_funnel",
    # LLM-pipeline: multimodal plumbing + image near-dup (r6:
    # multimodal_phash_pairs joins the window; r6b:
    # multimodal_decode_features → beyond-window — the codec loop
    # stays represented by ingest + phash + the new audio pairs).
    # (r6c second batch: multimodal_ingest_stats → beyond-window —
    # the multimodal family stays via phash pairs + the audio
    # gram-sketch.)
    "multimodal_phash_pairs",
    # Event analytics (batch twins of the streaming surface).
    # (r5 rotation: events_json_struct → beyond-window with its
    # sibling events_json_props. r6: events_tumbling_hourly →
    # beyond-window — the tumbling family stays represented by
    # streaming_tumbling_counts, its live twin; the r5b analytics
    # family gets its first in-window representative,
    # orders_retention_cohorts.)
    # (r6c second batch: orders_retention_cohorts → beyond-window —
    # the cohort/lifecycle family stays via events_survival_km.)
    # (r6b second micro-swap: events_session_window → beyond-window —
    # the session family stays via sessionize_events +
    # streaming_session_counts; the custom python DataSource connector
    # joins the window so the new connector capability is driver-gated.)
    "citation_counts_datasource",
    # (r5b rotation: events_funnel_join → beyond-window — the funnel
    # family stays represented by streaming_stream_stream_funnel;
    # join_partition_pruned joins the window so the DPP capability is
    # driver-gated alongside the bucketed warehouse join.)
    # (r6c second batch: join_partition_pruned → beyond-window — the
    # join family stays via bloom prefilter, bucketed, hot-key AQE,
    # z-order, and the interval-overlap join; DPP remains benched +
    # full-sweep-gated with its flat twin.)
    # Structured Streaming, driver-visible: six live families in the
    # window (three more — CDC compaction, stream-static join, sliding
    # windows — are registered beyond it, full-sweep-gated) —
    # windowed agg, session windows, stateful dedup, kafka-shaped
    # source, stream-stream join, custom applyInPandasWithState.
    "streaming_tumbling_counts",
    # (r6c second batch: streaming_session_counts → beyond-window —
    # the session family stays via sessionize_events, and five live
    # families remain in-window.)
    "streaming_dedup_watermark",
    "streaming_kafka_topic_counts",
    # (r6c: streaming_stream_stream_funnel → beyond-window — the
    # stream-stream join family stays via the LEFT OUTER variant
    # above, a strictly richer state machine over the same
    # funnel_join core; the inner funnel remains full-sweep-gated.)
    "streaming_running_user_counts",
    # Graph / iterative: gate mode + the fixed-point scale mode.
    # (r6c second batch: citation_pagerank (gate mode) →
    # beyond-window — the pagerank family stays via the fixed-point
    # scale mode, which is the benched at-scale strategy.)
    "citation_pagerank_scale",
    # (r6c: citation_components → beyond-window — connectivity/
    # community coverage stays via pagerank + triangles +
    # citation_label_propagation; components remains
    # full-sweep-gated with its union-find pytest.)
    # Statistics.
    # (r5 rotation: stats_variance → beyond-window; r5b:
    # stats_correlation follows it, making room for embedding_kmeans.)
    # (r6c: stats_percentiles → beyond-window — the stats family
    # stays via stats_approx, whose claims gate the sketch
    # percentiles against exact ranks in the same query.)
    "stats_approx",
    # Custom-operator showcases + the engine-level bench pairs.
    # (r5 rotation: window_topk_per_group and join_salted_skew →
    # beyond-window; the skew family is now represented by the
    # stronger hot-key torture pair, and the bucketed warehouse join
    # is driver-gated.)
    "sessionize_events",
    "asof_join_events_orders",
    "join_bucketed_fact_fact",
    "join_hot_key_aqe",
    # (r6c: join_hot_key_salted → beyond-window — the skew family
    # stays via join_hot_key_aqe; the salted twin remains benched +
    # full-sweep-gated, the q3 rotation framing.)
)


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            fn=fn, oracle=oracle, bench=bench, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — skip, but only
            # for the query module itself, never for real import errors.
            if e.name != mod:
                raise


def all_specs() -> dict[str, QuerySpec]:
    _load()
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


#: Fine-grained relational-shape demo tags that roll up into ONE
#: family for window-representation purposes: each is a single
#: showcase query (pivot/unpivot/setop/...), and the window carries
#: one representative for the whole block.
_SHAPE_TAGS = frozenset(
    {"array", "distinct", "pivot", "sort", "sql", "struct", "unpivot",
     "setop"}
)

#: Size of the prefix of ``queries()`` external checkers sample.
WINDOW = 50


def family_of(spec: QuerySpec) -> str:
    """The operator family a spec belongs to: its first tag, with the
    relational-shape showcase tags coalesced into one family."""
    t = spec.tags[0] if spec.tags else "untagged"
    return "relational-shape" if t in _SHAPE_TAGS else t


def missing_families(window_names: list[str] | None = None) -> set[str]:
    """Families with NO representative in the priority window — must
    be empty: the driver gates only a prefix of ``queries()``, so a
    rotation that drops a family's last in-window member silently
    removes that family from per-round correctness evidence."""
    specs = all_specs()
    names = list(specs) if window_names is None else window_names
    in_window = {family_of(specs[n]) for n in names[:WINDOW] if n in specs}
    return {family_of(s) for s in specs.values()} - in_window


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_specs().items() if s.bench}
