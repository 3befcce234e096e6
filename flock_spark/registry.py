"""Query registry: every implemented operator registers a named entry with a
Spark callable and (when SQL-expressible) a DuckDB oracle SQL string.

This is the package's parity ledger against SURVEY.md §2 — the driver compares
each callable's result with its oracle on identical parquet inputs
(row count + schema + order-insensitive value hash).

Conventions that keep the hash comparison stable across engines:
- every computed column is aliased identically in Spark and oracle SQL;
- order-dependent float aggregates (SUM/AVG over doubles) are rounded on both
  sides (per-row arithmetic like ``value * 0.908`` is IEEE-deterministic and
  left unrounded);
- string→int64 hashing uses md5 prefixes, which both engines compute
  identically (see operators/hashing.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# ---------------------------------------------------------------------------
# Driver-evidence slate.
#
# The external correctness driver grades the FIRST 50 entries of queries() /
# oracle_sql() in iteration order, every round. Registration order is module
# import order, which left whole families (streaming, TPC-H, NEXMark-native,
# every LLM-pipeline operator) past the window in rounds 1-2. DRIVER_SLATE is
# the explicit, curated ordering lever: the named entries are emitted first,
# in this order; everything else follows in registration order.
#
# Rotation policy (manifest in COVERAGE.md "Driver-evidence rotation"):
# each round, entries already driver-certified in a previous round rotate OUT
# of the slate and never-driver-tested entries rotate IN, until the cumulative
# driver-green set covers the whole registry. A handful of cheap canaries from
# the certified §2.2-§2.8 core stay in front to catch regressions; the slate
# is otherwise ordered cheap-first so a budget-based driver cap would still
# maximize covered families. Every slated entry costs <8 s in
# `tools/sweep_sim.py --plain` at sf0.01 (pinned by tests/test_registry.py).
# ---------------------------------------------------------------------------
DRIVER_SLATE: tuple[str, ...] = (
    # --- round-8 slate ---
    # Applied from the committed r8 draft (COVERAGE.md "Committed r8 slate
    # draft", drafted at the end of round 6) with the pool recomputed at
    # application time per the draft's own instruction: CORRECTNESS_r07 was
    # 50/50 green (no re-cert slots owed), pool = 77 never-driver-tested.
    # 2 canaries + the draft's 47 (mm_resize_stub now replaced by the real
    # mm_resize_nearest) + items_cooccurrence_jaccard (displaced twice,
    # r7 and r8 drafts) = 50. Cheap-first; the 4 stateful-streaming heavies
    # and pyds_custom_sink_roundtrip sit at the tail interleaved with cheap
    # multimodal entries so no two drain-heavy entries are adjacent.
    "proj_arith",
    "join_inner",
    # SQL surface x6
    "sql_udf_scalar",
    "sql_script_batch",
    "session_variable_param",
    "parameterized_sql_query",
    "unpivot_melt_wide",
    "sql_group_by_all",
    # agg/scan leftovers x8
    "json_extract_props",
    "array_hof_funcs",
    "grouping_sets_agg",
    "rollup_two_level",
    "schema_evolution_merge_read",
    "parquet_zstd_roundtrip",
    "scan_file_provenance_audit",
    "maintenance_file_skipping_plan",
    # analytics x6
    "analytics_pareto_frontier",
    "analytics_ols_trend",
    "table_skew_audit",
    "events_equidepth_histogram",
    "table_referential_integrity_audit",
    "events_funnel_time_to_convert",
    # events/anomaly x3
    "events_attribution_touch_matrix",
    "anomaly_zscore_flags",
    "agg_approx_percentile_audit",
    # privacy x2
    "privacy_dp_histogram",
    "privacy_l_diversity",
    # LLM pipeline x4
    "dedup_line_hash_boilerplate",
    "text_hashed_linear_quality",
    "corpus_weighted_bottomk_sample",
    "timeseries_seasonal_baseline",
    # recsys x1 (displaced from both the r7 and r8 drafts; gets in now)
    "items_cooccurrence_jaccard",
    # sketches x2
    "kmv_bottomk_distinct_merge",
    "cms_join_cardinality_estimate",
    # geo x2
    "geo_radius_cell_join",
    "geo_grid_density_heatmap",
    # graph x2
    "graph_bfs_layers",
    "graph_label_prop_communities",
    # joins x1
    "join_runtime_bloom_filter",
    # pyds batch source x1
    "pyds_custom_source_agg",
    # tail: streaming/drain heavies interleaved with cheap multimodal
    "mm_jpeg_header_dims",
    "streaming_stream_stream_left_outer",
    "mm_wav_header_audio",
    "streaming_pyds_source_agg",
    "mm_frame_index",
    "streaming_attribution_last_touch",
    "mm_frame_sample",
    "streaming_session_state_timeout",
    "mm_resize_nearest",
    "pyds_custom_sink_roundtrip",
)

# Cumulative driver-certified entries (green CORRECTNESS row in some round,
# never red afterwards; regenerated each round from CORRECTNESS_r*.json).
# Drives the rotation policy: slate slots go to names NOT in this set, and
# family coverage is asserted over slate ∪ certified.
CERTIFIED_GREEN: frozenset[str] = frozenset((
    # round-7 greens (CORRECTNESS_r07: 50/50; the 48 new plus 2 canaries
    # already present below)
    "agg_collect_sorted", "text_inverted_index", "embedding_normalize_quantize",
    "embedding_label_centroids", "recursive_cte_hierarchy", "variant_json_shred",
    "pipe_syntax_funnel", "udtf_table_arg_sessionize", "stagger_window_agg",
    "streaming_stagger_window", "events_watermark_lateness_audit",
    "streaming_dedup_within_watermark", "streaming_q13_side_input",
    "streaming_pattern_kleene", "dedup_containment_pairs",
    "dedup_incremental_new_batch", "dedup_keep_best_quality",
    "dedup_lsh_recall_audit", "dedup_chunk_shared", "doc_chunk_content_defined",
    "pipeline_quality_dedup_stats", "corpus_cluster_sample_weights",
    "mm_header_dims", "mm_phash_near_dup", "mm_scene_cut_detect",
    "mm_dedup_clusters", "tokenizer_bpe_apply", "tokenizer_wordpiece_greedy",
    "corpus_filter_funnel", "corpus_ngram_diversity",
    "corpus_contamination_overlap", "ivm_agg_delta", "ivm_distinct_delta",
    "hll_intersect_estimate", "cms_heavy_hitters_screen",
    "graph_modularity_audit", "asof_join_nearest", "asof_join_tolerance",
    "events_ab_test_zstat", "anomaly_mad_flags", "table_snapshot_drift",
    "agg_spearman_rank_corr", "privacy_t_closeness", "join_interval_overlap",
    "join_null_safe_eq", "agg_mode_deterministic", "window_nth_cume",
    "csv_corrupt_tolerant_read",
    # rounds 1-6
    "agg_basic", "agg_count_distinct", "agg_having", "agg_percentiles",
    "agg_salted_two_stage", "agg_stats_exact", "agg_string_concat",
    "ann_ivf_recall_audit", "ann_ivf_topk", "ann_ivfpq_topk",
    "ann_lsh_buckets", "ann_lsh_topk", "ann_pq_adc_topk",
    "ann_topk_bruteforce", "approx_count_distinct_hll",
    "arrow_grouped_minmax", "asof_join_pandas", "asof_join_window",
    "bloom_filter_portable", "bloom_membership_probe",
    "bloom_semijoin_reduction", "bucketed_colocated_join", "case_when",
    "cdc_snapshot_asof", "cdc_upsert_latest", "cms_merge_shards",
    "cms_point_query", "corpus_bigram_counts",
    "corpus_cross_source_dup_matrix", "corpus_decontaminate",
    "corpus_lang_quality_buckets", "corpus_lm_score_proxy",
    "corpus_pack_sequences", "corpus_quality_resample",
    "corpus_repetition_stats", "corpus_sample_deterministic",
    "corpus_sample_per_group", "corpus_shuffle_shards",
    "corpus_split_leakage_safe", "corpus_split_stratified",
    "corpus_temperature_mix", "corpus_vocab_topk", "correlated_exists",
    "countmin_sketch_portable", "csv_roundtrip_scan", "cube_agg",
    "date_funcs", "dedup_clusters", "dedup_clusters_star",
    "dedup_drop_duplicates", "dedup_embedding_cosine", "dedup_exact",
    "dedup_exact_normalized", "dedup_jaccard_threshold_curve",
    "dedup_minhash_estimate_vs_exact", "dedup_minhash_lsh_pairs",
    "dedup_minhash_signatures", "dedup_multi_signal_clusters",
    "dedup_ngram_jaccard", "dedup_semdedup_prune", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_substring_spans", "distinct_select",
    "doc_chunk_fixed_tokens", "dpp_star_join",
    "embedding_nearest_centroid", "embedding_power_iteration_pc",
    "events_cumulative_unique_users", "events_cusum_drift",
    "events_funnel_steps", "events_max_active_streak",
    "events_pattern_3step", "events_pattern_kleene",
    "events_retention_cohorts", "events_rfm_segments",
    "events_transition_matrix", "events_value_histogram", "filter_complex",
    "filter_mod", "graph_kcore_peel", "graph_pagerank_two_iter",
    "graph_triangle_count", "hdr_quantile_merge_shards",
    "hdr_quantile_sketch", "hll_merge_shards", "hll_sketch_portable",
    "hll_sliding_window_distinct", "hopping_window_agg", "ivm_join_delta",
    "join_anti", "join_broadcast_dim", "join_cross", "join_full_outer",
    "join_fuzzy_levenshtein", "join_global_max", "join_inequality_only",
    "join_inner", "join_left_outer", "join_range_binned",
    "join_range_theta", "join_salted", "join_self_agg_max", "join_semi",
    "json_wire_corrupt_tolerant", "json_wire_decode",
    "kmeans_two_iterations", "math_funcs", "mm_audio_window_energy",
    "mm_byte_histogram", "mm_meta_extract", "mm_phash64",
    "nexmark_gen_bid", "nexmark_gen_person_auction", "nexmark_native_q3",
    "nexmark_native_q4", "nexmark_native_q6", "nexmark_native_q7",
    "nexmark_native_q8", "nexmark_native_q9", "nexmark_q0_passthrough",
    "nexmark_q10_date_format", "nexmark_q11_session_bids",
    "nexmark_q12_proctime_tumble", "nexmark_q13_side_input",
    "nexmark_q1_currency", "nexmark_q2_mod_filter",
    "nexmark_q3_join_filter", "nexmark_q4_avg_of_max",
    "nexmark_q5_hot_items", "nexmark_q6_double_rownum",
    "nexmark_q7_max_per_window", "nexmark_q8_sellers",
    "nexmark_q9_winning_bids", "pandas_udaf_weighted_mean",
    "partitioned_write_prune_scan", "pivot_agg", "privacy_k_anonymity",
    "proj_arith", "queue_sink_exactly_once", "rollup_agg",
    "rollup_reuse_daily", "scd2_validity_join",
    "session_custom_gap_pandas", "session_window_agg",
    "session_window_by_key", "set_except", "set_intersect",
    "set_union_all", "side_input_csv_join", "sort_global_range",
    "sort_limit_topk", "sort_multi_col",
    "streaming_cdc_upsert_foreachbatch", "streaming_dedup_ingest",
    "streaming_elementwise_filter", "streaming_hopping_agg",
    "streaming_kafka_wire_decode", "streaming_nexmark_native_q3",
    "streaming_nexmark_native_q7", "streaming_nexmark_q1",
    "streaming_ohlc_daily", "streaming_pattern_3step",
    "streaming_proctime_agg", "streaming_q5_foreachbatch",
    "streaming_scd2_enrich", "streaming_session_foreachbatch",
    "streaming_session_native", "streaming_stateful_running_count",
    "streaming_stream_stream_join", "streaming_tumbling_agg",
    "string_funcs", "subquery_in", "subquery_scalar",
    "table_quality_checks", "text_bm25_doc_ranking", "text_fingerprint",
    "text_langid", "text_oov_rate", "text_pii_redact",
    "text_quality_score", "text_rake_keywords", "text_tfidf_topk_terms",
    "text_token_stats", "text_token_stats_bpe", "timeseries_ewma_shifts",
    "timeseries_gapfill_locf", "timeseries_ohlc_daily",
    "tokenizer_bpe_merge_step", "tpch_q1", "tpch_q10", "tpch_q11",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q20", "tpch_q21", "tpch_q22",
    "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q9", "tumbling_daily_distinct", "tumbling_window_agg",
    "udtf_long_tokens", "window_first_last", "window_frame_moving_avg",
    "window_lag_lead", "window_ntile_pct", "window_percentiles",
    "window_range_frame_sum", "window_rank_dense", "window_rownum_topk",
    "window_running_sum", "ysb_campaign_counts", "zorder_layout_scan",
))


def ordered_names() -> list[str]:
    """Registry keys with the driver slate first, then registration order."""
    _load_all()
    missing = [n for n in DRIVER_SLATE if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_SLATE names not registered: {missing}")
    slated = set(DRIVER_SLATE)
    return list(DRIVER_SLATE) + [n for n in REGISTRY if n not in slated]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import all query/operator modules so their @register calls run."""
    import flock_spark.queries  # noqa: F401
    import flock_spark.operators  # noqa: F401
    import flock_spark.sources.nexmark_gen  # noqa: F401
    import flock_spark.sources.side_input  # noqa: F401
    import flock_spark.sources.python_datasource  # noqa: F401
    import flock_spark.streaming  # noqa: F401


def get_queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in ordered_names()}


def get_oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in ordered_names()
        if REGISTRY[name].oracle is not None
    }
