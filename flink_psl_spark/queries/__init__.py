"""Named query inventory — the driver-facing correctness surface.

Every operator from SURVEY.md §2 that we implement is exercised by at least
one named query here, each paired (where SQL-expressible) with an ANSI-SQL
oracle that DuckDB executes over the same parquet tables. The driver
hash-compares both sides (CORRECTNESS_r{N}.json).

Modules register themselves into the shared registry on import.
"""

from flink_psl_spark.queries.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    query,
    tables,
)

# registration side effects
import flink_psl_spark.queries.relational  # noqa: F401, E402
import flink_psl_spark.queries.tpch_suite  # noqa: F401, E402
import flink_psl_spark.queries.window_fns  # noqa: F401, E402
import flink_psl_spark.queries.windows_tvf  # noqa: F401, E402
import flink_psl_spark.queries.llm_queries  # noqa: F401, E402
import flink_psl_spark.queries.streaming_queries  # noqa: F401, E402
import flink_psl_spark.queries.cep_queries  # noqa: F401, E402
import flink_psl_spark.queries.cdc_queries  # noqa: F401, E402
import flink_psl_spark.queries.functions_ext  # noqa: F401, E402
import flink_psl_spark.queries.graph_queries  # noqa: F401, E402
import flink_psl_spark.queries.datastream_queries  # noqa: F401, E402

# Driver-visibility ordering: the verify harness checks queries in
# registration order and may truncate (each round checks the first 50),
# so the front of the dict carries the queries with the LEAST prior
# driver evidence.
#
# ROUND-12 rotation (the precomputed seed from the round-11 verdict,
# executed verbatim — CORRECTNESS_r11 was 50/50 green, so the red-row
# contingency does not apply): the oldest remaining driver rows.
# First the 31 r4-era rows left after the r11 window, risk-ordered
# (format/connector roundtrips and DataStream state shapes first),
# then the 19 highest-risk r5-era rows (stateful streaming + token
# contracts first). After this window lands green, no row older than
# r5 remains anywhere in the registry.
_PRIORITY_WINDOW = [
    # 1) r4-era residue: format/connector roundtrips + DataStream state
    "twophase_sink_roundtrip", "avro_schema_evolution",
    "avro_py_nested_roundtrip", "protobuf_py_nested_roundtrip",
    "protobuf_py_map_roundtrip", "temporal_join_sql",
    "group_window_sql", "window_tvf_sql", "datastream_iterate_countdown",
    "datastream_broadcast_join", "datastream_side_output_split",
    "datastream_keyed_sum", "datastream_map_filter", "llm_segment_dedup",
    "llm_contamination_check", "llm_pii_scrub", "llm_curation_pipeline",
    "llm_deterministic_shuffle", "llm_token_budget_mix",
    "llm_temperature_mix", "llm_hard_negatives", "llm_bigram_lm_score",
    "llm_bpe_pair_counts", "bucketed_join_agg", "jdbc_roundtrip_agg",
    "file_compaction_roundtrip", "filesystem_partitioned_roundtrip",
    "metadata_columns_read", "sql_client_script", "sql_gateway_rest",
    "values_inline_rows",
    # 2) 19 r5-era rows by risk (stateful streaming + token contracts)
    "stream_timer_session_agg", "stream_session_agg",
    "stream_cumulate_agg", "stream_doc_quality_ingest",
    "match_recognize_sql_budget_runs", "cdc_upsert_format_image",
    "cumulate_tvf_sql", "tumble_window_offset_agg", "llm_bpe_train_merges",
    "llm_bpe_encode_roundtrip", "llm_bpe_token_count", "llm_text_stats",
    "llm_quality_score", "llm_quality_filter", "llm_quality_classifier",
    "llm_ngram_jaccard_pairs", "llm_rolling_fingerprints",
    "llm_semantic_dedup", "llm_curation_pipeline_v2",
]

# ROUND-13 seed (precomputed, exactly 50): the oldest rows remaining
# after the r12 window — computed this round from the union of
# CORRECTNESS_r{01..11} latest-green rows + the r12 window. After r12,
# exactly 30 r5-era rows remain (everything else is r6+).
# 1) the 30 r5-era rows, risk-ordered (DSv2 source state + UD*F
#    surfaces first): pysource_datagen_agg, pysource_datagen_pushdown,
#    window_dedup, temporal_table_function_sql, udf_pandas_scalar,
#    udaf_pandas_grouped, udtf_lateral, udtaf_top2_per_group,
#    cogroup_user_summary, table_api_row_ops, llm_importance_resample,
#    llm_perplexity_bucket_sample, llm_boilerplate_removal,
#    llm_common_ngrams_per_source, llm_source_quality_report,
#    llm_wav_decode_stats, agg_percentiles, agg_first_last_value,
#    hash_code_fn, string_functions2, string_functions3,
#    math_functions2, temporal_functions2, temporal_overlaps_fn,
#    typeof_fn, encode_decode_fn, array_map_row_fn, json_functions2,
#    passthrough_functions, posexplode_words.
# 2) the 20 oldest r6-era rows (registration order; the r6 refresh of
#    the r1 relational heads): calc_project_filter, q1_pricing_summary,
#    q3_shipping_priority, q6_forecast_revenue, q14_promo_effect,
#    q18_large_volume, agg_distinct, agg_stats, agg_rollup, agg_cube,
#    agg_grouping_sets, agg_listagg, agg_collect, agg_approx_distinct,
#    join_multiway_revenue, join_left_agg, join_full_outer, join_semi,
#    join_anti, join_theta_nonequi.
# If any r12 row comes back red, it takes position 1 of r13 (with its
# family's bisect canaries if it has them) and the seed's tail rolls
# to r14.
#
# Window slots deliberately spent on queries that already have a driver
# row: the re-proof set (staleness refresh of the oldest rows plus the
# red-row re-proof). Every other slot must go to a never-checked query —
# tests/test_registry_rotation.py enforces the partition. The r12
# window is ENTIRELY re-proofs: every never-checked query has been
# checked by r10 (the registry is frozen at 376 and evidence-complete),
# so staleness refresh is the only remaining driver-slot currency.
_REPROOFS = frozenset(_PRIORITY_WINDOW)


def _reorder() -> None:
    ordered = [n for n in _PRIORITY_WINDOW if n in QUERIES]
    # positions 51+: everything else never driver-checked (incl. queries new
    # this round), registration order — round 5's window rotates these in
    driver_checked_tail = [
        n for n in QUERIES
        if n not in ordered and n in _DRIVER_CHECKED
    ]
    middle = [
        n for n in QUERIES
        if n not in ordered and n not in _DRIVER_CHECKED
    ]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for n in [*ordered, *middle, *driver_checked_tail]:
        QUERIES[n] = snapshot[n]


# queries the driver hash-verified green in rounds 1-10
# (∪ CORRECTNESS_r{01..10}.json latest-green rows) — proven surface, so
# they yield their slot in a truncated window.
_DRIVER_CHECKED = frozenset({
    # round 10 (50/50 green — CORRECTNESS_r10.json, the registry's first
    # fully-green round; the 47 staleness re-proofs are already listed
    # under rounds 1-3 — these are the 3 first-time/red-row-cleared rows:
    # llm_bfd_packing green after the HUGEINT oracle CAST, plus the two
    # bisect canaries)
    "llm_bfd_packing", "llm_bfd_token_mass", "llm_bfd_capacity",
    # round 9 (49/50 green — CORRECTNESS_r09.json; the 20 first-time
    # rows. llm_bfd_packing excluded again: red row both r8+r9, now
    # re-proven via the r10 window's slot 1 after the HUGEINT fix;
    # the 29 r9 staleness re-proofs are already listed under round 2)
    "llm_leakage_safe_split", "llm_source_similarity_matrix",
    "llm_sft_pipeline", "llm_hybrid_rrf_topk", "llm_dataset_card",
    "llm_span_corruption", "llm_fim_transform", "stream_validation_ingest",
    "stream_drift_ingest", "stream_bloom_decontaminate_ingest",
    "stream_dataset_fingerprint", "stream_weighted_sample",
    "stream_conversation_assembly", "stream_quality_score_ingest",
    "stream_timeseries_gap_fill", "stream_histogram_quantiles",
    "stream_contract_migration_ingest", "stream_ewma_anomaly",
    "stream_sft_loss_mask", "explain_plan_shape",
    # round 8 (49/50 green — CORRECTNESS_r08.json; llm_bfd_packing
    # excluded: red row, re-proven via the r9 window's slot 1)
    "table_profile_report", "table_validation_report",
    "metric_anomaly_report", "distribution_drift_report",
    "schema_contract_check", "join_size_advisor",
    "dataset_fingerprint_orders", "table_topk_values_report",
    "fuzzy_join_customers", "fuzzy_name_dedup", "zorder_clustering_report",
    "dp_noisy_event_counts", "histogram_quantiles_report",
    "gdpr_delete_sweep", "schema_contract_migration", "market_basket_lift",
    "rfm_customer_segments", "funnel_conversion_report",
    "cohort_retention_matrix", "timeseries_seasonality_report",
    "yoy_revenue_growth", "pareto_abc_classification",
    "timeseries_gap_fill", "timeseries_ewma_anomaly",
    "llm_embedding_outliers", "llm_curriculum_schedule",
    "llm_preference_pairs", "llm_html_extract", "llm_embedding_pca",
    "llm_weighted_sample", "llm_hash_split", "llm_diversity_sample",
    "llm_tfidf_top_terms", "llm_vocab_coverage", "llm_duplicate_spans",
    "llm_text_normalize", "llm_compression_ratio_check",
    "llm_ngram_novelty", "llm_mixed_language_report",
    "llm_span_dedup_rewrite", "llm_cluster_report", "llm_bm25_topk",
    "llm_conversation_assembly", "llm_sft_loss_mask",
    "llm_dedup_keep_best", "llm_cross_corpus_dedup",
    "llm_containment_pairs", "llm_mmr_rerank", "llm_tokenizer_fertility",
    # round 7 (50/50 green — CORRECTNESS_r07.json)
    "session_tvf_sql", "recursive_cte_order_chain",
    "recursive_cte_event_paths", "interval_join_keyless",
    "asof_join_tolerance_forward", "incremental_agg_retract_apply",
    "stream_retract_agg_ingest", "compressed_format_roundtrip",
    "sequence_file_roundtrip", "xml_format_roundtrip",
    "json_corrupt_channel_ingest", "stream_json_corrupt_ingest",
    "stream_multi_sink_fanout", "stream_jdbc_upsert_ingest",
    "math_functions3", "snapshot_diff_changelog", "salted_join_skew",
    "skew_key_report", "scd2_temporal_join", "scd2_dimension_history",
    "stream_scd2_dimension", "file_sizing_report",
    "stream_exact_window_distinct", "stream_online_lsh_dedup",
    "stream_image_dedup_ingest", "hybrid_backfill_union",
    "incremental_partition_refresh", "incremental_join_view_refresh",
    "llm_corpus_overlap_sketch", "stream_corpus_overlap_sketch",
    "join_key_overlap_advisor", "stream_heavy_hitters_ingest",
    "stream_window_distinct_sketch", "llm_trained_quality_classifier",
    "llm_sq_ann_topk", "llm_unigram_train_agreement",
    "llm_unigram_encode_stats", "llm_wordpiece_train_agreement",
    "llm_wordpiece_encode_stats", "llm_kmeans_train_agreement",
    "llm_kneser_ney_score", "llm_naive_bayes_langid",
    "llm_heavy_hitter_ngrams", "llm_bloom_decontamination",
    "llm_image_dhash_dedup", "llm_image_near_dedup",
    "llm_audio_fingerprint_dedup", "llm_video_clip_dedup",
    "kanon_customer_release", "l_diversity_customers",
    # round 6 (50/50 green; the 40 r1-refresh rows are already listed
    # under round 1 below — these are the 10 first-time rows)
    "sum0_timestamp_ltz_fn", "pysource_stream_datagen_agg",
    "pysource_datagen_fields", "jdbc_upsert_roundtrip",
    "filesystem_partition_commit", "datastream_window_agg",
    "try_functions", "ndu_analysis", "llm_semantic_dedup_two_level",
    "llm_pq_ann_topk",
    # round 1
    "calc_project_filter", "q1_pricing_summary", "q3_shipping_priority",
    "q6_forecast_revenue", "q14_promo_effect", "q18_large_volume",
    "agg_distinct", "agg_stats", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_listagg", "agg_collect",
    "agg_approx_distinct", "join_multiway_revenue", "join_left_agg",
    "join_full_outer", "join_semi", "join_anti", "join_theta_nonequi",
    "join_cross", "join_broadcast_dim", "setop_union_all",
    "setop_union_distinct", "setop_intersect", "setop_except",
    "setop_intersect_all", "setop_except_all", "subquery_scalar",
    "subquery_in", "subquery_correlated", "orderby_limit", "explode_words",
    "pivot_event_counts", "string_functions", "math_functions",
    "temporal_functions", "hash_functions", "json_functions",
    "case_conditional", "agg_multiset", "agg_json", "dedup_keep_first",
    "dedup_keep_last", "changelog_normalize", "interval_join_batch",
    "asof_join", "q4_order_priority", "q5_local_supplier_volume",
    "q7_volume_shipping",
    # round 2 (llm_sequence_packing excluded — red row, back in the window)
    "llm_minhash_dedup", "llm_simhash_dedup", "llm_ivf_ann_topk",
    "llm_lsh_ann_topk", "llm_stratified_sample", "agg_hll_sketch",
    "llm_multimodal_features", "llm_dataset_mix", "llm_exact_dedup",
    "llm_dedup_clusters", "llm_cosine_topk", "llm_language_id",
    "llm_embedding_dedup", "salted_agg_skew", "llm_multimodal_stats",
    "llm_repetition_filter", "llm_doc_chunking", "llm_image_decode",
    "llm_frame_sample", "llm_repetition_stats", "llm_audio_stats",
    "stream_keyed_top3", "stream_tumble_agg", "stream_interval_join",
    "stream_running_agg", "stream_event_time_sort", "stream_range_over",
    "stream_window_topn", "stream_lookup_join", "stream_anti_join",
    "stream_count_window", "stream_asof_enrich", "stream_early_fire_agg",
    "stream_allowed_lateness_agg", "stream_count_window_evict",
    "stream_count_window_delta_evict", "cep_clicks_then_purchase",
    "stream_cep_clicks_then_purchase", "cep_error_burst",
    "cep_unconverted_clicks", "cep_session_no_logout_purchase",
    "stream_cep_clean_conversion", "cep_no_conversion_within",
    "cdc_debezium_roundtrip", "cdc_drop_update_before", "cdc_ogg_roundtrip",
    "avro_py_roundtrip", "protobuf_py_roundtrip", "wf_range_frame",
    # round 3
    "cdc_canal_roundtrip", "cdc_maxwell_roundtrip",
    "cep_no_skip_conversion_pairs", "cep_skip_to_first_purchase_chain",
    "cep_skip_to_last_error_runs", "cep_skip_to_next_click_runs",
    "cumulate_window_agg", "graph_adamic_adar",
    "graph_clustering_coefficient", "graph_community_detection",
    "graph_connected_components", "graph_degree",
    "graph_global_clustering", "graph_hits", "graph_jaccard_index",
    "graph_label_propagation", "graph_pagerank", "graph_sssp",
    "graph_summarization", "graph_triadic_census", "graph_triangle_count",
    "graph_vertex_metrics", "hop_window_agg", "llm_sequence_packing",
    "q10_returned_items", "q11_important_stock",
    "q12_shipping_priority_class", "q13_customer_distribution",
    "q15_top_supplier", "q16_part_supplier_count",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q20_potential_promotion", "q21_suppliers_kept_waiting",
    "q22_prospective_customers", "q2_min_cost_supplier",
    "q8_market_share", "q9_product_profit", "session_window_agg",
    "session_window_dynamic_gap", "tumble_window_agg",
    "wf_dataframe_api", "wf_first_last_value", "wf_lag_lead",
    "wf_ntile_percentiles", "wf_rank_dense_rank",
    "wf_running_rows_frame", "wf_topn_per_group", "window_join",
    "window_tvf_projection",
    # round 4
    "async_lookup_enrich", "avro_py_nested_roundtrip",
    "avro_schema_evolution", "bucketed_join_agg",
    "cep_followed_by_nearest", "cep_group_pattern_double_conversion",
    "cep_until_stop_condition", "datastream_broadcast_join",
    "datastream_iterate_countdown", "datastream_keyed_sum",
    "datastream_map_filter", "datastream_side_output_split",
    "file_compaction_roundtrip", "filesystem_partitioned_roundtrip",
    "group_window_sql", "jdbc_roundtrip_agg", "llm_bigram_lm_score",
    "llm_bpe_pair_counts", "llm_contamination_check",
    "llm_curation_pipeline", "llm_deterministic_shuffle",
    "llm_hard_negatives", "llm_pii_scrub", "llm_segment_dedup",
    "llm_temperature_mix", "llm_token_budget_mix",
    "match_recognize_sql_clicks", "match_recognize_sql_price_dip",
    "match_recognize_sql_skip_chain", "metadata_columns_read",
    "protobuf_py_map_roundtrip", "protobuf_py_nested_roundtrip",
    "sql_client_script", "sql_gateway_rest",
    "stream_cep_no_conversion_within", "stream_connect_threshold_filter",
    "stream_current_watermark", "stream_dedup", "stream_hop_agg",
    "stream_interval_join_outer", "stream_rows_over", "stream_semi_join",
    "temporal_join_sql", "twophase_sink_roundtrip", "values_inline_rows",
    "window_tvf_sql",
    # round 5 (all green except try_functions, which is back in the window)
    "pysource_datagen_agg", "pysource_datagen_pushdown",
    "stream_doc_quality_ingest", "llm_curation_pipeline_v2",
    "llm_semantic_dedup", "stream_session_agg", "stream_cumulate_agg",
    "cumulate_tvf_sql", "match_recognize_sql_budget_runs",
    "cdc_upsert_format_image", "tumble_window_offset_agg",
    "llm_text_stats", "llm_quality_score", "llm_quality_filter",
    "llm_quality_classifier", "llm_ngram_jaccard_pairs",
    "llm_rolling_fingerprints", "llm_boilerplate_removal",
    "llm_common_ngrams_per_source", "llm_source_quality_report",
    "llm_bpe_token_count", "llm_bpe_train_merges",
    "llm_bpe_encode_roundtrip", "llm_perplexity_bucket_sample",
    "llm_wav_decode_stats", "window_dedup", "agg_percentiles",
    "agg_first_last_value", "udf_pandas_scalar", "udaf_pandas_grouped",
    "udtf_lateral", "udtaf_top2_per_group", "cogroup_user_summary",
    "table_api_row_ops", "hash_code_fn", "string_functions2",
    "string_functions3", "math_functions2", "temporal_functions2",
    "temporal_overlaps_fn", "typeof_fn", "encode_decode_fn",
    "array_map_row_fn", "json_functions2", "passthrough_functions",
    "posexplode_words", "temporal_table_function_sql",
    "llm_importance_resample", "stream_timer_session_agg",
})

_reorder()
