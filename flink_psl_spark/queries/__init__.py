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
# driver evidence. ROUND-4 rotation: the 50 slots hold (a) the two r1-red
# rows whose fixes have only replica evidence (agg_collect,
# agg_approx_distinct), (b) the SQL-parity and service surfaces, (c) the
# DataStream bridge, connector/sink, curation, nested-codec, CEP and
# streaming queries that have never received a driver row, and (d) the
# queries NEW this round (match_recognize_sql_price_dip). Everything
# driver-green in r1-r3 is demoted to the tail.
_PRIORITY_WINDOW = [
    # ex-red r1 rows — fixed in r2, never re-proven by the driver
    "agg_collect", "agg_approx_distinct",
    # SQL-parity fronts + service surfaces (7)
    "match_recognize_sql_clicks", "match_recognize_sql_skip_chain",
    "temporal_join_sql", "window_tvf_sql", "group_window_sql",
    "sql_client_script", "sql_gateway_rest",
    # NEW round 4: cross-variable DEFINE references (verdict task 4)
    "match_recognize_sql_price_dip",
    # DataStream bridge (5)
    "datastream_map_filter", "datastream_keyed_sum",
    "datastream_side_output_split", "datastream_broadcast_join",
    "datastream_iterate_countdown",
    # connectors / sinks / sources (10)
    "twophase_sink_roundtrip", "bucketed_join_agg",
    "metadata_columns_read", "file_compaction_roundtrip",
    "filesystem_partitioned_roundtrip", "jdbc_roundtrip_agg",
    "values_inline_rows", "pysource_datagen_agg",
    "pysource_datagen_pushdown", "async_lookup_enrich",
    # round-3 curation operators (10)
    "llm_segment_dedup", "llm_deterministic_shuffle",
    "llm_temperature_mix", "llm_token_budget_mix",
    "llm_bigram_lm_score", "llm_bpe_pair_counts", "llm_pii_scrub",
    "llm_contamination_check", "llm_hard_negatives",
    "llm_curation_pipeline",
    # nested codec roundtrips (4)
    "avro_py_nested_roundtrip", "protobuf_py_nested_roundtrip",
    "avro_schema_evolution", "protobuf_py_map_roundtrip",
    # CEP stragglers — hardest semantics built in r3 (4)
    "stream_cep_no_conversion_within",
    "cep_group_pattern_double_conversion", "cep_until_stop_condition",
    "cep_followed_by_nearest",
    # streaming stragglers (7)
    "stream_current_watermark", "stream_connect_threshold_filter",
    "stream_semi_join", "stream_interval_join_outer", "stream_rows_over",
    "stream_dedup", "stream_hop_agg",
]
# ROUND-5 ROTATION (precomputed — apply next round): the never-checked
# remainder fits in one window, reaching 100% driver coverage of the
# registry.  45 queries as of round-4 end:
#   hash_code_fn, window_dedup, tumble_window_offset_agg,
#   llm_ngram_jaccard_pairs, llm_bpe_token_count, llm_quality_score,
#   llm_text_stats, llm_quality_filter, llm_rolling_fingerprints,
#   agg_percentiles, llm_boilerplate_removal, llm_quality_classifier,
#   llm_common_ngrams_per_source, llm_semantic_dedup,
#   llm_bpe_train_merges, llm_bpe_encode_roundtrip,
#   llm_perplexity_bucket_sample, llm_source_quality_report,
#   llm_wav_decode_stats, llm_curation_pipeline_v2, stream_session_agg,
#   stream_cumulate_agg, stream_doc_quality_ingest,
#   match_recognize_sql_budget_runs, agg_first_last_value,
#   string_functions2, math_functions2, temporal_functions2,
#   try_functions, posexplode_words, cogroup_user_summary,
#   udtaf_top2_per_group, udf_pandas_scalar, udaf_pandas_grouped,
#   udtf_lateral, temporal_overlaps_fn, string_functions3, typeof_fn,
#   encode_decode_fn, array_map_row_fn, json_functions2,
#   passthrough_functions, table_api_row_ops,
#   cdc_upsert_format_image, cumulate_tvf_sql
# Compute exactly with: [n for n in QUERIES if n not in r1|r2|r3|r4
# green rows].


def _reorder() -> None:
    ordered = [n for n in _PRIORITY_WINDOW if n in QUERIES]
    # positions 51+: everything else never driver-checked (incl. queries new
    # this round), registration order — round 5's window rotates these in
    driver_checked_tail = [
        n for n in QUERIES
        if n not in ordered and n in _DRIVER_CHECKED_R1_R2_R3
    ]
    middle = [
        n for n in QUERIES
        if n not in ordered and n not in _DRIVER_CHECKED_R1_R2_R3
    ]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for n in [*ordered, *middle, *driver_checked_tail]:
        QUERIES[n] = snapshot[n]


# queries the driver hash-verified green in rounds 1-3
# (∪ CORRECTNESS_r0{1,2,3}.json latest-green rows) — proven surface, so
# they yield their slot in a truncated window.  agg_collect and
# agg_approx_distinct appear here for historical reasons but are
# overridden by _PRIORITY_WINDOW (their latest driver evidence is the r1
# red row; round 4 re-proves them).
_DRIVER_CHECKED_R1_R2_R3 = frozenset({
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
})

_reorder()
