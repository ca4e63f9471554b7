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
# registration order and may truncate (rounds 1 and 2 each stopped at the
# first 50), so the front of the dict carries the queries with the LEAST
# prior driver evidence. Round-3 rotation: the first 50 slots are the one
# red r2 row (llm_sequence_packing, oracle type fix) plus 49 queries that
# have never received a driver CORRECTNESS row in r1 or r2; the remaining
# never-checked queries follow immediately (positions 51+), and everything
# already driver-green in r1/r2 is demoted to the tail. Rotate again each
# round as coverage accumulates.
_PRIORITY_WINDOW = [
    # the only red r2 row — oracle cast fix must be re-proven by the driver
    "llm_sequence_packing",
    # graph library (15) — never driver-checked
    "graph_pagerank", "graph_connected_components", "graph_triangle_count",
    "graph_degree", "graph_sssp", "graph_label_propagation",
    "graph_clustering_coefficient", "graph_jaccard_index",
    "graph_adamic_adar", "graph_summarization", "graph_triadic_census",
    "graph_hits", "graph_global_clustering", "graph_community_detection",
    "graph_vertex_metrics",
    # TPC-H tail (14) — never driver-checked
    "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock",
    "q12_shipping_priority_class", "q13_customer_distribution",
    "q15_top_supplier", "q16_part_supplier_count",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q20_potential_promotion", "q21_suppliers_kept_waiting",
    "q22_prospective_customers",
    # window functions (7) — never driver-checked
    "wf_lag_lead", "wf_ntile_percentiles", "wf_dataframe_api",
    "wf_topn_per_group", "wf_rank_dense_rank", "wf_running_rows_frame",
    "wf_first_last_value",
    # batch window TVFs (7) — never driver-checked
    "tumble_window_agg", "hop_window_agg", "session_window_agg",
    "session_window_dynamic_gap", "cumulate_window_agg",
    "window_join", "window_tvf_projection",
    # CDC formats (2) — never driver-checked
    "cdc_canal_roundtrip", "cdc_maxwell_roundtrip",
    # new this round: CEP after-match skip strategies (4)
    "cep_skip_to_next_click_runs", "cep_no_skip_conversion_pairs",
    "cep_skip_to_last_error_runs", "cep_skip_to_first_purchase_chain",
]
# ROUND-4 ROTATION: the never-driver-checked remainder to promote into the
# next window (everything in `middle` below — 29 carried from rounds 1-3
# plus this round's additions: match_recognize_sql_*, *_nested_roundtrip,
# stream_cep_no_conversion_within, cep_group_pattern_double_conversion,
# cep_until_stop_condition, llm_pii_scrub, llm_contamination_check,
# sql_gateway_rest, avro_schema_evolution, protobuf_py_map_roundtrip,
# bucketed_join_agg, metadata_columns_read, llm_segment_dedup,
# llm_deterministic_shuffle, llm_temperature_mix, llm_bigram_lm_score,
# llm_token_budget_mix, cep_followed_by_nearest, stream_current_watermark,
# stream_connect_threshold_filter, temporal_join_sql, window_tvf_sql,
# group_window_sql, datastream_iterate_countdown, twophase_sink_roundtrip,
# datastream_*, connector/compaction/sql-client rows).
# Compute it with: [n for n in QUERIES if n not in r1|r2|r3 green rows].


def _reorder() -> None:
    ordered = [n for n in _PRIORITY_WINDOW if n in QUERIES]
    # positions 51+: everything else never driver-checked (incl. queries new
    # this round), registration order — round 4's window rotates these in
    driver_checked_tail = [
        n for n in QUERIES
        if n not in ordered and n in _DRIVER_CHECKED_R1_R2
    ]
    middle = [
        n for n in QUERIES
        if n not in ordered and n not in _DRIVER_CHECKED_R1_R2
    ]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for n in [*ordered, *middle, *driver_checked_tail]:
        QUERIES[n] = snapshot[n]


# queries the driver hash-verified green in round 1 or round 2
# (CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json minus the red row) — proven
# surface, so they yield their slot in a truncated window
_DRIVER_CHECKED_R1_R2 = frozenset({
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
})

_reorder()
