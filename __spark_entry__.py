"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``dev_clickhouse_spark.queries`` (the registry maps
SURVEY.md §2 operator IDs to implementations + DuckDB oracles); this module
just adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star-join revenue rollup
    (five broadcast dims around the lineitem fact) — the reference's BI
    star-join shape (scripts/clickhouse_examples.sql:21-29) at its widest."""
    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import tune

    tune(spark)
    return REGISTRY["q5_nation_revenue"].fn(spark, "/root/testdata/sf0.001")


# Round-4 rotation of the driver's bounded (50-entry) correctness window.
#
# Rounds 2-3 checked the same 50 oracle queries (the CORRECTNESS_r03.json key
# set below) twice over, leaving 37 oracle queries only locally mirrored.
# This round inverts the window: never-driver-checked queries sort FIRST
# (including any query added this round, which is by construction not in the
# round-3 set), followed by 13 hand-picked representatives so every SURVEY §2
# operator family keeps at least one in-window row, then the remaining twice-
# green queries, then rows-only ops.  tools/check_correctness.py still
# oracle-checks everything each round regardless of the driver's window.
_CHECKED_R3 = {
    "dedup_embedding_cosine_pairs", "dedup_exact_stats",
    "dedup_ngram_jaccard_pairs", "dedup_minhash_lsh_pairs",
    "dedup_near_dup_clusters", "dedup_keep_list", "dedup_simhash_signatures",
    "multimodal_feature_extract", "ann_cosine_topk", "text_token_stats",
    "text_quality_scores", "rolling_hash_fingerprints", "lang_id_markers",
    "lang_id_char_ngrams", "tfidf_top_keywords", "doc_fingerprints",
    "sample_hash_split", "sample_stratified_per_source",
    "pack_context_windows", "embedding_centroids", "q1_pricing_summary",
    "q3_shipping_priority", "q5_nation_revenue", "top_parts_by_revenue",
    "order_priority_check", "ratio_to_total_by_segment", "events_5min_buckets",
    "events_windowed_count", "q7_volume_shipping",
    "q12_priority_by_quantity_band", "daily_order_stats",
    "merge_upsert_daily_counts", "current_flag_version_join",
    "gold_star_build_events", "gold_star_rollup_events",
    "anti_join_customers_without_orders", "null_safe_join_priority_buckets",
    "asof_join_last_purchase", "argmin_first_event_per_user",
    "distinct_on_latest_event", "dedupe_last_write_wins",
    "union_conform_nations", "json_extract_props", "dim_date_build",
    "scd2_user_type_versions", "event_lag_seconds", "ts_parse_roundtrip",
    "sql_revenue_by_region", "correlated_min_price_part",
    "range_join_version_intervals",
}

# Round-4 window (CORRECTNESS_r04.json key set): the inverted window — the
# 37 never-before-checked oracle queries + 13 per-family representatives.
# After r4 every oracle query had at least one green driver row.
_CHECKED_R4 = {
    "ann_lsh_bucket_topk", "ann_lsh_recall_at_5", "argmin_first_event_per_user",
    "asof_join_last_purchase", "chunk_documents", "cube_segment_priority",
    "daily_event_type_ratio", "decontaminate_against_benchmark",
    "dedupe_last_write_wins", "dim_time_complete", "distinct_on_latest_event",
    "event_date_time_keys", "events_5min_buckets", "except_intersect_users",
    "funnel_window_counts", "gold_star_build_events", "json_extract_props",
    "merge_upsert_daily_counts", "multi_key_daily_top",
    "multimodal_jpeg_roundtrip_stats", "multimodal_png_roundtrip_stats",
    "percentile_event_values", "pii_redaction_stats", "pivot_daily_event_types",
    "q10_returned_items", "q11_balance_concentration",
    "q13_order_count_distribution", "q14_promo_revenue_ratio",
    "q15_top_suppliers", "q16_supplier_part_variety",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_disjunctive_revenue", "q20_dominant_suppliers",
    "q21_sole_late_supplier", "q22_dormant_customers", "q6_forecast_revenue",
    "q8_market_share", "q9_product_profit", "retention_cohorts",
    "rollup_year_priority", "scd2_user_type_versions", "session_windows_gap",
    "sql_moving_avg_frame", "stats_moments_by_returnflag",
    "text_repetition_signals", "timeseries_fill_gaps", "top_users_by_value",
    "union_conform_nations", "window_rank_suite",
}


# Round-5 window (CORRECTNESS_r05.json key set, all green).  With a grown
# registry and a 50-row driver budget, the round-6 window is the queries
# ADDED in round 6 (never driver-checked) followed by this set's complement
# — r05 ∪ r06 covers everything except the last couple of alphabetical
# complement entries (green in r4, still green in the full local mirror),
# which lead round 7's window.
_CHECKED_R5 = {
    "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_bucket_topk",
    "anti_join_customers_without_orders", "approx_distinct_daily_users",
    "correlated_min_price_part", "curation_filter_funnel",
    "current_flag_version_join", "daily_order_stats",
    "dedup_embedding_cosine_pairs", "dedup_exact_stats", "dedup_keep_list",
    "dedup_minhash_lsh_pairs", "dedup_near_dup_clusters",
    "dedup_ngram_jaccard_pairs", "dedup_simhash_signatures", "dim_date_build",
    "doc_fingerprints", "domain_mix_weights", "embedding_centroids",
    "event_lag_seconds", "events_windowed_count", "gold_star_rollup_events",
    "lang_id_char_ngrams", "lang_id_char_ngrams_arrow", "lang_id_markers",
    "multimodal_feature_extract", "null_safe_join_priority_buckets",
    "order_priority_check", "pack_context_windows",
    "q12_priority_by_quantity_band", "q1_pricing_summary",
    "q3_shipping_priority", "q5_nation_revenue", "q7_volume_shipping",
    "range_join_version_intervals", "ratio_to_total_by_segment",
    "rolling_hash_fingerprints", "salted_join_segment_revenue",
    "sample_hash_split", "sample_stratified_per_source",
    "sequence_count_users", "sequence_match_users", "sql_revenue_by_region",
    "text_quality_scores", "text_token_stats", "tfidf_top_keywords",
    "top_parts_by_revenue", "training_export_shards", "ts_parse_roundtrip",
}


# Round-6 window (CORRECTNESS_r06.json key set, all green): the seven
# queries added in round 6 + the alphabetical head of the r5 complement.
# Six r4-checked queries missed BOTH the r5 and r6 windows (the driver caps
# at 50 rows) — VERDICT r6 names them and they lead round 7's window.
_CHECKED_R6 = {
    "agg_if_combinators", "ann_lsh_recall_at_5",
    "approx_percentile_error_contract", "argmin_first_event_per_user",
    "asof_join_last_purchase", "chunk_documents", "cube_segment_priority",
    "daily_event_type_ratio", "decontaminate_against_benchmark",
    "dedup_incremental_new_vs_corpus", "dedupe_last_write_wins",
    "dim_time_complete", "distinct_on_latest_event", "event_date_time_keys",
    "events_5min_buckets", "except_intersect_users",
    "funnel_strict_order_levels", "funnel_window_counts",
    "gold_star_build_events", "histogram_event_values", "json_extract_props",
    "lm_char_trigram_scores", "merge_upsert_daily_counts",
    "multi_key_daily_top", "multimodal_jpeg_roundtrip_stats",
    "multimodal_png_roundtrip_stats", "percentile_event_values",
    "pii_redaction_stats", "pivot_daily_event_types", "q10_returned_items",
    "q11_balance_concentration", "q13_order_count_distribution",
    "q14_promo_revenue_ratio", "q15_top_suppliers",
    "q16_supplier_part_variety", "q17_small_quantity_revenue",
    "q18_large_volume_orders", "q19_disjunctive_revenue",
    "q20_dominant_suppliers", "q21_sole_late_supplier",
    "q22_dormant_customers", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "retention_cohorts", "rollup_year_priority",
    "scd2_user_type_versions", "sequence_match_timed_users",
    "session_windows_gap", "sql_moving_avg_frame",
}


# Round-7 window (CORRECTNESS_r07.json key set, all green).
_CHECKED_R7 = {
    "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_bucket_topk",
    "ann_pq_recall_contract", "anti_join_customers_without_orders",
    "approx_distinct_daily_users", "argmax_last_event_per_user",
    "bit_agg_by_event_type", "correlated_min_price_part",
    "curation_filter_funnel", "current_flag_version_join",
    "daily_order_stats", "dedup_cosine_sharded_recall",
    "dedup_embedding_cosine_pairs", "dedup_exact_stats", "dedup_keep_list",
    "dedup_minhash_lsh_pairs", "dedup_near_dup_clusters",
    "dedup_ngram_jaccard_pairs", "dedup_simhash_signatures", "dim_date_build",
    "doc_fingerprints", "domain_mix_weights", "embedding_centroids",
    "event_lag_seconds", "events_windowed_count", "gold_star_rollup_events",
    "group_array_user_events", "lang_id_char_ngrams",
    "lang_id_char_ngrams_arrow", "lang_id_markers", "limit_by_recent_events",
    "multimodal_feature_extract", "null_safe_join_priority_buckets",
    "order_priority_check", "pack_context_windows",
    "quantiles_exact_weighted", "rollup_state_distinct_users",
    "rollup_state_moments_merge", "running_difference_daily",
    "stats_moments_by_returnflag", "sum_map_user_event_values",
    "text_repetition_signals", "timeseries_fill_gaps",
    "timeseries_interpolate_gaps", "top_users_by_value", "topk_heavy_hitters",
    "union_conform_nations", "uniq_up_to_users", "window_rank_suite",
}


# Round-8 window (CORRECTNESS_r08.json key set): 49/50 hash-green + the
# rows-only-by-design ``dedup_cosine_pairs_sharded`` (its oracle-gated
# soundness twin ``dedup_cosine_sharded_soundness`` is green in the same
# window, closing VERDICT r7 #2).
_CHECKED_R8 = {
    "array_auc_purchase_value", "array_hof_user_values",
    "array_scan_user_values", "array_set_ops_user_types",
    "array_structure_user_values", "avg_weighted_price_by_flag",
    "bitmap_users_across_event_types", "categorical_iv_segment_balance",
    "codec_functions_by_brand", "contingency_coeff_priority_status",
    "corr_matrix_lineitem", "cramers_v_type_bucket",
    "date_arithmetic_by_priority", "dedup_cosine_pairs_sharded",
    "dedup_cosine_sharded_soundness", "delta_sum_timestamp_user_values",
    "dict_get_customer_nations", "ema_daily_order_totals",
    "entropy_daily_event_types", "format_readable_sizes",
    "great_circle_nation_pairs", "grouping_sets_with_ids",
    "interval_length_sum_by_type", "ks_test_quantity_by_flag",
    "lttb_downsample_daily_orders", "mann_whitney_quantity_by_flag",
    "max_intersections_sessions", "min_max_map_user_event_values",
    "mode_user_bucket_by_type", "moving_sum_arrays_per_user",
    "multimodal_codec_coverage", "mutation_delete_update_stats",
    "ngram_distance_by_brand", "paste_join_price_ranks",
    "quantile_exact_low_high_by_flag", "rank_corr_quantity_discount",
    "rollup_state_quantile_bf16", "sample_clause_events_agg",
    "sequence_next_node_users", "simple_linreg_by_flag",
    "skip_index_pruned_scan", "sparkbar_daily_events_by_type",
    "stats_skew_kurtosis_by_flag", "string_search_distance_by_brand",
    "student_ttest_price_by_flag", "sum_resample_price_by_quantity",
    "theils_u_type_bucket", "topk_weighted_heavy_hitters",
    "transform_decode_event_scores", "uniq_theta_intersect_user_days",
}


# Round-9 window (CORRECTNESS_r09.json key set, 50/50 green — including
# the re-led ``sum_resample_price_by_quantity`` after its array column was
# serialized for the comparator).
_CHECKED_R9 = {
    "agg_if_combinators", "ann_lsh_recall_at_5",
    "any_left_join_customer_order", "approx_percentile_error_contract",
    "argmin_first_event_per_user", "asof_join_last_purchase",
    "bitmap_segment_overlap", "bounding_ratio_by_event_type",
    "chunk_documents", "cube_segment_priority", "daily_event_type_ratio",
    "decontaminate_against_benchmark", "dedup_incremental_new_vs_corpus",
    "dedup_substring_cut_stats", "dedup_substring_spans",
    "dedupe_last_write_wins", "dim_time_complete",
    "distinct_on_latest_event", "distinct_or_default_aggregates",
    "lightweight_delete_mask_read", "lightweight_update_patch_read",
    "map_functions_user_event_counts", "projection_auto_rewrite_rollup",
    "projection_incremental_fold", "q12_priority_by_quantity_band",
    "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
    "q7_volume_shipping", "range_join_version_intervals",
    "ratio_to_total_by_segment", "rolling_hash_fingerprints",
    "salted_join_segment_revenue", "sample_hash_split",
    "sample_stratified_per_source", "sequence_count_users",
    "sequence_match_users", "sort_projection_pruned_scan",
    "sql_revenue_by_region", "sum_resample_price_by_quantity",
    "text_quality_scores", "text_token_stats", "tfidf_top_keywords",
    "top_parts_by_revenue", "training_export_shards", "ts_parse_roundtrip",
    "url_functions_stats", "welch_ttest_price_by_flag",
    "window_frame_functions_daily", "with_totals_segment_priority",
}


_CHECKED_R10 = {
    "anova_price_by_returnflag", "collapsing_read_net",
    "computed_column_kinds_read", "dict_hierarchy_nation_chain",
    "drop_partition_overlay_read", "event_date_time_keys",
    "events_5min_buckets", "except_intersect_all_users",
    "except_intersect_users", "final_read_replacing",
    "funnel_strict_dedup_counts", "funnel_strict_increase_counts",
    "funnel_strict_order_levels", "funnel_window_counts",
    "gold_star_build_events", "group_concat_user_types",
    "has_all_any_user_journeys", "histogram_event_values",
    "ipv6_canonicalization_parity", "iso_week_order_counts",
    "json_extract_props", "limit_by_offset_events",
    "limit_with_ties_quantity", "lm_char_trigram_scores",
    "merge_upsert_daily_counts", "multi_key_daily_top",
    "multimodal_codec_coverage", "multimodal_jpeg_roundtrip_stats",
    "multimodal_png_roundtrip_stats", "percentile_event_values",
    "pii_redaction_stats", "pivot_daily_event_types",
    "projection_refold_after_delete", "q10_returned_items",
    "q11_balance_concentration", "q13_order_count_distribution",
    "q14_promo_revenue_ratio", "q15_top_suppliers",
    "q16_supplier_part_variety", "q17_small_quantity_revenue",
    "q18_large_volume_orders", "q19_disjunctive_revenue",
    "q20_dominant_suppliers", "recursive_cte_part_hierarchy",
    "regexp_extract_doc_stats", "sample_offset_events_agg",
    "semantic_cluster_kmeans", "semantic_dedup_within_clusters",
    "summing_read_merge", "ttl_group_by_rollup_read",
}


# Round-11 window (CORRECTNESS_r11.json GREEN rows — 49/50).  The one err,
# ``group_array_sorted_last``, is deliberately NOT in this set: its answer
# was mirror-correct but its raw array<double> columns crashed the driver
# harness's pandas canonicalization, so it has never had a green driver row.
# Round 12 serializes those columns with array_join (the repo convention)
# and the never-green class re-leads it.
_CHECKED_R11 = {
    "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_bucket_topk",
    "ann_pq_recall_contract", "anti_join_customers_without_orders",
    "approx_distinct_daily_users", "argmax_last_event_per_user",
    "bit_agg_by_event_type", "clear_column_partition_read",
    "column_ttl_merge_read", "computed_column_kinds_read",
    "correlated_min_price_part", "curation_filter_funnel",
    "current_flag_version_join", "daily_order_stats",
    "dedup_cosine_sharded_recall", "dedup_embedding_cosine_pairs",
    "dedup_exact_stats", "dedup_keep_list", "dedup_minhash_lsh_pairs",
    "dedup_near_dup_clusters", "dedup_ngram_jaccard_pairs",
    "dedup_simhash_signatures", "dim_date_build", "doc_fingerprints",
    "domain_mix_weights", "embedding_centroids", "event_lag_seconds",
    "events_windowed_count", "exp_time_decayed_daily",
    "group_array_user_events", "grouping_sets_type_day",
    "importance_resample_by_quality", "materialize_column_read",
    "min_sample_size_continuous_by_type",
    "min_sample_size_conversion_by_type", "modify_column_cast_read",
    "multimodal_codec_coverage", "neighbor_value_delta_by_type",
    "non_negative_derivative_daily", "qualify_above_type_mean",
    "quality_model_scores", "quantile_timing_event_values",
    "running_accumulate_daily_by_type", "running_difference_daily",
    "semantic_cluster_kmeans", "semantic_dedup_within_clusters",
    "ttl_group_by_rollup_read", "uniq_up_to_users",
}


def _ordered():
    """Registry in round-12 driver-check priority order, LRU-style.

    VERDICT r11 #1/#2: the window leads with (0) the only never-driver-
    green query — ``group_array_sorted_last``, whose array columns are now
    array_join-serialized — plus anything added this round (never checked,
    class 0 by construction), then (1) the 32-entry r6/r7-stale cohort the
    verdict names (11 last green r6: rollup_state_*/timeseries_*-era; 21
    last green r7: window_rank_suite/topk_heavy_hitters/
    sequence_match_timed_users/retention_cohorts-era), then r8-, r9-,
    r10-stale rows by age, with the freshest r11 rows rotating out.
    tools/check_correctness.py still oracle-checks all 225+ every round
    regardless of the driver's window.

    The staleness census at r12 start (last-green round per oracle
    query): r6 ×11, r7 ×21, r8 ×47, r9 ×50, r10 ×45, r11 ×49, never ×1."""
    from dev_clickhouse_spark.queries import REGISTRY

    ever = (
        _CHECKED_R3 | _CHECKED_R4 | _CHECKED_R5 | _CHECKED_R6
        | _CHECKED_R7 | _CHECKED_R8 | _CHECKED_R9 | _CHECKED_R10
        | _CHECKED_R11
    )
    fresh8 = _CHECKED_R8 | _CHECKED_R9 | _CHECKED_R10 | _CHECKED_R11

    def klass(item):
        name, spec = item
        if spec.oracle is None:
            return (7, name)
        if name not in ever:
            return (0, name)      # never driver-green / added this round
        if name not in fresh8:
            return (1, name)      # the r6/r7-stale cohort (VERDICT #2)
        if name not in _CHECKED_R9 | _CHECKED_R10 | _CHECKED_R11:
            return (2, name)      # last checked r8
        if name not in _CHECKED_R10 | _CHECKED_R11:
            return (3, name)      # last checked r9
        if name not in _CHECKED_R11:
            return (4, name)      # last checked r10
        return (6, name)          # green in r11 — freshest, rotates out

    return sorted(REGISTRY.items(), key=klass)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered() if spec.oracle is not None}
