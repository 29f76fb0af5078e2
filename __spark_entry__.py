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

# One in-window representative per §2 family whose only oracle coverage lives
# in the round-3 set (IDs in comments; families already re-covered by the 37
# rotated-in queries — e.g. J7 via q15/q11/q22, O2 via multi_key_daily_top,
# W2 via window_rank_suite — stay rotated out this round).  ORDER MATTERS:
# never-checked queries sort ahead of these, so when new oracle queries grow
# that class past 50-len(this list), reps drop from the TAIL — the most
# redundant families (SQL path also in sql_moving_avg_frame; the null-safe
# eqNullSafe mechanic also inside current_flag_version_join's join condition)
# are listed last on purpose.
_KEEP_IN_WINDOW = [
    "scd2_user_type_versions",         # §2.11 SCD2 protocol
    "gold_star_build_events",          # S2/J3/gold star keying
    "asof_join_last_purchase",         # J2 ASOF
    "merge_upsert_daily_counts",       # J8 MERGE
    "dedupe_last_write_wins",          # S4 ReplacingMergeTree semantics
    "json_extract_props",              # P4/F-JSON fallback chains
    "argmin_first_event_per_user",     # A5 argMin
    "distinct_on_latest_event",        # A7 DISTINCT ON
    "events_5min_buckets",             # W3 time buckets
    "union_conform_nations",           # U1 UNION ALL conform
    "current_flag_version_join",       # J11 current-flag dim + P5 eqNullSafe
    "null_safe_join_priority_buckets", # J9/P5 null-safe equi
    "sql_revenue_by_region",           # S7 SQL serving path
]


def _ordered():
    """Registry in driver-check priority order: never-driver-checked oracle
    queries (round-3 deferred + anything new this round) → per-family
    representatives → twice-green round-3 window rest → rows-only ops."""
    from dev_clickhouse_spark.queries import REGISTRY

    keep_rank = {n: i for i, n in enumerate(_KEEP_IN_WINDOW)}

    def klass(item):
        name, spec = item
        if spec.oracle is None:
            return (3, 0)
        if name not in _CHECKED_R3:
            return (0, 0)
        if name in keep_rank:
            return (1, keep_rank[name])
        return (2, 0)

    return sorted(REGISTRY.items(), key=klass)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered() if spec.oracle is not None}
