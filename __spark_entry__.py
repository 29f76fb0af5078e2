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


# Beyond-reference extras (rollup/cube/percentiles/pivot/set-ops/frames/
# session windows + the mechanical time dim): sorted after the core + LLM
# operators so the driver's bounded correctness window always covers the
# operators that carry coverage claims.  Everything here remains fully
# oracle-checked by tools/check_correctness.py each round.
_DEFER = {
    "rollup_year_priority", "cube_segment_priority", "percentile_event_values",
    "session_windows_gap", "pivot_daily_event_types", "except_intersect_users",
    "sql_moving_avg_frame", "dim_time_complete", "top_users_by_value",
    # each deferred entry's SURVEY §2 IDs keep an in-window representative:
    "daily_event_type_ratio",   # A8/W1 → ratio_to_total_by_segment
    "q14_promo_revenue_ratio",  # conditional-agg → q12
    "q15_top_suppliers",        # J7/A4 → correlated_min_price_part, daily_order_stats
    "event_date_time_keys",     # P1/date-fns → events_windowed_count, dim_date_build
    "multi_key_daily_top",      # O2 → daily_order_stats
    "q18_large_volume_orders",  # J6/having → order_priority_check
    # TPC-H completion pack (tpch_rest.py) — every shape keeps an in-window
    # representative (pushdown agg → q1; star+topk → q3/q5; correlated /
    # scalar subqueries → correlated_min_price_part, q12; anti/semi →
    # anti_join_customers_without_orders, order_priority_check):
    "q6_forecast_revenue", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_balance_concentration",
    "q13_order_count_distribution", "q16_supplier_part_variety",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q20_dominant_suppliers", "q21_sole_late_supplier",
    "q22_dormant_customers",
    # content-signal pack (llm/signals.py) — in-window llm-text
    # representatives: text_quality_scores, text_token_stats:
    "pii_redaction_stats", "text_repetition_signals",
    # ClickHouse-parity behavioral pack (queries/behavioral.py) — window/
    # join shapes represented in-window by events_5min_buckets, q3, q5:
    "timeseries_fill_gaps", "funnel_window_counts", "retention_cohorts",
    # curation pack (llm/curation.py) — explode/ngram shapes represented
    # in-window by dedup_ngram_jaccard_pairs, pack_context_windows:
    "chunk_documents", "decontaminate_against_benchmark",
    # ranking-window family — W2 represented by distinct_on_latest_event:
    "window_rank_suite",
    # exact-decimal second moments — A6 represented by q1_pricing_summary:
    "stats_moments_by_returnflag",
    # PNG codec round-trip proof — llm-multimodal represented in-window by
    # multimodal_feature_extract:
    "multimodal_png_roundtrip_stats",
}


def _ordered():
    """Registry in driver-check priority order: LLM-pipeline oracle queries
    (the ones a bounded window missed in round 1) → core operator oracle
    queries → deferred beyond-reference extras → rows-only (no-oracle) ops."""
    from dev_clickhouse_spark.queries import REGISTRY

    def klass(item):
        name, spec = item
        if spec.oracle is None:
            return 3
        if name in _DEFER:
            return 2
        if any(t.startswith("llm-") for t in spec.tags):
            return 0
        return 1

    return sorted(REGISTRY.items(), key=lambda it: (klass(it),))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered() if spec.oracle is not None}
