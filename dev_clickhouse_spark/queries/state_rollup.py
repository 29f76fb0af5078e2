"""AggregatingMergeTree analog: MERGEABLE partial-aggregate state rollups.

ClickHouse's signature pre-aggregation pattern is ``AggregatingMergeTree``
with the ``-State`` / ``-Merge`` combinators: background merges fold raw rows
into small per-partition aggregate STATES (``uniqState``, ``sumState``,
``avgState`` …), and queries over any partition range combine just the state
rows with ``-Merge`` — history is never re-scanned.  The reference stack runs
daily full INSERT..SELECT refreshes instead (reference
``airflow/dags/sql/*.sql``); at 100 TB that rescan is the bottleneck, so a
complete engine needs the state form.

Spark-first translation, no custom serialization:

- **count / sum states** are just numbers — merge = ``sum`` (map-side
  combinable, exactly ClickHouse's ``sumMerge``);
- **moment states** are power sums ``(n, Σx, Σx²)`` — merge = elementwise
  sum, then mean/var/std derive from the merged sums (the same
  order-independence argument as ``stats_moments_by_returnflag``).  For
  extreme scale the numerically-hardened alternative is Chan's
  ``(n, mean, M2)`` merge; power sums are exact here because the merged
  totals stay far inside double's 53-bit mantissa;
- **distinct-count states** are real DataSketches HLL sketches via Spark's
  built-in ``hll_sketch_agg`` (binary column, parquet-persistable) and
  ``hll_union_agg`` — a LOSSLESS merge (HLL registers union by max), so the
  merged estimate is bit-identical to a single-pass sketch of the raw rows
  (asserted in tests/test_state_rollup.py, which also persists the state
  table through the Warehouse and refreshes it incrementally).

At scale: building states is one shuffle per refresh window (only the NEW
partitions are scanned); merging states shuffles rows = days × group keys —
kilobytes where the raw scan is terabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register

#: HLL relative standard deviation for lgConfigK=12 (Spark's default):
#: 1.04 / sqrt(2^12) ≈ 1.6%; the contract flag allows 3× that.
_HLL_RSD = 1.04 / (2 ** 12) ** 0.5


def daily_user_states(events: DataFrame) -> DataFrame:
    """The state-table builder: one row per (event_date, event_type) holding
    mergeable states — count, double sum, and an HLL sketch of user_id.
    This is what an incremental refresh appends for NEW days only."""
    return events.groupBy(
        F.to_date("ts").alias("event_date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_state"),
        F.sum("value").alias("sum_state"),
        F.hll_sketch_agg("user_id").alias("uniq_users_state"),
    )


def merge_user_states(states: DataFrame) -> DataFrame:
    """``-Merge`` over an arbitrary set of state rows: per event_type,
    combine counts/sums by summation and HLL sketches by register union."""
    return states.groupBy("event_type").agg(
        F.sum("n_state").alias("n_events"),
        F.sum("sum_state").alias("sum_value"),
        F.hll_sketch_estimate(
            F.hll_union_agg("uniq_users_state")
        ).alias("approx_users"),
    )


@register(
    "rollup_state_distinct_users",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(sum("value") * 100 + 0.5) / 100 AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(1 AS INTEGER) AS within_bound
FROM events GROUP BY event_type
""",
    tags=["state-merge", "approx", "clickhouse-parity"],
)
def rollup_state_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``uniqState`` / ``uniqMerge`` parity: per-day HLL sketch states merged
    across the full date range per event_type.  count/sum merge exactly (SQL
    oracle checks them to the cent); the sketch estimate — engine-internal by
    nature, like ``approx_distinct_daily_users`` — is gated by the CONTRACT:
    a flag asserting it landed within 3× the sketch's declared rsd of the
    exact count, deterministically 1 for fixed input."""
    ev = load_table(spark, sf_dir, "events")
    merged = merge_user_states(daily_user_states(ev))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_events",
        rnd(F.col("sum_value"), 2).alias("sum_value"),
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(3 * _HLL_RSD) * F.col("exact_users")
        ).cast("int").alias("within_bound"),
    )


@register(
    "rollup_state_moments_merge",
    oracle="""
WITH day_states AS (
  SELECT CAST(ts AS DATE) AS event_date, event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum("value")           AS sx,
         sum("value" * "value") AS sxx
  FROM events GROUP BY CAST(ts AS DATE), event_type
), merged AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
         sum(sx) AS sx, sum(sxx) AS sxx
  FROM day_states GROUP BY event_type
)
SELECT event_type, n_events,
       floor(sx / n_events * 10000 + 0.5) / 10000 AS mean_value,
       floor(sqrt((sxx - sx * sx / n_events) / (n_events - 1)) * 10000 + 0.5)
         / 10000 AS std_value
FROM merged
""",
    tags=["state-merge", "moments", "clickhouse-parity"],
)
def rollup_state_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``avgState``/``varSampState`` + ``-Merge`` parity via power-sum states:
    per-day ``(n, Σx, Σx²)`` rows merge by elementwise sum, and mean/stddev
    derive from the merged sums — the oracle replays the SAME two-level
    day-then-total summation so both engines add doubles in equivalent
    groupings before the 4dp round.  Two small shuffles (day states, then
    states per type); at scale the second operates on days×types rows."""
    ev = load_table(spark, sf_dir, "events")
    day_states = ev.groupBy(
        F.to_date("ts").alias("event_date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sx"),
        F.sum(F.col("value") * F.col("value")).alias("sxx"),
    )
    merged = day_states.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.sum("sx").alias("sx"),
        F.sum("sxx").alias("sxx"),
    )
    n, sx, sxx = F.col("n_events"), F.col("sx"), F.col("sxx")
    return merged.select(
        "event_type",
        "n_events",
        rnd(sx / n, 4).alias("mean_value"),
        rnd(F.sqrt((sxx - sx * sx / n) / (n - 1)), 4).alias("std_value"),
    )
