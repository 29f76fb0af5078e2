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


@register(
    "rollup_state_quantile_bf16",
    oracle="""
WITH q AS (
  SELECT CAST(ts AS DATE) AS event_date, event_type,
         CAST(floor("value" * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE "value" IS NOT NULL
),
bucketed AS (
  SELECT event_date, event_type,
         length(bin(c)) - 1 AS e,
         CAST(floor(c * 128.0 / power(2, length(bin(c)) - 1)) AS BIGINT) AS m
  FROM q
),
day_states AS (
  SELECT event_date, event_type, e, m, CAST(count(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY event_date, event_type, e, m
),
merged AS (
  SELECT event_type, e, m, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM day_states GROUP BY event_type, e, m
),
cum AS (
  SELECT event_type, e, m, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY e, m) AS cum_c,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM merged
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
       floor(min(CASE WHEN cum_c > CAST(floor(0.5 * (n - 1)) AS BIGINT)
                 THEN m * power(2, e) / 12800.0 END) * 1000000 + 0.5)
         / 1000000 AS p50_bf16,
       floor(min(CASE WHEN cum_c > CAST(floor(0.9 * (n - 1)) AS BIGINT)
                 THEN m * power(2, e) / 12800.0 END) * 1000000 + 0.5)
         / 1000000 AS p90_bf16
FROM cum
GROUP BY event_type
ORDER BY event_type
""",
    tags=["state-merge", "clickhouse-parity", "quantiles"],
)
def rollup_state_quantile_bf16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``quantileBFloat16State`` + ``-Merge`` parity: a mergeable QUANTILE
    state — the piece the HLL/power-sum rollups above cannot express
    (quantiles don't decompose into sums).  ClickHouse's quantileBFloat16
    buckets each value by its top 16 float bits (8-bit exponent + 7-bit
    mantissa); the state is just per-bucket counts, so merge = count sum
    (associative, constant-size: ≤ buckets spanned by the value range),
    and any quantile reads off the merged bucket CDF with relative error
    ≤ 2^-7 ≈ 0.8%.

    Bucketing here is EXACT INTEGER math, no float/log boundary risk
    cross-engine: cents c = floor(100v+0.5) ≥ 1, exponent e =
    bit_length(c)−1 via ``length(bin(c))−1`` (both engines print the
    same unpadded binary), mantissa m = floor(128c / 2^e) ∈ [128, 256)
    (division by an exact power of two only rescales the double's
    exponent — exact, so floor is deterministic).  Quantile pick =
    first bucket whose cumulative count exceeds floor(q·(n−1)), the same
    rank rule as ``quantile_exact_low_high_by_flag``; the representative
    value m·2^e/128 converts back to value units (/100).

    Scale: day states are one shuffle over NEW partitions only; merging
    shuffles days × types × ≤a-few-hundred bucket rows — kilobytes where
    the reference's daily refresh rescans the full history."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    q = ev.select(
        F.to_date("ts").alias("event_date"), "event_type", c.alias("c")
    )
    e = (F.length(F.bin(F.col("c"))) - 1).alias("e")
    bucketed = q.select(
        "event_date", "event_type", e,
        F.floor(
            F.col("c") * 128.0 / F.pow(F.lit(2), F.length(F.bin(F.col("c"))) - 1)
        ).cast("long").alias("m"),
    )
    day_states = bucketed.groupBy("event_date", "event_type", "e", "m").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    merged = day_states.groupBy("event_type", "e", "m").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("event_type")
        .orderBy("e", "m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type", "e", "m", "cnt",
        F.sum("cnt").over(wcum).alias("cum_c"),
        F.sum("cnt").over(wall).alias("n"),
    )
    rep = F.col("m") * F.pow(F.lit(2), F.col("e")) / F.lit(12800.0)

    def pick(level):
        idx = F.floor(F.lit(level) * (F.col("n") - 1)).cast("long")
        return F.min(F.when(F.col("cum_c") > idx, rep))

    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            rnd(pick(0.5), 6).alias("p50_bf16"),
            rnd(pick(0.9), 6).alias("p90_bf16"),
        )
        .orderBy("event_type")
    )
