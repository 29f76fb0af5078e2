"""Aggregate-parity tranche 2 (round 8): ``anyHeavy``/``mode``,
``deltaSumTimestamp`` and ``quantileExactLow/High`` — stock ClickHouse
aggregates a dev-clickhouse consumer can call on any served table
(reference clickhouse/init/01_schema.sql tables are ordinary MergeTree).

Determinism notes (the cross-engine gate is a value hash):

- ``anyHeavy`` is processing-order dependent in ClickHouse (a heavy-hitter
  sample); the reproducible distributed contract is the EXACT mode with a
  pinned tie-break (count DESC, value ASC) — same adjudication as
  ``paste_join_price_ranks`` pinning PASTE JOIN's block-order semantics
  and ``simple_linreg_by_flag`` pinning boundingRatio under x-ties.
- ``deltaSumTimestamp`` quantizes values to integer cents BEFORE the lag
  delta, so every per-row delta and the final sum are exact integers —
  no float summation order anywhere.
- ``quantileExactLow/High``: 0-based rank floor(q·(n−1)) / ceil(q·(n−1))
  over the sorted multiset (ClickHouse's documented median_low/high
  semantics), computed aggregate-first over the distinct-value GRID with
  cumulative counts — never a sort of raw rows (l_quantity has 50
  distinct values at any corpus size).

Scale: each query is ONE data-sized map-side-combined aggregate plus
grid- or group-sized windows; deltaSumTimestamp's window is per-user
(the natural key distribution), never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register


@register(
    "mode_user_bucket_by_type",
    oracle="""
WITH cnt AS (
  SELECT event_type, user_id % 100 AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, user_id % 100
),
ranked AS (
  SELECT event_type, bucket, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c DESC, bucket ASC) AS rn
  FROM cnt
)
SELECT event_type, bucket AS mode_bucket, c AS mode_count
FROM ranked WHERE rn = 1
ORDER BY event_type
""",
    tags=["clickhouse-parity", "aggregates"],
)
def mode_user_bucket_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``anyHeavy`` / exact ``mode`` parity: the most frequent user-id
    bucket per event type, tie-broken (count DESC, bucket ASC) so the
    answer is reproducible under any partitioning — the property
    ClickHouse's sampling anyHeavy gives up."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy(
        "event_type", (F.col("user_id") % 100).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("bucket").asc()
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("mode_bucket"),
            F.col("c").alias("mode_count"),
        )
        .orderBy("event_type")
    )


@register(
    "delta_sum_timestamp_user_values",
    oracle="""
WITH q AS (
  SELECT user_id,
         CAST(floor("value" * 100 + 0.5) AS BIGINT) AS cents,
         ts, event_id
  FROM events WHERE "value" IS NOT NULL
),
d AS (
  SELECT user_id,
         cents - lag(cents) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS delta
  FROM q
)
SELECT CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) AS BIGINT)
         AS delta_sum_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM d
""",
    tags=["clickhouse-parity", "aggregates"],
)
def delta_sum_timestamp_user_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``deltaSumTimestamp(value, ts)`` parity: per-user positive deltas
    in (ts, event_id) order, summed corpus-wide.  Cents quantization
    before the lag makes every delta and the total exact integers; the
    (ts, event_id) sort key is unique per user, so the lag order is
    well-defined in both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    q = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "ts", "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = q.select(
        (F.col("cents") - F.lag("cents").over(w)).alias("delta")
    )
    return d.groupBy().agg(
        F.sum(
            F.when(F.col("delta") > 0, F.col("delta")).otherwise(0)
        ).cast("long").alias("delta_sum_cents"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@register(
    "quantile_exact_low_high_by_flag",
    oracle="""
WITH grid AS (
  SELECT l_returnflag AS flag, l_quantity AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
cum AS (
  SELECT flag, v, c,
         sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum_c,
         sum(c) OVER (PARTITION BY flag) AS n
  FROM grid
)
SELECT flag,
       min(CASE WHEN cum_c >  CAST(floor(0.5 * (n - 1)) AS BIGINT)
                THEN v END) AS median_low,
       min(CASE WHEN cum_c > -CAST(floor(-0.5 * (n - 1)) AS BIGINT)
                THEN v END) AS median_high,
       min(CASE WHEN cum_c >  CAST(floor(0.9 * (n - 1)) AS BIGINT)
                THEN v END) AS p90_low
FROM cum
GROUP BY flag
ORDER BY flag
""",
    tags=["clickhouse-parity", "aggregates"],
)
def quantile_exact_low_high_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``quantileExactLow`` / ``quantileExactHigh`` parity over the
    l_quantity grid: LOW picks 0-based sorted index floor(q·(n−1)), HIGH
    picks ceil(q·(n−1)) (median_low/median_high semantics).  Expressed
    as "first grid value whose cumulative count exceeds the target
    index" — the ceil is spelled −floor(−x) identically in both engines.
    One data-sized aggregate; windows run over the ≤50-value per-flag
    grid."""
    li = load_table(spark, sf_dir, "lineitem")
    grid = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("v"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("flag")
    cum = grid.select(
        "flag", "v", "c",
        F.sum("c").over(wcum).alias("cum_c"),
        F.sum("c").over(wall).alias("n"),
    )

    def pick(idx_expr):
        return F.min(F.when(F.col("cum_c") > idx_expr, F.col("v")))

    low_half = F.floor(0.5 * (F.col("n") - 1)).cast("long")
    high_half = (-F.floor(-0.5 * (F.col("n") - 1))).cast("long")
    low_p90 = F.floor(0.9 * (F.col("n") - 1)).cast("long")
    return (
        cum.groupBy("flag")
        .agg(
            pick(low_half).alias("median_low"),
            pick(high_half).alias("median_high"),
            pick(low_p90).alias("p90_low"),
        )
        .orderBy("flag")
    )
