"""ClickHouse function parity, round 11 batch.

Remaining stock-ClickHouse reaches with no counterpart yet:
``neighbor`` / ``lagInFrame``, ``quantileTiming``, ``runningAccumulate``
over partial ``sumState``s, and the A/B-test planner
``minSampleSizeConversion``.  Registry conventions throughout: identical
aliases in both engines, integer or floor-rounded outputs so the value
hash is engine-stable, and every window runs over an AGGREGATED series
(days × types), never raw event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


@register(
    "neighbor_value_delta_by_type",
    oracle="""
WITH seq AS (
  SELECT event_type, value,
         lag(value) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS prev_value
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(prev_value) AS BIGINT) AS n_with_neighbor,
       floor(sum(abs(value - coalesce(prev_value, value))) * 100 + 0.5)
         / 100 AS sum_abs_delta
FROM seq GROUP BY event_type ORDER BY event_type
""",
    tags=["clickhouse-parity", "window"],
)
def neighbor_value_delta_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``neighbor(value, -1)`` / ``lagInFrame`` parity: the
    previous row's value along a declared order.  CH's ``neighbor`` is
    block-local and documented non-deterministic across blocks; the
    deterministic (and distributable) form is ``lagInFrame`` over a
    window, which is what both engines compute here — per event_type,
    ordered by (ts, event_id).  Partitioning by type keeps every window
    partition a type's slice, not a global sort; at 100 TB the same
    query runs per-key exactly like sessionization does."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_value", F.lag("value").over(w))
    return (
        seq.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("prev_value").cast("long").alias("n_with_neighbor"),
            rnd(
                F.sum(
                    F.abs(
                        F.col("value")
                        - F.coalesce("prev_value", "value")
                    )
                ),
                2,
            ).alias("sum_abs_delta"),
        )
        .orderBy("event_type")
    )


# quantileTiming's storage grid (ClickHouse AggregateFunctionsQuantile
# docs): exact 1 ms buckets below 1024 ms, 16 ms buckets up to 30 s,
# clamped at 30 s.  Values are mapped onto the grid BEFORE ranking, so
# the quantile returned is a grid representative — deterministic and
# mergeable, which is the whole point of the sketch.
_TIMING_CAP_MS = 30_000


def _timing_grid_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < 1024 THEN {col} "
        f"WHEN {col} <= {_TIMING_CAP_MS} THEN ({col} // 16) * 16 "
        f"ELSE {_TIMING_CAP_MS} END"
    )


@register(
    "quantile_timing_event_values",
    oracle=f"""
WITH ms AS (
  SELECT event_type,
         CAST(floor(value * 100) AS BIGINT) AS t_ms
  FROM events
),
grid AS (
  SELECT event_type, {_timing_grid_sql('t_ms')} AS g, count(*) AS c
  FROM ms GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, g, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY g) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS total
  FROM grid
)
SELECT event_type,
       CAST(min(CASE WHEN cum >= 0.5 * total THEN g END) AS BIGINT)
         AS p50_ms,
       CAST(min(CASE WHEN cum >= 0.9 * total THEN g END) AS BIGINT)
         AS p90_ms,
       CAST(min(CASE WHEN cum >= 0.99 * total THEN g END) AS BIGINT)
         AS p99_ms
FROM ranked GROUP BY event_type ORDER BY event_type
""",
    tags=["clickhouse-parity", "quantile"],
)
def quantile_timing_event_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``quantileTiming`` parity: the timing-specialized
    quantile whose values land on a fixed precision grid (1 ms buckets
    below 1024 ms, 16 ms up to 30 s, clamped after) — deterministic and
    mergeable where ``quantile`` samples.  Spark-first: one (type, grid)
    count aggregate, a cumulative window over the GRID (≤ ~2.8k rows per
    type by construction — never event volume), and the quantile is the
    first grid value whose cumulative count crosses q·total.  `value` is
    scaled ×100 into integer pseudo-milliseconds."""
    ev = load_table(spark, sf_dir, "events")
    t_ms = F.floor(F.col("value") * 100).cast("long")
    g = (
        F.when(t_ms < 1024, t_ms)
        .when(t_ms <= _TIMING_CAP_MS, (t_ms / 16).cast("long") * 16)
        .otherwise(F.lit(_TIMING_CAP_MS))
    )
    grid = ev.select("event_type", g.alias("g")).groupBy(
        "event_type", "g"
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type").orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    ranked = grid.select(
        "event_type", "g", "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtot).alias("total"),
    )
    qcol = lambda q: F.min(  # noqa: E731
        F.when(F.col("cum") >= q * F.col("total"), F.col("g"))
    ).cast("long")
    return (
        ranked.groupBy("event_type")
        .agg(
            qcol(0.5).alias("p50_ms"),
            qcol(0.9).alias("p90_ms"),
            qcol(0.99).alias("p99_ms"),
        )
        .orderBy("event_type")
    )


@register(
    "running_accumulate_daily_by_type",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(sum(n) OVER (
         PARTITION BY event_type ORDER BY day
       ) AS BIGINT) AS cum_n
FROM d ORDER BY event_type, day
""",
    tags=["clickhouse-parity", "window"],
)
def running_accumulate_daily_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``runningAccumulate(sumState(n))`` parity: the
    cumulative fold of partial aggregate states along an order — the CH
    idiom for running totals before window functions existed.  Spark-
    first: the partial states ARE the per-(type, day) counts (one data
    shuffle), and the accumulate is a window cumsum over that days×types
    grid — never over raw rows."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select(
            "event_type", "day", "n",
            F.sum("n").over(w).cast("long").alias("cum_n"),
        )
        .orderBy("event_type", "day")
    )


# z-quantiles CH hardcodes for minSampleSize*: alpha=0.05 two-sided,
# power=0.8 (z_{1-alpha/2}, z_{power})
_Z_ALPHA = 1.9599639845400545
_Z_POWER = 0.8416212335729143
_MDE = 0.05  # minimum detectable effect on the conversion rate


@register(
    "min_sample_size_conversion_by_type",
    oracle=f"""
WITH rates AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         avg(CASE WHEN value > 50 THEN 1.0 ELSE 0.0 END) AS p1
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       floor(p1 * 1000000 + 0.5) / 1000000 AS baseline_rate,
       CAST(ceil(
         power({_Z_ALPHA} + {_Z_POWER}, 2)
         * (p1 * (1 - p1) + (p1 + {_MDE}) * (1 - p1 - {_MDE}))
         / ({_MDE} * {_MDE})
       ) AS BIGINT) AS min_sample_size
FROM rates ORDER BY event_type
""",
    tags=["clickhouse-parity", "ab-testing"],
)
def min_sample_size_conversion_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``minSampleSizeConversion(baseline, mde, power, alpha)``
    parity: the two-proportion z-test sample-size formula
    ``ceil((z_a + z_b)^2 * (p1(1-p1) + p2(1-p2)) / mde^2)`` with CH's
    alpha=0.05 / power=0.8 quantiles pinned as literals in BOTH engines
    (no normal-quantile library dependence).  Baseline conversion is the
    fraction of events with value > 50 per type — one aggregate, the
    formula is a map over the 5-row result."""
    ev = load_table(spark, sf_dir, "events")
    rates = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(
            F.when(F.col("value") > 50, 1.0).otherwise(0.0)
        ).alias("p1"),
    )
    p1 = F.col("p1")
    p2 = p1 + F.lit(_MDE)
    nss = F.ceil(
        F.lit((_Z_ALPHA + _Z_POWER) ** 2)
        * (p1 * (1 - p1) + p2 * (1 - p2))
        / F.lit(_MDE * _MDE)
    ).cast("long")
    return (
        rates.select(
            "event_type", "n",
            rnd(p1, 6).alias("baseline_rate"),
            nss.alias("min_sample_size"),
        )
        .orderBy("event_type")
    )


@register(
    "qualify_above_type_mean",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
FROM (
  SELECT event_type, value
  FROM events
  QUALIFY value > avg(value) OVER (PARTITION BY event_type)
)
GROUP BY event_type ORDER BY event_type
""",
    tags=["clickhouse-parity", "qualify"],
)
def qualify_above_type_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``QUALIFY`` clause parity (filter on a window result
    without a subquery): events whose value exceeds their type's mean.
    The oracle uses DuckDB's native QUALIFY; Spark has no QUALIFY
    keyword, so the same plan is the window + filter composition —
    which is exactly what both engines execute underneath.  One
    type-keyed window shuffle, then a 5-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    above = ev.withColumn("type_mean", F.avg("value").over(w)).filter(
        F.col("value") > F.col("type_mean")
    )
    return (
        above.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_above"),
            F.sum(F.floor("value").cast("long")).cast("long")
            .alias("sum_floor_value"),
        )
        .orderBy("event_type")
    )


@register(
    "grouping_sets_type_day",
    oracle="""
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), '<all>') AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(event_type) AS BIGINT) AS g_type,
       CAST(grouping(CAST(ts AS DATE)) AS BIGINT) AS g_day
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
ORDER BY event_type, day
""",
    tags=["clickhouse-parity", "grouping-sets"],
)
def grouping_sets_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``GROUP BY GROUPING SETS ((a), (b), ())`` parity with
    ``grouping()`` markers — the explicit-sets form CUBE/ROLLUP rows
    don't cover (per-type totals + per-day totals + grand total, no
    (type, day) cells).  Spark computes all sets in ONE pass (Expand +
    single aggregate exchange); string-coalesced keys so the hash
    compare is NULL-free."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("gs_events")
    return spark.sql("""
        SELECT coalesce(event_type, '<all>') AS event_type,
               coalesce(CAST(to_date(ts) AS STRING), '<all>') AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(grouping(event_type) AS BIGINT) AS g_type,
               CAST(grouping(to_date(ts)) AS BIGINT) AS g_day
        FROM gs_events
        GROUP BY GROUPING SETS ((event_type), (to_date(ts)), ())
        ORDER BY event_type, day
    """)
