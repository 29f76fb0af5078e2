"""Round-11b ClickHouse function-parity batch: exponentialTimeDecayedSum/
Avg, groupArraySorted/groupArrayLast, minSampleSizeContinous.

Each query is registry-gated against a DuckDB oracle computing the same
semantics declaratively (reference uses stock ClickHouse, so its users have
the whole aggregate-function surface; SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


@register(
    "exp_time_decayed_daily",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST("value" AS DECIMAL(19,4))) AS DOUBLE) AS total
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
idx AS (
  SELECT event_type, day, total,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
),
rec AS (
  SELECT event_type, i, day, total,
         total AS dsum, CAST(1.0 AS DOUBLE) AS dcnt
  FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.event_type, idx.i, idx.day, idx.total,
         idx.total + rec.dsum
           * pow(0.5, CAST(date_diff('day', rec.day, idx.day) AS DOUBLE)),
         1.0 + rec.dcnt
           * pow(0.5, CAST(date_diff('day', rec.day, idx.day) AS DOUBLE))
  FROM idx JOIN rec
    ON idx.event_type = rec.event_type AND idx.i = rec.i + 1
)
SELECT event_type, day,
       floor(dsum * 10000 + 0.5) / 10000 AS decayed_sum,
       floor(dsum / dcnt * 10000 + 0.5) / 10000 AS decayed_avg
FROM rec
""",
    tags=["clickhouse-parity", "time-decay"],
)
def exp_time_decayed_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedSum(x)(v, t)`` /
    ``exponentialTimeDecayedAvg`` parity over the daily value series per
    event_type, in the half-life formulation (x = 1/ln 2 days, so the
    decay between points is ``0.5^Δdays`` — an EXACT power of two in
    both engines, sidestepping exp() last-ulp divergence; the CH
    semantics are unchanged, only the time constant is pinned).

    Same distributed shape as ``ema_daily_order_totals``: a data-sized
    exact-DECIMAL aggregate collapses events to the per-type daily grid
    (~hundreds of rows at any sf — the time dimension, not the data
    dimension), then ONE ``aggregate`` fold per type walks the sorted
    grid carrying (prev day, decayed sum, decayed count).  The oracle
    replays the identical recurrence as a recursive CTE."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(19,4)"))
        .cast("double")
        .alias("total")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "total"))).alias("s")
    )
    folded = series.select(
        "event_type",
        F.expr(
            """
            aggregate(
              slice(s, 2, size(s) - 1),
              struct(s[0].day AS day,
                     s[0].total AS dsum,
                     CAST(1.0 AS DOUBLE) AS dcnt,
                     array(struct(s[0].day AS day,
                                  s[0].total AS dsum,
                                  CAST(1.0 AS DOUBLE) AS dcnt)) AS out),
              (acc, x) -> struct(
                x.day AS day,
                x.total + acc.dsum
                  * power(0.5, CAST(datediff(x.day, acc.day) AS DOUBLE))
                  AS dsum,
                1.0 + acc.dcnt
                  * power(0.5, CAST(datediff(x.day, acc.day) AS DOUBLE))
                  AS dcnt,
                array_append(acc.out, struct(
                  x.day AS day,
                  x.total + acc.dsum
                    * power(0.5, CAST(datediff(x.day, acc.day) AS DOUBLE))
                    AS dsum,
                  1.0 + acc.dcnt
                    * power(0.5, CAST(datediff(x.day, acc.day) AS DOUBLE))
                    AS dcnt)) AS out),
              acc -> acc.out
            )
            """
        ).alias("out"),
    )
    e = F.explode("out").alias("e")
    return folded.select("event_type", e).select(
        "event_type",
        F.col("e.day").alias("day"),
        rnd(F.col("e.dsum"), 4).alias("decayed_sum"),
        rnd(F.col("e.dsum") / F.col("e.dcnt"), 4).alias("decayed_avg"),
    )


@register(
    "group_array_sorted_last",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       array_to_string(
         list_sort(list(CAST(floor("value" * 100 + 0.5) AS BIGINT)))[1:5],
         ',') AS smallest5,
       array_to_string(
         list(CAST(floor("value" * 100 + 0.5) AS BIGINT)
              ORDER BY ts, event_id)
           [greatest(1, CAST(count(*) AS BIGINT) - 4):
            CAST(count(*) AS BIGINT)],
         ',') AS last5
FROM events
GROUP BY user_id
""",
    tags=["clickhouse-parity", "group-array"],
)
def group_array_sorted_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArraySorted(5)(v)`` + ``groupArrayLast(5)(v)``
    parity per user: the 5 smallest values, and the last 5 values in
    (ts, event_id) arrival order — values as round-half-up cents so the
    comparison is exact integer arithmetic.  Both are bounded-state
    aggregates in CH (a heap of 5 per group); here one hash aggregate
    collects per-user arrays (user cardinality × 5 elements of state
    after the slice) — at 100 TB the same plan holds because the OUTPUT
    is bounded per key even though collect_list's intermediate is not;
    for unbounded-skew keys the heavy-hitter path (topk_heavy_hitters)
    is the scale valve.  Array columns serialize with ``array_join``
    (the repo convention, see group_array_user_events) so the oracle
    comparison is hash-stable across engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            """
            array_join(transform(
              slice(array_sort(collect_list(
                      CAST(floor(value * 100 + 0.5) AS BIGINT))), 1, 5),
              x -> CAST(x AS STRING)), ',')
            """
        ).alias("smallest5"),
        F.expr(
            """
            array_join(transform(
              slice(array_sort(collect_list(
                      struct(ts, event_id, value))),
                    greatest(1, size(collect_list(value)) - 4),
                    5),
              x -> CAST(CAST(floor(x.value * 100 + 0.5) AS BIGINT)
                        AS STRING)), ',')
            """
        ).alias("last5"),
    )


@register(
    "non_negative_derivative_daily",
    oracle="""
WITH d AS (
  SELECT event_type, ts, "value",
         lag("value") OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS pv,
         lag(ts) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) AS pt
  FROM events
),
r AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CASE WHEN pv IS NULL OR ts = pt THEN NULL
              WHEN ("value" - pv) < 0 THEN 0.0
              ELSE ("value" - pv)
                   / (date_diff('microsecond', pt, ts) / 1000000.0)
         END AS nnd
  FROM d
)
SELECT event_type, day,
       CAST(count(nnd) AS BIGINT) AS n_rates,
       floor(CAST(sum(CAST(nnd AS DECIMAL(27,12))) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS sum_rate_per_sec
FROM r GROUP BY event_type, day
""",
    tags=["clickhouse-parity", "time-series"],
)
def non_negative_derivative_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``nonNegativeDerivative(value, ts)`` window-function
    parity: per event_type ordered by (ts, event_id), the clamped rate
    ``max(0, Δvalue / Δseconds)`` — the counter-reset-tolerant gauge
    derivative.  ONE key shuffle for the lag window; each rate is a
    single IEEE divide on identical inputs in both engines, and the
    per-day sum is folded through DECIMAL so addition order cannot
    diverge the doubles.  Zero-Δt pairs yield NULL (CH skips them)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_type", "ts", "value",
        F.lag("value").over(w).alias("pv"),
        F.lag("ts").over(w).alias("pt"),
    )
    # testdata timestamps load as TIMESTAMP_NTZ; the session TZ is pinned
    # UTC, so the cast to TIMESTAMP is an exact reinterpretation and the
    # micros difference is integer-exact in both engines
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    dt_sec = (us("ts") - us("pt")) / F.lit(1000000.0)
    nnd = (
        F.when(F.col("pv").isNull() | (F.col("ts") == F.col("pt")), None)
        .when(
            (F.col("value") - F.col("pv")) < 0, F.lit(0.0)
        )
        .otherwise((F.col("value") - F.col("pv")) / dt_sec)
    )
    return (
        d.select(
            "event_type", F.to_date("ts").alias("day"), nnd.alias("nnd")
        )
        .groupBy("event_type", "day")
        .agg(
            F.count("nnd").alias("n_rates"),
            rnd(
                F.sum(F.col("nnd").cast("decimal(27,12)")).cast("double"),
                4,
            ).alias("sum_rate_per_sec"),
        )
    )


# z-quantiles CH hardcodes for minSampleSize*: alpha=0.05 two-sided,
# power=0.8 (z_{1-alpha/2}, z_{power}) — pinned as literals in BOTH engines
_Z_ALPHA = 1.9599639845400545
_Z_POWER = 0.8416212335729143
_MDE_REL = 0.05  # minimum detectable effect, relative to the baseline mean


@register(
    "min_sample_size_continuous_by_type",
    oracle=f"""
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST("value" AS DECIMAL(19,4))) AS DOUBLE) AS sx,
         CAST(sum(CAST("value" AS DECIMAL(19,4))
                * CAST("value" AS DECIMAL(19,4))) AS DOUBLE) AS sxx
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       floor(sx / n * 1000000 + 0.5) / 1000000 AS baseline_mean,
       CAST(ceil(
         2.0 * power({_Z_ALPHA} + {_Z_POWER}, 2)
         * ((sxx - sx * sx / n) / n)
         / power({_MDE_REL} * (sx / n), 2)
       ) AS BIGINT) AS min_sample_size
FROM s ORDER BY event_type
""",
    tags=["clickhouse-parity", "ab-testing"],
)
def min_sample_size_continuous_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``minSampleSizeContinous(baseline, sigma, mde, power,
    alpha)`` parity: the two-sample t-test sample-size formula
    ``ceil(2 (z_a + z_b)^2 sigma^2 / (mde * baseline)^2)`` with CH's
    alpha=0.05 / power=0.8 quantiles pinned as literals.  Baseline and
    sigma^2 come from ONE exact-DECIMAL power-sum aggregate per type
    (both engines fold identical doubles — the stats_moments
    discipline), the formula is a map over the 5-row result."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(19,4)"))
        .cast("double")
        .alias("sx"),
        F.sum(
            F.col("value").cast("decimal(19,4)")
            * F.col("value").cast("decimal(19,4)")
        )
        .cast("double")
        .alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx / n
    var = (sxx - sx * sx / n) / n
    nss = F.ceil(
        F.lit(2.0 * (_Z_ALPHA + _Z_POWER) ** 2)
        * var
        / F.pow(F.lit(_MDE_REL) * mean, F.lit(2.0))
    ).cast("long")
    return s.select(
        "event_type", "n",
        rnd(mean, 6).alias("baseline_mean"),
        nss.alias("min_sample_size"),
    ).orderBy("event_type")
