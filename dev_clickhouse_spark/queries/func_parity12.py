"""Round-12 ClickHouse function-parity batch: seriesOutliersDetectTukey
(the 23.x time-series analysis family) — plus the Gopher/C4 document-
quality rule set lives in llm/text.py (gopher_quality_flags).

Each query is registry-gated against a DuckDB oracle computing the same
semantics declaratively (reference uses stock ClickHouse, so its users
have the whole aggregate-function surface; SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register


@register(
    "series_outliers_tukey",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, day, n,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY n, day)
              AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS cnt
  FROM daily
), q AS (
  SELECT event_type,
         min(CASE WHEN rk * 4 >= cnt     THEN n END) AS q1,
         min(CASE WHEN rk * 4 >= 3 * cnt THEN n END) AS q3
  FROM r GROUP BY event_type
)
SELECT r.event_type,
       max(r.cnt) AS n_days,
       min(q.q1) AS q1,
       min(q.q3) AS q3,
       CAST(sum(CASE WHEN r.n < q.q1 - 1.5 * (q.q3 - q.q1)
                       OR r.n > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM r JOIN q ON r.event_type = q.event_type
GROUP BY r.event_type
""",
    tags=["clickhouse-parity", "timeseries"],
)
def series_outliers_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``seriesOutliersDetectTukey`` parity: per event-type
    daily-count series, flag points outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]
    with EXACT lower-bound quartiles (least value whose rank reaches
    q x n — the quantiles_exact_weighted convention, integer arithmetic
    until the final 1.5·IQR fence so both engines agree bit-for-bit).

    Scale shape: one date-bucketed aggregate (map-side combinable), one
    ranking window per series, one broadcast-sized quartile table joined
    back — at 100 TB the window partitions by series key and the
    quartile table is bounded by series cardinality."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("n", "day")
    cw = Window.partitionBy("event_type")
    r = daily.select(
        "event_type", "day", "n",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    q = r.groupBy("event_type").agg(
        F.min(F.when(F.col("rk") * 4 >= F.col("cnt"), F.col("n")))
        .alias("q1"),
        F.min(F.when(F.col("rk") * 4 >= 3 * F.col("cnt"), F.col("n")))
        .alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    outlier = (
        (F.col("n") < F.col("q1") - 1.5 * iqr)
        | (F.col("n") > F.col("q3") + 1.5 * iqr)
    )
    return (
        r.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("cnt").alias("n_days"),
            F.min("q1").alias("q1"),
            F.min("q3").alias("q3"),
            F.sum(outlier.cast("long")).alias("n_outliers"),
        )
    )


@register(
    "series_period_acf",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT d.event_type, k.k, d.n,
         lag(d.n, k.k) OVER (PARTITION BY d.event_type, k.k
                             ORDER BY d.day) AS ln
  FROM daily d CROSS JOIN (
    SELECT unnest(generate_series(1, 7)) AS k) k
), acf AS (
  SELECT event_type, k,
         corr(n, ln) AS r,
         CAST(count(ln) AS BIGINT) AS n_pairs
  FROM lagged WHERE ln IS NOT NULL
  GROUP BY event_type, k
  HAVING count(ln) >= 3
), ranked AS (
  SELECT event_type, k, r, n_pairs,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY floor(r * 10000 + 0.5) DESC, k)
           AS rk
  FROM acf WHERE r IS NOT NULL
)
SELECT event_type,
       CAST(k AS INTEGER) AS best_period,
       floor(r * 10000 + 0.5) / 10000 AS acf,
       n_pairs
FROM ranked WHERE rk = 1
""",
    tags=["clickhouse-parity", "timeseries"],
)
def series_period_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``seriesPeriodDetectFFT`` stand-in via the autocorrelation
    function: per event-type daily series, the lag k ∈ [1, 7] with the
    highest Pearson autocorrelation (rounded to 4 dp BEFORE ranking so
    the argmax tie-break — smallest k — is identical across engines).
    The FFT gives the same argmax on short seasonal series; ACF is the
    SQL-expressible formulation both engines replay exactly.

    Scale shape: the daily aggregate is map-side combinable; the lag
    fan-out is a bounded ×7 explode over the GRID-sized series (days ×
    types — the calendar, not the data), so everything after the first
    aggregate is broadcast-scale at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    # Spark's lag() needs a LITERAL offset — fan the bounded k range out
    # as one union of 7 fixed-offset windows (the oracle's k cross join)
    parts = []
    for k in range(1, 8):
        w = Window.partitionBy("event_type").orderBy("day")
        parts.append(
            daily.select(
                "event_type",
                F.lit(k).alias("k"),
                "n",
                F.lag("n", k).over(w).alias("ln"),
            )
        )
    lagged = parts[0]
    for p in parts[1:]:
        lagged = lagged.unionByName(p)
    acf = (
        lagged.filter(F.col("ln").isNotNull())
        .groupBy("event_type", "k")
        .agg(
            F.corr("n", "ln").alias("r"),
            F.count("ln").alias("n_pairs"),
        )
        .filter((F.col("n_pairs") >= 3) & F.col("r").isNotNull())
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.floor(F.col("r") * 10000 + 0.5).desc(), F.asc("k")
    )
    return (
        acf.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("k").cast("int").alias("best_period"),
            (F.floor(F.col("r") * 10000 + 0.5) / 10000).alias("acf"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
        )
    )
