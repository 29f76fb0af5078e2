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
