"""Spark SQL API surface: queries expressed as ``spark.sql`` over registered
views — the serving path a BI tool (reference: Superset over the ClickHouse
HTTP interface, SURVEY.md §3.3) would use via Thrift/Connect.  Also covers
window frame specs (ROWS BETWEEN), which the reference never uses (SURVEY.md
§2.5 note) — included as part of the complete engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views
from .registry import register


@register(
    "sql_revenue_by_region",
    oracle="""
SELECT r_name AS region,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue,
       CAST(count(*) AS BIGINT) AS line_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    tags=["SQL", "J5"],
)
def sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL star rollup through spark.sql — identical text modulo the
    rounding idiom runs on DuckDB; Catalyst broadcasts the dims on its own
    (no hints), demonstrating the optimizer path BI traffic takes."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT r_name AS region,
               floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
                 AS revenue,
               count(*) AS line_count
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """)


@register(
    "sql_moving_avg_frame",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS event_date, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
)
SELECT event_date, cnt,
       floor(avg(cnt) OVER (ORDER BY event_date
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             * 10000 + 0.5) / 10000 AS ma7
FROM daily
""",
    tags=["SQL", "W-frame"],
)
def sql_moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average with an explicit ROWS frame — window frame specs
    via spark.sql (beyond the reference's window surface)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS event_date, count(*) AS cnt
          FROM events GROUP BY 1
        )
        SELECT event_date, cnt,
               floor(avg(cnt) OVER (ORDER BY event_date
                                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                     * 10000 + 0.5) / 10000 AS ma7
        FROM daily
    """)
