"""Aggregation surface beyond the reference (SURVEY.md §2.4 notes what the
reference lacks: grouping sets / rollup / cube, approximate aggregates,
percentiles).  A complete engine offers them; each is a one-liner in
DataFrame/Catalyst and rides partial aggregation like any group-by."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


@register(
    "rollup_year_priority",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS year, o_orderpriority,
       CAST(count(*) AS BIGINT) AS cnt,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_price
FROM orders
GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
""",
    tags=["rollup"],
)
def rollup_year_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — per (year, priority), per year, and grand total in
    one pass (no natural NULLs in the grouping columns, so the subtotal rows
    are unambiguous)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").cast("int").alias("year"), F.col("o_orderpriority")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            rnd(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "cube_segment_priority",
    oracle="""
SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(c_mktsegment, o_orderpriority)
""",
    tags=["cube"],
)
def cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all 2^2 grouping sets of (segment, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "percentile_event_values",
    oracle="""
SELECT event_type,
       floor(quantile_cont("value", 0.5) * 10000 + 0.5) / 10000 AS p50,
       floor(quantile_cont("value", 0.9) * 10000 + 0.5) / 10000 AS p90,
       floor(quantile_cont("value", 0.99) * 10000 + 0.5) / 10000 AS p99
FROM events
GROUP BY event_type
""",
    tags=["percentile"],
)
def percentile_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`) — the latency-SLO aggregation shape."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        rnd(F.percentile("value", 0.5), 4).alias("p50"),
        rnd(F.percentile("value", 0.9), 4).alias("p90"),
        rnd(F.percentile("value", 0.99), 4).alias("p99"),
    )


@register(
    "session_windows_gap",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 OR
                   lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_event,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered GROUP BY user_id, session_no
""",
    tags=["session-window", "ST5"],
)
def session_windows_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows: ``F.session_window(ts, '30 minutes')`` merges
    events within the gap into one window — the batch twin of the stateful
    streaming sessionizer (streaming/stateful.py), checked against the
    lag/cumsum islands formulation in SQL."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_event"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("w")
    )


@register("approx_distinct_daily_users", tags=["approx"])  # rows-only
def approx_distinct_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per day — the 100 TB cardinality
    estimator (sketch internals differ per engine, so no SQL oracle; the
    rows-only check plus tests/test_agg_extras.py's error-bound assertion
    cover it)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
