"""Gold star-schema build on the driver tables — the SIEM gold pipeline shape
(dims by surrogate hash key + fact with recomputed keys + anti-join dedupe)
run end-to-end under the DuckDB oracle.

The real gold builders (gold/dims.py, gold/facts.py) operate on the security
streams and are covered by the end-to-end pytest suite; these queries run the
SAME keying/join discipline on the ``events`` table so the driver's
correctness gate exercises it: joins happen ON the xxhash64 surrogate keys
internally, but only natural columns are emitted (the oracle cannot compute
xxhash64 — and doesn't need to: the reference recomputes keys from natural
columns on both sides, SURVEY.md J3, so key correctness is observable as join
correctness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import surrogate_key, time_key, to_yyyymmdd
from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


def _dim_user(ev: DataFrame) -> DataFrame:
    """SCD1-style dim build: distinct natural key → surrogate key."""
    return ev.select("user_id").distinct().select(
        surrogate_key("user_id").alias("user_key"), "user_id"
    )


def _dim_type(ev: DataFrame) -> DataFrame:
    return ev.select("event_type").distinct().select(
        surrogate_key("event_type").alias("type_key"), "event_type"
    )


@register(
    "gold_star_build_events",
    oracle="""
SELECT e.event_id,
       CAST(strftime(e.ts, '%Y%m%d') AS INTEGER) AS date_key,
       CAST(hour(e.ts) * 10000 + minute(e.ts) * 100 + second(e.ts) AS INTEGER)
         AS time_key,
       e.user_id, e.event_type,
       floor(e."value" * 100 + 0.5) / 100 AS value
FROM events e
WHERE e.ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND e.ts <  TIMESTAMP '2024-01-15 00:00:00'
""",
    tags=["gold", "J3", "P1"],
)
def gold_star_build_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window → dims → fact with hash-key star joins, emitting natural
    columns.  A dropped/duplicated/mismatched surrogate key anywhere shows up
    as a row-count or value mismatch against the trivially-natural oracle."""
    ev = load_table(spark, sf_dir, "events")
    win = ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    dim_user = _dim_user(win)
    dim_type = _dim_type(win)
    fact = win.select(
        "event_id",
        to_yyyymmdd("ts").alias("date_key"),
        time_key("ts").alias("time_key"),
        surrogate_key("user_id").alias("user_key"),
        surrogate_key("event_type").alias("type_key"),
        rnd("value", 2).alias("value"),
    )
    # star joins ON the hash keys (the reference's J3 discipline), natural
    # attributes come back from the dims
    return (
        fact.join(dim_user, on="user_key", how="left")
        .join(F.broadcast(dim_type), on="type_key", how="left")
        .select("event_id", "date_key", "time_key", "user_id", "event_type", "value")
    )


@register(
    "gold_star_rollup_events",
    oracle="""
WITH f AS (
  SELECT user_id, event_type, "value"
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    AND ts <  TIMESTAMP '2024-01-15 00:00:00'
)
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       floor(sum("value") * 100 + 0.5) / 100 AS total_value
FROM f GROUP BY user_id, event_type
""",
    tags=["gold", "J5", "A2"],
)
def gold_star_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI rollup over the star: fact grouped by dim attributes reached through
    the hash-key joins (fact → broadcast dims → group) — the
    'top signatures' query shape against our own gold build."""
    ev = load_table(spark, sf_dir, "events")
    win = ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    dim_user = _dim_user(win)
    dim_type = _dim_type(win)
    fact = win.select(
        surrogate_key("user_id").alias("user_key"),
        surrogate_key("event_type").alias("type_key"),
        "value",
    )
    return (
        fact.join(dim_user, "user_key")
        .join(F.broadcast(dim_type), "type_key")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
    )
