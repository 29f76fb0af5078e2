"""Correlated scalar subquery (J7) and range-join queries under the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..operators.range_join import range_join
from ..operators.scd import scd2_from_history
from .registry import register


@register(
    "correlated_min_price_part",
    oracle="""
SELECT l.l_partkey AS partkey, p.p_name,
       floor(min(l.l_extendedprice / l.l_quantity) * 100 + 0.5) / 100
         AS min_unit_price,
       CAST(count(*) AS BIGINT) AS n_min_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_extendedprice / l.l_quantity <= (
  SELECT min(l2.l_extendedprice / l2.l_quantity) + 0.0001
  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey, p.p_name
""",
    tags=["J7", "A4"],
)
def correlated_min_price_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — 'rows at the per-key minimum' (the
    reference's SCD2 close step uses the same correlated-min shape,
    dim_agent_scd2.sql:3-10).  Expressed decorrelated, which is what Catalyst
    rewrites the SQL form into anyway: per-key min aggregate joined back
    (ε-tolerance on the double comparison keeps both engines agreeing)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    lines = li.select("l_partkey", unit)
    mins = lines.groupBy("l_partkey").agg(
        (F.min("unit_price") + 0.0001).alias("min_bound")
    )
    return (
        lines.join(mins, "l_partkey")
        .filter(F.col("unit_price") <= F.col("min_bound"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("p_name"))
        .agg(
            rnd(F.min("unit_price"), 2).alias("min_unit_price"),
            F.count(F.lit(1)).alias("n_min_lines"),
        )
    )


@register(
    "range_join_version_intervals",
    oracle="""
WITH h AS (
  SELECT user_id, ts, event_type,
         CASE WHEN row_number() OVER w = 1
                OR lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), v AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS ver
  FROM h
), g AS (
  SELECT user_id, ver, min(event_type) AS ver_type, min(ts) AS effective_from
  FROM v GROUP BY user_id, ver
), iv AS (
  SELECT user_id, ver_type, effective_from,
         lead(effective_from) OVER (PARTITION BY user_id
                                    ORDER BY effective_from) AS effective_to
  FROM g
)
SELECT e.event_id, iv.ver_type
FROM events e
JOIN iv ON iv.user_id = e.user_id
       AND e.ts >= iv.effective_from
       AND (iv.effective_to IS NULL OR e.ts < iv.effective_to)
""",
    tags=["range-join", "J2", "SCD2"],
)
def range_join_version_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed range join: every event matched to the SCD2 version interval
    covering it — the [effective_from, effective_to) containment form of the
    as-of lookup (SURVEY.md J2 option b).  Every event falls in exactly one
    interval, so the join is row-preserving (asserted by the oracle's row
    count)."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2_from_history(ev, "user_id", ["event_type"], "ts").select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("ver_type"),
        "effective_from",
        "effective_to",
    )
    probe = ev.select("event_id", "user_id", "ts")
    joined = range_join(
        probe.withColumnRenamed("user_id", "d_user_id"),
        dim,
        left_ts="ts",
        right_start="effective_from",
        right_end="effective_to",
        on="d_user_id",
    )
    return joined.select("event_id", "ver_type")
