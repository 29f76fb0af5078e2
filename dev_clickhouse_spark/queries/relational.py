"""Operator-focused queries (SURVEY.md §2.2-§2.3, §2.8, §2.11) with oracles.

Each query exercises exactly one composite operator the reference relies on —
anti-join upsert guards, null-safe joins, ASOF lookup, argMin, DISTINCT ON,
replacing-merge dedupe, SCD2 versioning, array explode, JSON extraction, date
and time dimension builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import (
    day_of_week_mon1,
    iso_week,
    time_key,
    to_yyyymmdd,
)
from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..operators.asof import asof_join
from ..operators.dedupe import replacing_dedupe
from ..operators.scd import scd2_from_history
from .registry import register

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# ---------------------------------------------------------------------------
# J1 — left anti join (insert-only-new idiom)
# ---------------------------------------------------------------------------

@register(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00') o
  ON o.o_custkey = c.c_custkey
WHERE o.o_custkey IS NULL
""",
    tags=["J1"],
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's idempotent-insert guard (dim_date.sql:50-52):
    LEFT JOIN target ... WHERE target.key IS NULL → Spark left_anti.
    Window-restricted so the new-rows set is non-empty (the incremental-load
    shape: which keys in the window are not yet in the target)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    return cust.join(
        win.select("o_custkey").distinct(),
        cust.c_custkey == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# J9 — null-safe equi join (IS NOT DISTINCT FROM / eqNullSafe)
# ---------------------------------------------------------------------------

@register(
    "null_safe_join_priority_buckets",
    oracle="""
WITH a AS (
  SELECT nullif(o_orderpriority, '1-URGENT') AS prio,
         CAST(count(*) AS BIGINT) AS all_cnt
  FROM orders GROUP BY 1
), b AS (
  SELECT nullif(o_orderpriority, '1-URGENT') AS prio,
         CAST(count(*) AS BIGINT) AS big_cnt
  FROM orders WHERE o_totalprice > 100000 GROUP BY 1
)
SELECT a.prio, a.all_cnt, b.big_cnt
FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
""",
    tags=["J9", "P5"],
)
def null_safe_join_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join — reference legacy MERGE joins on
    `IS NOT DISTINCT FROM` ×4 cols (06_dynamic_dag_metadata.sql:1482-1486);
    Spark `eqNullSafe` (<=>) is the exact equivalent."""
    orders = load_table(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    a = orders.groupBy(prio.alias("prio")).agg(F.count(F.lit(1)).alias("all_cnt"))
    b = (
        orders.filter(F.col("o_totalprice") > 100000)
        .groupBy(prio.alias("prio"))
        .agg(F.count(F.lit(1)).alias("big_cnt"))
    )
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.prio").eqNullSafe(F.col("b.prio")))
        .select(F.col("a.prio").alias("prio"), "all_cnt", "big_cnt")
    )


# ---------------------------------------------------------------------------
# J2 — ASOF join
# ---------------------------------------------------------------------------

@register(
    "asof_join_last_purchase",
    oracle="""
SELECT e.event_id,
       p.event_id AS purchase_event_id,
       floor(p."value" * 100 + 0.5) / 100 AS purchase_value
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts, event_id, "value" FROM events
                WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""",
    tags=["J2"],
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF LEFT JOIN — for every event, the user's most recent purchase at or
    before it (reference fact_wazuh_events.sql:60-68 picks the SCD2 version in
    effect at event time the same way).  Union-and-carry-forward rewrite: one
    shuffle, no row blowup (operators/asof.py)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_event_id"),
        rnd(F.col("value"), 2).alias("purchase_value"),
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
    )
    return out.select("event_id", "purchase_event_id", "purchase_value")


# ---------------------------------------------------------------------------
# A5 — argMin / A7 — DISTINCT ON
# ---------------------------------------------------------------------------

@register(
    "argmin_first_event_per_user",
    oracle="""
SELECT user_id,
       arg_min(event_type, ts) AS first_type,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
FROM events GROUP BY user_id
""",
    tags=["A5", "A4"],
)
def argmin_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMin(attr, ts) — earliest-seen attribute per key (reference
    dim_agent_scd2.sql:44) → Spark min_by."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_type"),
        F.date_format(F.min("ts"), TS_FMT).alias("first_ts"),
    )


@register(
    "argmax_last_event_per_user",
    oracle="""
SELECT user_id,
       arg_max(event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '#' ||
               lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_type,
       floor(arg_max("value",
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '#' ||
               lpad(CAST(event_id AS VARCHAR), 12, '0')) * 100 + 0.5) / 100
         AS last_value,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM events GROUP BY user_id
""",
    tags=["A5", "clickhouse-parity"],
)
def argmax_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMax(attr, ts) / anyLast — latest-seen attribute per key (the
    ClickHouse twin of `argmin_first_event_per_user`) → Spark max_by.
    Ties on ts are broken deterministically by a lexicographic
    ``ts '#' zero-padded event_id`` key, spelled identically in both
    engines, so the oracle comparison never depends on engine-internal
    tie order.  Same shape as any hash group-by: one shuffle, map-side
    partial max_by state is a single (key, attr) pair per group."""
    ev = load_table(spark, sf_dir, "events")
    tie_key = F.concat(
        F.date_format("ts", TS_FMT), F.lit("#"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", tie_key).alias("last_type"),
        rnd(F.max_by("value", tie_key), 2).alias("last_value"),
        F.date_format(F.max("ts"), TS_FMT).alias("last_ts"),
    )


@register(
    "distinct_on_latest_event",
    oracle="""
SELECT user_id, event_id, event_type, floor("value" * 100 + 0.5) / 100 AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""",
    tags=["A7", "W2"],
)
def distinct_on_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `DISTINCT ON (key) ... ORDER BY key, ts DESC` — latest row per key
    (reference 06_dynamic_dag_metadata.sql:1081-1088) → row_number window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", rnd("value", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# S4 — replacing-merge last-write-wins dedupe
# ---------------------------------------------------------------------------

@register(
    "dedupe_last_write_wins",
    oracle="""
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       floor("value" * 100 + 0.5) / 100 AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""",
    tags=["S4"],
)
def dedupe_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree(updated_at) last-write-wins by key — synchronous
    dedupe (operators/dedupe.replacing_dedupe), reference
    03_gold_tables.sql:124-126."""
    ev = load_table(spark, sf_dir, "events")
    out = replacing_dedupe(
        ev, ["user_id", "event_type"], version_col="ts", tiebreak=["event_id"]
    )
    return out.select(
        "user_id",
        "event_type",
        F.date_format("ts", TS_FMT).alias("last_ts"),
        rnd("value", 2).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# U1/U2 — UNION ALL conform + distinct
# ---------------------------------------------------------------------------

@register(
    "union_conform_nations",
    oracle="""
SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS entity_count
FROM (
  SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
GROUP BY n_name
""",
    tags=["U1", "A2"],
)
def union_conform_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL source-conform then aggregate — the conformed-dimension build
    (reference dim_sensor.sql:20-28 unifies 3 streams the same way)."""
    cust, supp, nation = (
        load_table(spark, sf_dir, t) for t in ("customer", "supplier", "nation")
    )
    c = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "n_name"
    )
    s = supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "n_name"
    )
    return (
        c.unionByName(s)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("entity_count"))
    )


# ---------------------------------------------------------------------------
# §2.8 JSON — props extraction
# ---------------------------------------------------------------------------

@register(
    "json_extract_props",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS cnt,
       floor(avg("value") * 10000 + 0.5) / 10000 AS avg_value
FROM events
GROUP BY 1
""",
    tags=["P4", "JSON"],
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON extraction (reference 02_kafka_ingest.sql.tmpl
    JSON_VALUE layer) → get_json_object staying in codegen."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("int").alias("k")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        rnd(F.avg("value"), 4).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# §2.8 date/time — dim_date and dim_time builds
# ---------------------------------------------------------------------------

@register(
    "dim_date_build",
    oracle="""
SELECT DISTINCT
  CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
  CAST(o_orderdate AS DATE)  AS date,
  CAST(year(o_orderdate)     AS INTEGER) AS year,
  CAST(quarter(o_orderdate)  AS INTEGER) AS quarter,
  CAST(month(o_orderdate)    AS INTEGER) AS month,
  CAST(day(o_orderdate)      AS INTEGER) AS day,
  CAST(weekofyear(o_orderdate) AS INTEGER) AS week_of_year,
  CAST(isodow(o_orderdate)   AS INTEGER) AS day_of_week
FROM orders
""",
    tags=["A3", "dim_date"],
)
def dim_date_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_date from observed dates (reference dim_date.sql:27-35):
    toYYYYMMDD key + calendar attributes, ISO week, Mon=1 day-of-week
    (toDayOfWeek remap — SURVEY.md §2.8 caveat)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        to_yyyymmdd("o_orderdate").alias("date_key"),
        F.to_date("o_orderdate").alias("date"),
        F.year("o_orderdate").cast("int").alias("year"),
        F.quarter("o_orderdate").cast("int").alias("quarter"),
        F.month("o_orderdate").cast("int").alias("month"),
        F.dayofmonth("o_orderdate").cast("int").alias("day"),
        iso_week("o_orderdate").alias("week_of_year"),
        day_of_week_mon1("o_orderdate").alias("day_of_week"),
    ).distinct()


@register(
    "dim_time_complete",
    oracle="""
SELECT CAST((s // 3600) * 10000 + ((s % 3600) // 60) * 100 + s % 60 AS INTEGER) AS time_key,
       CAST(s // 3600 AS INTEGER) AS hour,
       CAST((s % 3600) // 60 AS INTEGER) AS minute,
       CAST(s % 60 AS INTEGER) AS second
FROM (SELECT unnest(range(86400)) AS s)
""",
    tags=["dim_time", "generate_series"],
)
def dim_time_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete 86,400-row time dimension — the legacy PG build via
    generate_series(0,86399) (reference 06_dynamic_dag_metadata.sql:522-523);
    chosen over the CH incremental-from-data variant as a strict superset
    (SURVEY.md §2.8 note)."""
    return spark.range(86400).select(
        ((F.col("id") / 3600).cast("int") * 10000
         + ((F.col("id") % 3600) / 60).cast("int") * 100
         + (F.col("id") % 60).cast("int")).cast("int").alias("time_key"),
        (F.col("id") / 3600).cast("int").alias("hour"),
        ((F.col("id") % 3600) / 60).cast("int").alias("minute"),
        (F.col("id") % 60).cast("int").alias("second"),
    )


@register(
    "event_date_time_keys",
    oracle="""
SELECT event_id,
       CAST(strftime(ts, '%Y%m%d') AS INTEGER) AS date_key,
       CAST(hour(ts) * 10000 + minute(ts) * 100 + second(ts) AS INTEGER) AS time_key
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
""",
    tags=["P1", "date_key"],
)
def event_date_time_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side date_key/time_key derivation (reference
    fact_wazuh_events.sql:28-33) over an incremental window."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
    ).select(
        "event_id",
        to_yyyymmdd("ts").alias("date_key"),
        time_key("ts").alias("time_key"),
    )


# ---------------------------------------------------------------------------
# §2.11 SCD2 — full-history version build
# ---------------------------------------------------------------------------

@register(
    "scd2_user_type_versions",
    oracle="""
WITH h AS (
  SELECT user_id, ts, event_type,
         CASE WHEN row_number() OVER w = 1
                OR lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), v AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS ver
  FROM h
), g AS (
  SELECT user_id, ver, min(event_type) AS event_type, min(ts) AS effective_from
  FROM v GROUP BY user_id, ver
)
SELECT user_id, event_type,
       strftime(effective_from, '%Y-%m-%d %H:%M:%S.%f') AS effective_from,
       strftime(lead(effective_from) OVER (PARTITION BY user_id
                                           ORDER BY effective_from),
                '%Y-%m-%d %H:%M:%S.%f') AS effective_to,
       CAST(CASE WHEN lead(effective_from) OVER (PARTITION BY user_id
                                                 ORDER BY effective_from)
                 IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM g
""",
    tags=["SCD2", "W2"],
)
def scd2_user_type_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version table from event history (operators/scd.scd2_from_history)
    — the close/open semantics of reference dim_agent_scd2.sql expressed as a
    deterministic full build: null-safe change detection, effective_from =
    first ts of the run, effective_to = next version's start."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2_from_history(ev, "user_id", ["event_type"], "ts")
    return dim.select(
        "user_id",
        "event_type",
        F.date_format("effective_from", TS_FMT).alias("effective_from"),
        F.date_format("effective_to", TS_FMT).alias("effective_to"),
        F.col("is_current").cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# ST6 — lag observability (dateDiff seconds)
# ---------------------------------------------------------------------------

@register(
    "event_lag_seconds",
    oracle="""
SELECT event_id,
       CAST(floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id)))
            AS BIGINT) AS lag_s
FROM events
""",
    tags=["ST6", "W2"],
)
def event_lag_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dateDiff('second', prev_ts, ts) per user — the reference's lag metric
    shape (fact_wazuh_events.sql:38-42) via a lag window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .cast("bigint")
        .alias("lag_s"),
    )


# ---------------------------------------------------------------------------
# §2.8 — lenient timestamp parsing (parseDateTime64BestEffortOrNull)
# ---------------------------------------------------------------------------

@register(
    "ts_parse_roundtrip",
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS iso_text,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f')  AS reparsed
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-03 00:00:00'
""",
    tags=["P4", "parse_ts"],
)
def ts_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_ts_best_effort under the oracle: format each timestamp to
    Z-suffixed ISO text (the wire format the security events carry), run it
    through the lenient parser, and emit the reparsed value — any parse
    drift shows as a value mismatch against DuckDB's trivial strftime."""
    from ..functions.ch_compat import parse_ts_best_effort

    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    ).select(
        "event_id",
        iso.alias("iso_text"),
        F.date_format(parse_ts_best_effort(iso), TS_FMT).alias("reparsed"),
    )


# ---------------------------------------------------------------------------
# O2 — multi-key sort + limit
# ---------------------------------------------------------------------------

@register(
    "multi_key_daily_top",
    oracle="""
SELECT CAST(ts AS DATE) AS event_date, event_type, CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY 1, 2
ORDER BY event_date DESC, cnt DESC, event_type
LIMIT 20
""",
    tags=["O2", "A2"],
)
def multi_key_daily_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY event_date DESC, count DESC — reference
    superset_sql_examples.sql:18 multi-key sort with deterministic tie-break."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("event_date"), F.desc("cnt"), F.asc("event_type"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# ClickHouse LIMIT n BY — per-group head without a self-join
# ---------------------------------------------------------------------------

@register(
    "limit_by_recent_events",
    oracle="""
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn <= 2
""",
    tags=["clickhouse-parity", "limit-by", "W2"],
)
def limit_by_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``SELECT ... ORDER BY ts DESC LIMIT 2 BY user_id`` — the
    per-group head clause (docs §select/limit-by; the generalization of
    ``distinct_on_latest_event``'s rn=1).  One row_number window over the
    (user, ts desc, event_id desc) order — a single hash shuffle with
    per-partition sort, no self-join, no global top-k; the deterministic
    event_id tie-break keeps both engines' heads identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "user_id", "event_id", "event_type",
            F.date_format("ts", TS_FMT).alias("ts_s"),
        )
    )


@register(
    "any_left_join_customer_order",
    oracle="""
WITH first_order AS (
  SELECT o_custkey,
         min(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_mktsegment,
       f.o_orderkey AS any_orderkey,
       CAST(CAST(o.o_totalprice AS DECIMAL(19,4)) * 100 AS BIGINT)
         AS any_total_cents
FROM customer c
LEFT JOIN first_order f ON f.o_custkey = c.c_custkey
LEFT JOIN orders o ON o.o_orderkey = f.o_orderkey
""",
    tags=["clickhouse-parity", "any-join", "J-strictness"],
)
def any_left_join_customer_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``LEFT ANY JOIN`` strictness parity: each left row pairs
    with AT MOST ONE right row.  Stock ClickHouse picks an arbitrary
    match; pinned deterministic here (lowest ``o_orderkey``) so the
    result is stable and oracle-checkable.  Spark-first: the right side
    collapses to one row per key with ``min_by`` BEFORE the join — a
    map-side-combinable aggregate — so the join itself is 1:≤1 and can
    never expand; at 100 TB that pre-aggregation is the difference
    between a bounded join and a fan-out on hot customers."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    one = orders.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("any_orderkey"),
        (
            F.min_by(
                F.col("o_totalprice").cast("decimal(19,4)"), "o_orderkey"
            ) * 100
        ).cast("bigint").alias("any_total_cents"),
    )
    return cust.join(
        one, cust.c_custkey == one.o_custkey, "left"
    ).select("c_custkey", "c_mktsegment", "any_orderkey", "any_total_cents")


@register(
    "limit_by_offset_events",
    oracle="""
SELECT user_id, event_id, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn > 1 AND rn <= 3
""",
    tags=["clickhouse-parity", "limit-by", "W2"],
)
def limit_by_offset_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``LIMIT 2 OFFSET 1 BY user_id`` — the offset form of the per-group
    head clause (skip each user's newest event, take the next two).
    Same single window shuffle as ``limit_by_recent_events``; only the
    rank band changes, so WindowGroupLimit still bounds the sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 1) & (F.col("rn") <= 3))
        .select("user_id", "event_id", "event_type")
    )
