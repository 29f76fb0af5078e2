"""Round-9 ClickHouse function-parity batch: window-frame functions
(nth_value / lagInFrame / leadInFrame / nonNegativeDerivative), DISTINCT
and -OrDefault aggregate combinators, the map higher-order-function
family (mapFilter / mapApply / mapContains), and boundingRatio.

Reference basis: all four surfaces are stock ClickHouse SQL available to
any consumer of the reference stack (docker-compose.yml:22 pins CH 24.3);
none need new physical machinery — each is expressed as Catalyst window /
aggregate / higher-order expressions so the whole batch stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


@register(
    "window_frame_functions_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS m,
         floor(CAST(sum(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE)
               * 100 + 0.5) / 100 AS total
  FROM orders GROUP BY 1, 2
)
SELECT d AS order_date, total,
       lag(total) OVER w AS prev_total,
       lead(total) OVER w AS next_total,
       nth_value(total, 3) OVER (PARTITION BY m ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_total,
       first_value(total) OVER (PARTITION BY m ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS month_first,
       CASE WHEN lag(total) OVER w IS NULL THEN NULL
            ELSE floor(greatest(total - lag(total) OVER w, 0)
                       / (date_diff('day', lag(d) OVER w, d) * 86400.0)
                       * 1000000 + 0.5) / 1000000 END AS nn_derivative
FROM daily
WINDOW w AS (PARTITION BY m ORDER BY d)
""",
    tags=["clickhouse-parity", "window-frame"],
)
def window_frame_functions_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse window-frame surface in one pass over daily order
    totals, partitioned by month so the window stays distributed:
    ``lagInFrame``/``leadInFrame`` (Spark lag/lead inside the ordered
    frame), ``nth_value(x, 3)``, ``first_value``, and
    ``nonNegativeDerivative(total, d)`` — the per-second rate clamped at
    zero, exactly CH's definition.  All inputs are pre-rounded doubles
    so both engines window over identical bits."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
    ).agg(
        rnd(
            F.sum(F.col("o_totalprice").cast("decimal(19,4)")).cast("double"),
            2,
        ).alias("total")
    )
    w = Window.partitionBy("m").orderBy("order_date")
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("total").over(w)
    prev_d = F.lag("order_date").over(w)
    secs = F.datediff(F.col("order_date"), prev_d) * F.lit(86400.0)
    return daily.select(
        "order_date",
        "total",
        prev.alias("prev_total"),
        F.lead("total").over(w).alias("next_total"),
        F.nth_value("total", 3).over(frame).alias("third_total"),
        F.first("total").over(frame).alias("month_first"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(rnd(F.greatest(F.col("total") - prev, F.lit(0.0)) / secs, 6))
        .alias("nn_derivative"),
    )


@register(
    "distinct_or_default_aggregates",
    oracle="""
SELECT l_returnflag,
       floor(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(19,4)))
                  AS DOUBLE) * 100 + 0.5) / 100 AS sum_distinct_qty,
       CAST(count(DISTINCT l_linestatus) AS BIGINT) AS uniq_statuses,
       floor(CAST(sum(DISTINCT CAST(l_discount AS DECIMAL(19,4)))
                  AS DOUBLE)
             / count(DISTINCT CAST(l_discount AS DECIMAL(19,4)))
             * 1000000 + 0.5) / 1000000 AS avg_distinct_discount,
       coalesce(max(CASE WHEN l_quantity > 1000000 THEN l_quantity END),
                -1.0) AS max_or_default,
       max(CASE WHEN l_quantity > 1000000 THEN l_quantity END)
         AS max_or_null
FROM lineitem
GROUP BY l_returnflag
""",
    tags=["clickhouse-parity", "combinators"],
)
def distinct_or_default_aggregates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``-Distinct`` and ``-OrDefault``/``-OrNull`` combinator parity:
    sumDistinct / uniqExact / avgDistinct (exact DECIMAL arithmetic so
    the distinct-set sums agree bitwise), and maxOrDefault/maxOrNull
    over an empty conditional set (the always-false predicate makes the
    empty-state behavior the thing under test: NULL for -OrNull, the
    default for -OrDefault)."""
    li = load_table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(19,4)")
    dd = F.col("l_discount").cast("decimal(19,4)")
    empty = F.max(F.when(F.col("l_quantity") > 1_000_000, F.col("l_quantity")))
    return li.groupBy("l_returnflag").agg(
        rnd(F.sum_distinct(qd).cast("double"), 2).alias("sum_distinct_qty"),
        F.count_distinct("l_linestatus").alias("uniq_statuses"),
        rnd(
            F.sum_distinct(dd).cast("double") / F.count_distinct(dd), 6
        ).alias("avg_distinct_discount"),
        F.coalesce(empty, F.lit(-1.0)).alias("max_or_default"),
        empty.alias("max_or_null"),
    )


@register(
    "map_functions_user_event_counts",
    oracle="""
WITH cnts AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
),
agg AS (
  SELECT user_id,
         string_agg(CASE WHEN cnt >= 2
                         THEN event_type || ':' || cnt * 10 END,
                    ',' ORDER BY event_type) AS filtered_map,
         CAST(count(*) AS INTEGER) AS n_keys,
         CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS INTEGER) AS has_click
  FROM cnts GROUP BY user_id
)
SELECT user_id, coalesce(filtered_map, '') AS filtered_map,
       n_keys, has_click
FROM agg
""",
    tags=["clickhouse-parity", "map-functions"],
)
def map_functions_user_event_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The map higher-order-function family (``mapFilter`` /
    ``mapApply`` / ``mapContains`` / ``mapKeys``) end-to-end: per user,
    a real MapType column event_type -> count is built with
    ``map_from_entries``, filtered to keys with count >= 2, its values
    scaled x10 with ``transform_values``, probed with
    ``map_contains_key``, and rendered canonically (sorted ``k:v``
    entries) for the cross-engine hash.  The map stays a JVM map value
    throughout — no per-row Python."""
    ev = load_table(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_user = cnts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    filtered = F.transform_values(
        F.map_filter(F.col("m"), lambda k, v: v >= 2),
        lambda k, v: v * 10,
    )
    rendered = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(filtered),
                lambda e: F.concat_ws(":", e.key, e.value),
            )
        ),
        ",",
    )
    return per_user.select(
        "user_id",
        rendered.alias("filtered_map"),
        F.size(F.map_keys("m")).cast("int").alias("n_keys"),
        F.map_contains_key(F.col("m"), F.lit("click"))
        .cast("int")
        .alias("has_click"),
    )


@register(
    "bounding_ratio_by_event_type",
    oracle="""
WITH ranked AS (
  SELECT event_type, "value", ts,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn_asc,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_desc
  FROM events
),
s AS (
  SELECT event_type,
         max(CASE WHEN rn_asc = 1 THEN "value" END) AS first_v,
         max(CASE WHEN rn_desc = 1 THEN "value" END) AS last_v,
         epoch_ms(min(ts)) AS t0, epoch_ms(max(ts)) AS t1
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       floor((last_v - first_v) / ((t1 - t0) / 1000.0)
             * 1000000 + 0.5) / 1000000 AS bounding_ratio
FROM s
""",
    tags=["clickhouse-parity", "bounding-ratio"],
)
def bounding_ratio_by_event_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``boundingRatio``: the slope (last value - first
    value) / (last ts - first ts seconds) per group, with the CH
    argMin/argMax endpoint semantics made deterministic by an
    (ts, event_id) tie-break — single aggregation pass via min_by /
    max_by over the composite ordering key."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("min_by(value, struct(ts, event_id))").alias("first_v"),
        F.expr("max_by(value, struct(ts, event_id))").alias("last_v"),
        F.unix_millis(F.min("ts").cast("timestamp")).alias("t0"),
        F.unix_millis(F.max("ts").cast("timestamp")).alias("t1"),
    )
    return agg.select(
        "event_type",
        rnd(
            (F.col("last_v") - F.col("first_v"))
            / ((F.col("t1") - F.col("t0")) / F.lit(1000.0)),
            6,
        ).alias("bounding_ratio"),
    )
