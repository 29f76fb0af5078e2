"""BI / analytics query pack (SURVEY.md §2.4-§2.7: A1-A8, W1-W3, O1-O2, J5).

Shapes mirror the reference's example analytics
(scripts/clickhouse_examples.sql:1-29, scripts/superset_sql_examples.sql:1-29):
time-bucketed counts, star join + group-by + top-k, ratio-to-total — expressed
on the driver's TPC-H-ish tables.  Broadcast hints are reserved for true dims
(nation/region/supplier/part — bounded size at any sf); tables that scale with
the data (orders/customer/lineitem) carry no hint so AQE can pick broadcast at
small sf and a shuffle join at 100 TB.  Aggregations are partial-agg friendly.

Double outputs use functions.ch_compat.round_half_up (floor-form rounding) so
Spark and the DuckDB oracle round identical binary doubles identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..functions.ch_compat import to_start_of_five_minute
from ..io import load_table
from .registry import register


def _r(expr: str, scale: int) -> str:
    m = 10 ** scale
    return f"floor(({expr}) * {m} + 0.5) / {m}"


# ---------------------------------------------------------------------------
# q1: full-scan aggregation (A1/A2/A6) — pricing summary
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_r('sum(l_quantity)', 2)}                                       AS sum_qty,
       {_r('sum(l_extendedprice)', 2)}                                  AS sum_base_price,
       {_r('sum(l_extendedprice * (1 - l_discount))', 2)}               AS sum_disc_price,
       {_r('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
       {_r('avg(l_quantity)', 4)}                                       AS avg_qty,
       {_r('avg(l_extendedprice)', 4)}                                  AS avg_price,
       {_r('avg(l_discount)', 4)}                                       AS avg_disc,
       CAST(count(*) AS BIGINT)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=["A1", "A2", "A6", "P1"],
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash group-by with 8 partial-aggregatable measures over the biggest
    table — map-side combine, single shuffle on the 6-value group key."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            rnd(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3: star join + group + top-k (J5, O1)
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {_r('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
       CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=["J5", "O1", "A2"],
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side lineitem joins date-filtered orders and segment-filtered
    customer.  Both scale with the data, so no broadcast hint: AQE picks
    broadcast when the filtered side fits (small sf) and a shuffle join at
    scale.  TakeOrderedAndProject top-k avoids a global sort."""
    cust, orders, li = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    cut = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cut)
        .join(
            orders.filter(F.col("o_orderdate") < cut),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5: multi-way star join (J3/J5) — local supplier volume per nation
# ---------------------------------------------------------------------------

@register(
    "q5_nation_revenue",
    oracle=f"""
SELECT n_name,
       {_r('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    tags=["J3", "J5", "A2", "P1"],
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join around the lineitem fact — the reference's star-join shape
    (fact_suricata star lookups, SURVEY.md J3) at BI scale.  Only the
    bounded dims (nation=25, region=5 rows at every SF) carry broadcast
    hints; supplier/orders/customer all scale with the data, so AQE
    size-checks them at runtime (auto-broadcast when small, SMJ at 100 TB)."""
    cust, orders, li, supp, nation, region = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    orders_win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.join(orders_win, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "top_parts_by_revenue",
    oracle=f"""
SELECT p_brand,
       {_r('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
       CAST(count(*) AS BIGINT) AS line_count
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
LIMIT 10
""",
    tags=["J5", "O1"],
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference 'top signatures' BI shape (clickhouse_examples.sql:21-29):
    fact → dim lookup → group → top-k.  part grows ×10 per SF, so no
    broadcast hint — AQE auto-broadcasts it while it fits and falls back
    to a shuffled join at corpus scale."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q4-style EXISTS semi join (J6)
# ---------------------------------------------------------------------------

@register(
    "order_priority_check",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=["J6", "A2", "P1"],
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left-semi join (reference dim_agent_scd2.sql:14-21
    uses the same decorrelation; SURVEY.md J6)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    matched = win.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# Ratio-to-total (A8/W1) — reference superset_sql_examples.sql:24
# ---------------------------------------------------------------------------

@register(
    "ratio_to_total_by_segment",
    oracle=f"""
WITH seg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS order_count
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, order_count,
       {_r('order_count / sum(order_count) OVER ()', 6)} AS pct
FROM seg
""",
    tags=["A8", "W1"],
)
def ratio_to_total_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate then window-over-aggregate, the reference's ratio-to-total
    (count() / sum(count()) OVER (...))."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    w = Window.partitionBy()
    return seg.select(
        "c_mktsegment",
        "order_count",
        rnd(F.col("order_count") / F.sum("order_count").over(w), 6).alias("pct"),
    )


@register(
    "daily_event_type_ratio",
    oracle=f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS event_date, event_type,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_date, event_type, cnt,
       {_r('cnt / sum(cnt) OVER (PARTITION BY event_date)', 6)} AS day_pct
FROM d
""",
    tags=["A8", "W1", "A2"],
)
def daily_event_type_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned ratio-to-total — exact reference shape
    (superset_sql_examples.sql:24: count()/sum(count()) OVER (PARTITION BY
    event_date))."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date("ts").alias("event_date"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_date")
    return d.select(
        "event_date",
        "event_type",
        "cnt",
        rnd(F.col("cnt") / F.sum("cnt").over(w), 6).alias("day_pct"),
    )


# ---------------------------------------------------------------------------
# Time bucketing (W3) — reference toStartOfFiveMinute
# ---------------------------------------------------------------------------

@register(
    "events_5min_buckets",
    oracle=f"""
SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS bucket_start,
       CAST(count(*) AS BIGINT)      AS event_count,
       {_r('sum("value")', 2)}       AS total_value
FROM events
GROUP BY 1
ORDER BY bucket_start
LIMIT 50
""",
    tags=["W3", "A2", "O1"],
)
def events_5min_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling buckets on stored data — reference
    superset_sql_examples.sql:1-8 (toStartOfFiveMinute + count, top 50)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(to_start_of_five_minute("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("bucket_start")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Incremental window predicate (P1) — the reference's universal WHERE shape
# ---------------------------------------------------------------------------

@register(
    "events_windowed_count",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT)               AS cnt,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
       {_r('sum("value")', 2)}                AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type
""",
    tags=["P1", "A1", "A2"],
)
def events_windowed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`WHERE event_ts >= {{start_ts}} AND event_ts < {{end_ts}}` — the
    incremental predicate every reference pipeline carries
    (dim_date.sql:38-39); distinct-count included."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").alias("users"),
            rnd(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "top_users_by_value",
    oracle=f"""
SELECT user_id, {_r('sum("value")', 2)} AS total_value,
       CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 10
""",
    tags=["O1", "O2", "A2"],
)
def top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k group-by — reference 'top 10 severities' shape
    (clickhouse_examples.sql:9-13)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            rnd(F.sum("value"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(10)
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {_r('sum(volume)', 2)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=["J5", "A2"],
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations — OR-of-ANDs join predicate over a
    double nation join, grouped by shipping year."""
    supp, li, orders, cust, nation = (
        load_table(spark, sf_dir, t)
        for t in ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q12_priority_by_quantity_band",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
            AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_quantity >= 30 OR l_discount > 0.08
GROUP BY l_returnflag
""",
    tags=["A2", "conditional-agg"],
)
def q12_priority_by_quantity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation over an OR-predicate scan — the CASE-counting
    shape (TPC-H q12's high/low split)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_quantity") >= 30) | (F.col("l_discount") > 0.08))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
SELECT {_r('''100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount))''', 4)} AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
    tags=["A2", "conditional-agg"],
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar conditional-revenue ratio (TPC-H q14 shape) — two aggregates in
    one pass; the part dim scales with SF so its join strategy is left to
    AQE rather than force-broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(rnd(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
    )


@register(
    "q15_top_suppliers",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {_r('total_rev', 2)} AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
""",
    tags=["A4", "J7", "scalar-subquery"],
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue — uncorrelated scalar subquery
    (max over a derived aggregate) joined back; exact double equality is safe
    because both sides reference the SAME aggregate output."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    max_rev = revenue.agg(F.max("total_rev").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("m"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", rnd("total_rev", 2).alias("total_revenue"))
    )


@register(
    "q18_large_volume_orders",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS orderdate,
       {_r('o_totalprice', 2)} AS totalprice,
       {_r('sum(l_quantity)', 2)} AS total_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 20
""",
    tags=["J6", "A2", "having"],
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: HAVING-filtered aggregate as an IN-subquery →
    left-semi join, then the star rollup with a deterministic top-k."""
    cust, orders, li = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(rnd(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            rnd("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "daily_order_stats",
    oracle=f"""
SELECT CAST(o_orderdate AS DATE)         AS order_date,
       CAST(count(*) AS BIGINT)          AS order_count,
       {_r('sum(o_totalprice)', 2)}      AS total_price,
       {_r('avg(o_totalprice)', 4)}      AS avg_price,
       {_r('max(o_totalprice)', 2)}      AS max_price,
       {_r('min(o_totalprice)', 2)}      AS min_price
FROM orders
GROUP BY 1
""",
    tags=["A1", "A2", "A4", "A6", "O2"],
)
def daily_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup with min/max/avg/sum/count — the last-7-days count shape
    (clickhouse_examples.sql:15-19) over the full range."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.count(F.lit(1)).alias("order_count"),
        rnd(F.sum("o_totalprice"), 2).alias("total_price"),
        rnd(F.avg("o_totalprice"), 4).alias("avg_price"),
        rnd(F.max("o_totalprice"), 2).alias("max_price"),
        rnd(F.min("o_totalprice"), 2).alias("min_price"),
    )
