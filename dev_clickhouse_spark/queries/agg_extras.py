"""Aggregation surface beyond the reference (SURVEY.md §2.4 notes what the
reference lacks: grouping sets / rollup / cube, approximate aggregates,
percentiles).  A complete engine offers them; each is a one-liner in
DataFrame/Catalyst and rides partial aggregation like any group-by."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "with_totals_segment_priority",
    oracle="""
SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), ())
""",
    tags=["clickhouse-parity", "with-totals"],
)
def with_totals_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``GROUP BY … WITH TOTALS`` parity: every (segment,
    priority) group PLUS one grand-total row computed in the same pass —
    the Superset/BI shape where the totals line footers a pivot table.

    WITH TOTALS is exactly GROUPING SETS ((keys…), ()): unlike ROLLUP it
    adds NO per-prefix subtotals, just the () set.  Spark-first:
    ``DataFrame.groupingSets`` lowers to one Expand + one hash aggregate,
    so the totals row rides the same shuffle as the groups (partial
    aggregation on both sets map-side) — not a second scan UNIONed on, the
    way a naive port would phrase it.  Grouping keys in the totals row are
    NULL in both engines (ClickHouse renders them as empty/default values;
    NULL is the grouping-sets spelling of the same row)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
    return j.groupingSets(
        [["c_mktsegment", "o_orderpriority"], []],
        "c_mktsegment", "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        rnd(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "grouping_sets_with_ids",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
       o_orderpriority, c_mktsegment,
       CAST(GROUPING(year(o_orderdate)) AS INTEGER) AS g_year,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
       CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
       CAST(count(*) AS BIGINT) AS cnt,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                        (c_mktsegment), ())
""",
    tags=["clickhouse-parity", "grouping-sets"],
)
def grouping_sets_with_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS with ``GROUPING()`` disambiguation — the
    surface ROLLUP/CUBE/WITH TOTALS don't cover: a mixed list of
    non-prefix sets ((year, priority), (segment), ()) in ONE Expand +
    one hash aggregate, plus the per-column grouping flags that tell a
    NULL produced by aggregation apart from a natural NULL in the data
    (the only correct way to consume grouping-sets output downstream).
    Spark-first: ``DataFrame.groupingSets`` + ``F.grouping`` — the
    totals and the segment cut ride the same shuffle as the (year,
    priority) groups, map-side partial aggregation on every set."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")) \
        .withColumn("year", F.year("o_orderdate").cast("int"))
    return j.groupingSets(
        [[F.col("year"), F.col("o_orderpriority")],
         [F.col("c_mktsegment")], []],
        F.col("year"), F.col("o_orderpriority"), F.col("c_mktsegment"),
    ).agg(
        F.grouping("year").cast("int").alias("g_year"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.grouping("c_mktsegment").cast("int").alias("g_seg"),
        F.count(F.lit(1)).alias("cnt"),
        rnd(F.sum("o_totalprice"), 2).alias("total_price"),
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


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_daily_event_types",
    oracle=f"""
SELECT CAST(ts AS DATE) AS event_date,
       {', '.join(
           f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY 1
""",
    tags=["pivot"],
)
def pivot_daily_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.pivot with a declared value list — wide daily counts per event
    type.  Declaring the pivot values keeps the plan a single pass (no
    distinct-values pre-scan) and the output schema static."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )


@register(
    "except_intersect_users",
    oracle="""
SELECT CAST(u AS BIGINT) AS user_id, 'clicker_not_buyer' AS cohort
FROM (SELECT user_id AS u FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT CAST(u AS BIGINT) AS user_id, 'error_and_signup' AS cohort
FROM (SELECT user_id AS u FROM events WHERE event_type = 'error'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'signup')
""",
    tags=["U-except-intersect"],
)
def except_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT cohorts (absent from the reference — SURVEY.md §2.7
    'No INTERSECT/EXCEPT anywhere' — part of the complete set-op surface).
    Catalyst plans both as left-anti / left-semi aggregates."""
    ev = load_table(spark, sf_dir, "events")
    users_of = lambda t: ev.filter(F.col("event_type") == t).select("user_id")  # noqa: E731
    clickers = users_of("click").subtract(users_of("purchase"))  # EXCEPT (distinct)
    both = users_of("error").intersect(users_of("signup"))
    return clickers.select(
        "user_id", F.lit("clicker_not_buyer").alias("cohort")
    ).unionByName(both.select("user_id", F.lit("error_and_signup").alias("cohort")))


@register(
    "approx_distinct_daily_users",
    oracle="""
SELECT CAST(ts AS DATE) AS event_date,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(1 AS INTEGER) AS within_rsd_bound
FROM events GROUP BY CAST(ts AS DATE)
""",
    tags=["approx"],
)
def approx_distinct_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per day — the 100 TB cardinality
    estimator.  Sketch INTERNALS differ per engine, so the raw estimate
    carries no SQL oracle; the CONTRACT does: the result exposes the exact
    count plus a flag asserting the HLL estimate landed inside 3× its
    declared rsd (a deterministic true for fixed input), which the oracle
    replays exactly.  The estimate itself stays rows-only by nature; the
    error-bound is additionally asserted in tests/test_agg_extras.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.countDistinct("user_id")
            )
            <= F.lit(3 * 0.02) * F.countDistinct("user_id")
        ).cast("int").alias("within_rsd_bound"),
    )


@register(
    "window_rank_suite",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(dense_rank() OVER seg_nation AS BIGINT)   AS nation_dense_rank,
       floor(percent_rank() OVER seg_nation * 1000000 + 0.5) / 1000000
                                                      AS nation_pct_rank,
       floor(cume_dist() OVER seg_nation * 1000000 + 0.5) / 1000000
                                                      AS nation_cume_dist,
       CAST(ntile(4) OVER seg_bal AS INTEGER)         AS balance_quartile
FROM customer
WINDOW
  seg_nation AS (PARTITION BY c_mktsegment ORDER BY c_nationkey),
  seg_bal    AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    tags=["W2", "ranking"],
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family in one pass: dense_rank /
    percent_rank / cume_dist over a deliberately tie-rich discrete key
    (nationkey — peer-group semantics must agree across engines) and
    ntile(4) over a fully deterministic (acctbal, custkey) order, because
    ntile splits peer groups by physical row order and would be
    nondeterministic under ties.  Both windows share one partition-by
    shuffle on c_mktsegment."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    seg_nation = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    seg_bal = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_mktsegment",
        F.dense_rank().over(seg_nation).cast("bigint").alias("nation_dense_rank"),
        rnd(F.percent_rank().over(seg_nation), 6).alias("nation_pct_rank"),
        rnd(F.cume_dist().over(seg_nation), 6).alias("nation_cume_dist"),
        F.ntile(4).over(seg_bal).cast("int").alias("balance_quartile"),
    )


@register(
    "stats_moments_by_returnflag",
    oracle="""
WITH qz AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE)        AS sx,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE)        AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE)   AS sy,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE)   AS syy,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE)   AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       floor((sxx - sx * sx / n) / (n - 1) * 10000 + 0.5) / 10000 AS var_qty,
       floor(sqrt((syy - sy * sy / n) / (n - 1)) * 10000 + 0.5) / 10000 AS std_price,
       floor((sxy - sx * sy / n) / (n - 1) * 10000 + 0.5) / 10000 AS covar_qty_price,
       floor((sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
             * 1000000 + 0.5) / 1000000 AS corr_qty_price
FROM s
""",
    tags=["A6", "moments"],
)
def stats_moments_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (variance / stddev / covariance / corr) per
    return flag.  Built from exact DECIMAL power sums rather than the
    engines' native var/stddev aggregates: Spark and DuckDB use different
    summation algorithms whose doubles diverge in the last ulp, while
    decimal sums of 2dp/4dp-quantized inputs are exact and
    order-independent, so both engines derive the moments from identical
    doubles with the identical formula.  One shuffle, map-side combine.

    Width asymmetry is deliberate: Spark uses DECIMAL(12,4) so the product
    type (25,8) stays inside its 38-digit cap without scale loss, while
    DuckDB needs DECIMAL(19,4) operands to force its int128 multiply path
    (int64-width products overflow at runtime).  Both are exact, so the
    sums are equal."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,4)")
    p = F.col("l_extendedprice").cast("decimal(12,4)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return s.select(
        "l_returnflag", "n",
        rnd((sxx - sx * sx / n) / (n - 1), 4).alias("var_qty"),
        rnd(F.sqrt((syy - sy * sy / n) / (n - 1)), 4).alias("std_price"),
        rnd((sxy - sx * sy / n) / (n - 1), 4).alias("covar_qty_price"),
        rnd((sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
        .alias("corr_qty_price"),
    )


@register(
    "histogram_event_values",
    oracle="""
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
bins AS (
  SELECT CAST(CASE WHEN b.hi = b.lo THEN 0
              ELSE least(floor((value - b.lo) / ((b.hi - b.lo) / 20.0)), 19)
              END AS INTEGER) AS bin,
         b.lo, b.hi
  FROM events CROSS JOIN b WHERE value IS NOT NULL
)
SELECT bin,
       floor((lo + bin * (hi - lo) / 20.0) * 10000 + 0.5) / 10000
         AS bin_lower,
       CAST(count(*) AS BIGINT) AS n
FROM bins GROUP BY bin, lo, hi
""",
    tags=["ch-histogram", "A2"],
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``histogram(20)(value)`` re-expressed with DETERMINISTIC
    equal-width bins (ClickHouse's adaptive bin edges are seed-dependent —
    fixed edges are what a cross-engine contract can pin down): one 1-row
    min/max aggregate broadcast to the scan, then a single groupBy(bin)
    with map-side combine.  The top edge folds into the last bin
    (least(..., 19)), matching the SQL.  A degenerate domain (hi == lo,
    i.e. every value equal) collapses to the single bin 0 in BOTH engines
    — without the guard Spark's x/0.0 yields NaN bins while DuckDB's
    differs (ADVICE r6)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / 20.0
    binned = ev.crossJoin(F.broadcast(b)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width), F.lit(19)
            )
        ).cast("int").alias("bin"),
        "lo", "hi",
    )
    return binned.groupBy("bin", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "bin",
        rnd(F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / 20.0,
            4).alias("bin_lower"),
        "n",
    )


@register(
    "agg_if_combinators",
    oracle="""
SELECT event_type,
       CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high,
       floor(coalesce(sum(value) FILTER (WHERE value > 50), 0) * 10000 + 0.5)
         / 10000 AS sum_high,
       floor(avg(value) FILTER (WHERE value <= 50) * 10000 + 0.5) / 10000
         AS avg_low,
       min(ts) FILTER (WHERE value > 90) AS first_extreme_ts
FROM events
GROUP BY event_type
""",
    tags=["ch-if-combinators", "A1", "A6"],
)
def agg_if_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's ``-If`` aggregate combinators (countIf / sumIf / avgIf /
    minIf) — conditional aggregation WITHOUT extra scans or joins, the
    pattern the reference's dashboards use to split one pass into many
    conditional metrics.  Spark spells it ``agg(expr).filter(cond)`` (ANSI
    FILTER clause semantics); all four fold into ONE groupBy shuffle with
    map-side partials."""
    ev = load_table(spark, sf_dir, "events")
    high, low = F.col("value") > 50, F.col("value") <= 50
    return ev.groupBy("event_type").agg(
        F.count(F.when(high, 1)).alias("n_high"),
        rnd(F.coalesce(F.sum(F.when(high, F.col("value"))), F.lit(0.0)), 4)
        .alias("sum_high"),
        rnd(F.avg(F.when(low, F.col("value"))), 4).alias("avg_low"),
        F.min(F.when(F.col("value") > 90, F.col("ts")))
        .alias("first_extreme_ts"),
    )


@register(
    "approx_percentile_error_contract",
    oracle="""
SELECT event_type,
       floor(quantile_cont(value, 0.50) * 10000 + 0.5) / 10000 AS p50_exact,
       floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000 AS p95_exact,
       CAST(1 AS INTEGER) AS within_accuracy_bound
FROM events WHERE value IS NOT NULL
GROUP BY event_type
""",
    tags=["approx", "ch-quantile"],
)
def approx_percentile_error_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``quantileTDigest`` analog: Spark's ``approx_percentile``
    (Greenwald-Khanna) is the sketch quantile you'd actually run at 100 TB
    — one pass, bounded memory, mergeable partials.  Sketch internals
    differ per engine, so (like the HLL oracle above) the SQL oracle pins
    the CONTRACT: exact p50/p95 per group plus a flag asserting the GK
    estimate's EMPIRICAL RANK (fraction of group values ≤ estimate) sits
    within the declared rank accuracy of the target quantile, plus a
    3-element discreteness slack — deterministic for fixed input."""
    acc = 10_000
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    apx = F.expr(f"approx_percentile(value, array(0.5, 0.95), {acc})")
    agg = ev.groupBy("event_type").agg(
        rnd(F.expr("percentile(value, 0.5)"), 4).alias("p50_exact"),
        rnd(F.expr("percentile(value, 0.95)"), 4).alias("p95_exact"),
        apx[0].alias("a50"),
        apx[1].alias("a95"),
        F.count(F.lit(1)).alias("n"),
    )
    # rank check: the estimate is an ACTUAL group element, so its empirical
    # rank must sit within the declared rank accuracy of the target (plus a
    # 3-element discreteness slack)
    ranked = (
        ev.join(F.broadcast(agg), "event_type")
        .groupBy("event_type", "p50_exact", "p95_exact", "n")
        .agg(
            (F.sum((F.col("value") <= F.col("a50")).cast("long"))
             / F.first("n")).alias("r50"),
            (F.sum((F.col("value") <= F.col("a95")).cast("long"))
             / F.first("n")).alias("r95"),
        )
    )
    eps = F.lit(1.0 / acc) + F.lit(3.0) / F.col("n")
    return ranked.select(
        "event_type", "p50_exact", "p95_exact",
        (
            (F.abs(F.col("r50") - 0.5) <= eps)
            & (F.abs(F.col("r95") - 0.95) <= eps)
        ).cast("int").alias("within_accuracy_bound"),
    )


@register(
    "sum_map_user_event_values",
    oracle="""
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR) || ':' || v2,
                  ',' ORDER BY event_type) AS value_map
FROM (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
             printf('%.2f', floor(sum("value") * 100 + 0.5) / 100) AS v2
      FROM events GROUP BY user_id, event_type)
GROUP BY user_id
""",
    tags=["clickhouse-parity", "sum-map"],
)
def sum_map_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` / ``countMap`` parity: per user, a MAP keyed by
    event_type holding key-wise summed counts and values — the Map
    combinator family (``sumMap(map(k, v))``).  Spark-first shape: the map
    never exists as wide per-row state; it's a (user, key) group-by (one
    shuffle, map-side combine) folded into per-user canonical form.  The
    cross-engine gate serializes the map as 'k:n:sum' entries sorted by
    key, since map column equality is engine-internal; Spark builds the
    same string from an array_sort over the aggregated entries.  The sum
    is rendered with an explicit fixed-point ``%.2f`` format mirrored in
    the oracle's ``printf`` — a bare double->string cast diverges at
    magnitude >= 1e7, where Spark switches to scientific notation
    ('1.0E7') while DuckDB prints '10000000.0'.  At scale
    the (user, key) grouping carries |keys| rows per user - never a wide
    row - and both shuffles are key-partitioned."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.sum("value"), 2).alias("v2"),
    )
    return per_key.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_type", "n", "v2"))
                ).alias("es"),
                lambda e: F.concat_ws(
                    ":", e.event_type, e.n.cast("string"),
                    F.format_string("%.2f", e.v2),
                ),
            ),
        ).alias("value_map")
    )


def misra_gries_sketch(df: DataFrame, key_col: str, m: int) -> DataFrame:
    """Distributed Misra-Gries heavy-hitter sketch: per-partition capped
    counter tables (capacity ``m``; the classic decrement-all eviction),
    merged by summing per-key lower bounds.  Output (key, lb) where lb is
    an UNDERestimate with per-partition error ≤ n_partition/(m+1); any key
    with overall frequency > n/(m+1) is guaranteed present.  The shuffle
    after mapInPandas carries at most m × partitions rows regardless of
    key cardinality — the point of the sketch at 100 TB."""
    import pandas as pd

    from pyspark.sql import types as T

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for u in pdf[key_col]:
                if u in counters:
                    counters[u] += 1
                elif len(counters) < m:
                    counters[u] = 1
                else:
                    # decrement-all step: drop every counter by 1
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame(
            {key_col: list(counters), "lb": list(counters.values())}
        )

    return (
        df.select(key_col)
        .mapInPandas(
            mg_partition,
            T.StructType([
                T.StructField(key_col, T.LongType()),
                T.StructField("lb", T.LongType()),
            ]),
        )
        .groupBy(key_col)
        .agg(F.sum("lb").alias("lb"))
    )


def misra_gries_weighted_sketch(
    df: DataFrame, key_col: str, weight_col: str, m: int
) -> DataFrame:
    """Weighted Misra-Gries (the ``topKWeighted`` sketch): counters grow by
    the item's WEIGHT; when full, the insertion and every counter give up
    δ = min(new weight, smallest counter) (zeroed counters evicted,
    the remainder of the new weight inserted if any survives).  Merging
    sums per-key lower bounds exactly like the unweighted sketch; any key
    whose total weight exceeds W_partition/(m+1) per partition is
    guaranteed to survive that partition.  Shuffle ≤ m × partitions rows
    at any key cardinality."""
    import pandas as pd

    from pyspark.sql import types as T

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for u, w in zip(pdf[key_col], pdf[weight_col]):
                w = int(w)
                if w <= 0:
                    continue
                if u in counters:
                    counters[u] += w
                    continue
                while w > 0:
                    if len(counters) < m:
                        counters[u] = w
                        break
                    delta = min(min(counters.values()), w)
                    dead = []
                    for k in counters:
                        counters[k] -= delta
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
                    w -= delta
        yield pd.DataFrame(
            {key_col: list(counters), "lb": list(counters.values())}
        )

    return (
        df.select(key_col, weight_col)
        .mapInPandas(
            mg_partition,
            T.StructType([
                T.StructField(key_col, T.LongType()),
                T.StructField("lb", T.LongType()),
            ]),
        )
        .groupBy(key_col)
        .agg(F.sum("lb").alias("lb"))
    )


@register(
    "topk_weighted_heavy_hitters",
    oracle="""
SELECT user_id, CAST(total_cents AS BIGINT) AS total_cents,
       CAST(1 AS INTEGER) AS in_sketch
FROM (SELECT user_id,
             sum(CAST(floor("value" * 100 + 0.5) AS BIGINT)) AS total_cents
      FROM events WHERE "value" IS NOT NULL
      GROUP BY user_id
      ORDER BY total_cents DESC, user_id LIMIT 5)
""",
    tags=["clickhouse-parity", "topk-weighted", "approx"],
)
def topk_weighted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted(5)(user_id, weight)`` — heavy hitters by
    WEIGHT (here integer cents of the event value), not by count.  Same
    contract pattern as ``topk_heavy_hitters``: the sketch is
    capacity-bounded (shuffle ≤ m × partitions rows at any cardinality),
    and m = 4096 exceeds every test sf's distinct-user count so the
    membership contract is deterministic — the exact top-5 by total weight
    (the oracle side) must all appear in the merged sketch; eviction
    mechanics under genuine skew are property-tested with m = 8."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    weighted = ev.select("user_id", cents.alias("w"))
    sketch = misra_gries_weighted_sketch(weighted, "user_id", "w", m=4096)
    exact_top = (
        weighted.groupBy("user_id")
        .agg(F.sum("w").alias("total_cents"))
        .orderBy(F.desc("total_cents"), "user_id")
        .limit(5)
    )
    return exact_top.join(
        F.broadcast(sketch.select("user_id", F.lit(1).alias("in_sketch"))),
        "user_id", "left",
    ).select(
        "user_id", "total_cents",
        F.coalesce("in_sketch", F.lit(0)).alias("in_sketch"),
    )


@register(
    "topk_heavy_hitters",
    oracle="""
SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
       CAST(1 AS INTEGER) AS in_sketch
FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
      ORDER BY cnt DESC, user_id LIMIT 5)
""",
    tags=["clickhouse-parity", "topk", "approx"],
)
def topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topK(5)(user_id)`` — approximate heavy hitters.  The
    scale story: at 100 TB with billions of distinct keys, the exact
    two-level top-k (``top_users_by_value``) still shuffles one row per
    distinct key; the space-saving path instead summarizes each partition
    into a CAPPED Misra-Gries sketch (capacity m rows, Arrow-batched
    mapInPandas), so the shuffle carries at most m x partitions rows no
    matter the cardinality.  Merging sums per-key lower bounds; any key
    with true frequency > n/(m+1) is GUARANTEED to survive, which makes
    the contract deterministic for fixed input: the exact top-5 (the
    oracle's side) must all appear in the merged sketch (in_sketch = 1),
    with the exact counts joined back for value parity.

    Capacity choice matters for that determinism: the test corpus's user
    distribution is near-UNIFORM (sf0.01: 150 users, counts 49-86 — no
    true heavy hitters), so a small m would evict the top-5
    nondeterministically.  m = 4096 exceeds every test sf's distinct-user
    count, making the sketch lossless there while staying capacity-bounded
    at real cardinalities; the eviction mechanics under genuine skew are
    property-tested in tests/test_agg_extras.py with a hot-key synthetic
    and m = 8."""
    ev = load_table(spark, sf_dir, "events")
    sketch = misra_gries_sketch(ev, "user_id", m=4096)
    exact_top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(5)
    )
    return exact_top.join(
        F.broadcast(sketch.select("user_id", F.lit(1).alias("in_sketch"))),
        "user_id", "left",
    ).select(
        "user_id", "cnt", F.coalesce("in_sketch", F.lit(0)).alias("in_sketch")
    )


@register(
    "quantiles_exact_weighted",
    oracle="""
WITH w AS (
  SELECT event_type, "value" AS v, CAST(user_id % 5 + 1 AS BIGINT) AS wt
  FROM events WHERE "value" IS NOT NULL
), c AS (
  SELECT event_type, v, wt,
         sum(wt) OVER (PARTITION BY event_type ORDER BY v, wt
                       ROWS UNBOUNDED PRECEDING) AS cw,
         sum(wt) OVER (PARTITION BY event_type) AS tw
  FROM w
)
SELECT event_type,
       min(CASE WHEN cw >= 0.5 * tw THEN v END)  AS p50_weighted,
       min(CASE WHEN cw >= 0.9 * tw THEN v END)  AS p90_weighted
FROM c GROUP BY event_type
""",
    tags=["clickhouse-parity", "percentile", "weighted"],
)
def quantiles_exact_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(q)(value, weight)`` — the weighted
    quantile a sampling-weighted corpus needs (weights here derive
    deterministically from user_id so both engines see identical inputs).
    Lower-bound rule, spelled out identically in both engines: sort by
    (value, weight), running weight sum, answer = least value whose
    cumulative weight reaches q x total.  One hash shuffle on the group key
    with a per-partition sort — the same shape as any ranking window; no
    collect, no per-group arrays."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = ev.select(
        "event_type", F.col("value").alias("v"),
        (F.col("user_id") % 5 + 1).cast("long").alias("wt"),
    )
    win = Window.partitionBy("event_type").orderBy("v", "wt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("event_type")
    c = w.select(
        "event_type", "v", "wt",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return c.groupBy("event_type").agg(
        F.min(F.when(F.col("cw") >= 0.5 * F.col("tw"), F.col("v")))
        .alias("p50_weighted"),
        F.min(F.when(F.col("cw") >= 0.9 * F.col("tw"), F.col("v")))
        .alias("p90_weighted"),
    )


@register(
    "running_difference_daily",
    oracle="""
WITH d AS (
  SELECT CAST(ts AS DATE) AS event_date, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT event_date, n,
       CAST(coalesce(n - lag(n) OVER (ORDER BY event_date), 0) AS BIGINT)
         AS delta,
       CAST(CASE WHEN n - lag(n) OVER (ORDER BY event_date) > 0
                 THEN n - lag(n) OVER (ORDER BY event_date) ELSE 0 END
            AS BIGINT) AS delta_sum_step
FROM d
""",
    tags=["clickhouse-parity", "timeseries"],
)
def running_difference_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``runningDifference`` / ``deltaSum`` parity on the daily
    event-count series: per-row difference vs the previous day and the
    positive-increments-only step that deltaSum accumulates (counter-reset
    semantics for monotone gauges).  The window is over the DAY series —
    time-range-sized, never event-volume-sized — after one data-sized
    groupBy(day) with map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("event_date")
    diff = F.col("n") - F.lag("n").over(w)
    return d.select(
        "event_date", "n",
        F.coalesce(diff, F.lit(0)).cast("long").alias("delta"),
        F.when(diff > 0, diff).otherwise(0).cast("long").alias("delta_sum_step"),
    )


@register(
    "group_array_user_events",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq,
       string_agg(CASE WHEN rn <= 10 THEN event_type END, ','
                  ORDER BY ts, event_id) AS first10_seq,
       array_to_string(list_sort(list(DISTINCT event_type)), ',')
         AS uniq_types,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY user_id
""",
    tags=["clickhouse-parity", "group-array", "A2"],
)
def group_array_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArray`` / ``groupArray(10)`` / ``groupUniqArray``
    parity (reference uses per-entity event sequences throughout its
    behavioral SQL).  Per user: the full time-ordered event-type sequence,
    the bounded ``groupArray(10)`` prefix, and the sorted distinct set —
    all serialized with ``array_join`` so the oracle comparison is
    hash-stable across engines.

    Scale note: the unbounded sequence column is per-user-cardinality state
    — the classic groupArray hazard at 100 TB.  The ``first10_seq`` column
    is the production shape (``groupArray(N)`` caps per-group state at N);
    at cluster scale prefer it, or sessionize first.  One hash shuffle on
    user_id; the sort is inside the aggregated array (array_sort over a
    struct of (ts, event_id, event_type)), so no global or per-partition
    row sort is needed."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    sorted_seq = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    types = F.transform(sorted_seq, lambda s: s["event_type"])
    return ev.groupBy("user_id").agg(
        F.array_join(types, ",").alias("event_seq"),
        F.array_join(F.slice(types, 1, 10), ",").alias("first10_seq"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",")
        .alias("uniq_types"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


@register(
    "bit_agg_by_event_type",
    oracle="""
SELECT event_type,
       CAST(bit_and(event_id) AS BIGINT) AS band,
       CAST(bit_or(event_id)  AS BIGINT) AS bor,
       CAST(bit_xor(event_id) AS BIGINT) AS bxor
FROM events WHERE event_id IS NOT NULL
GROUP BY event_type
""",
    tags=["clickhouse-parity", "bit-agg"],
)
def bit_agg_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitAnd`` / ``groupBitOr`` / ``groupBitXor`` parity.
    All three are commutative-associative single-long states, so they ride
    partial aggregation (map-side combine) like sum — constant per-group
    state at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").cast("long").alias("band"),
        F.bit_or("event_id").cast("long").alias("bor"),
        F.bit_xor("event_id").cast("long").alias("bxor"),
    )


@register(
    "uniq_up_to_users",
    oracle="""
SELECT event_type,
       CAST(least(count(DISTINCT user_id), 6) AS BIGINT) AS uniq_up_to_5,
       CAST(count(DISTINCT user_id) > 5 AS BIGINT) AS overflowed
FROM events GROUP BY event_type
""",
    tags=["clickhouse-parity", "uniq"],
)
def uniq_up_to_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(5)(user_id)`` — exact distinct count while it is
    <= 5, else 6 ("more than 5"), plus the overflow flag.  ClickHouse keeps a
    capped hash set per group; here Catalyst's distinct-aggregate expansion
    computes the exact count and the cap is applied after — same answer, and
    at 100 TB the capped-set semantics matter only as an optimization the
    caller opts into (the HLL state rollup covers the unbounded-cardinality
    case)."""
    ev = load_table(spark, sf_dir, "events")
    n = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        F.least(n, F.lit(6)).cast("long").alias("uniq_up_to_5"),
        (n > 5).cast("long").alias("overflowed"),
    )


@register(
    "stats_skew_kurtosis_by_flag",
    oracle="""
WITH qz AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
  FROM lineitem
),
s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(q AS HUGEINT)) AS s1,
         sum(CAST(q AS HUGEINT) * q) AS s2,
         sum(CAST(q AS HUGEINT) * q * q) AS s3,
         sum(CAST(q AS HUGEINT) * q * q * q) AS s4
  FROM qz GROUP BY l_returnflag
),
m AS (
  SELECT l_returnflag, n,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM s
),
c AS (
  SELECT l_returnflag, n,
         r2 - m1 * m1 AS m2,
         r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS m3,
         r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1 AS m4
  FROM m
)
SELECT l_returnflag, n,
       floor(m3 / pow(m2, 1.5) * 1000000 + 0.5) / 1000000 AS skew_pop,
       floor((m4 / (m2 * m2) - 3.0) * 1000000 + 0.5) / 1000000
         AS kurt_pop_excess
FROM c
""",
    tags=["clickhouse-parity", "moments"],
)
def stats_skew_kurtosis_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop`` / ``kurtPop`` parity via EXACT integer power
    sums — the same cross-engine determinism recipe as
    ``stats_moments_by_returnflag``, extended to 3rd/4th moments.

    The 2dp-quantized quantity becomes an exact integer (×100, ≤ 5,000,000)
    whose 4th power (~6.25e26 per row) sums losslessly inside a 38-digit
    DECIMAL (Spark) / HUGEINT (DuckDB) — doubles enter only at the final
    central-moment formula, evaluated bit-identically from identical exact
    sums in both engines.  Spark-first shape: one hash aggregate with
    map-side combine carrying four decimal sums; no second pass for the
    mean (the raw→central moment conversion is driver-free algebra).
    Kurtosis is reported as EXCESS kurtosis (normal = 0), ClickHouse's
    ``kurtPop`` minus 3."""
    li = load_table(spark, sf_dir, "lineitem")
    # floor(x*100 + 0.5) in BOTH engines: a double->int CAST truncates in
    # Spark but rounds in DuckDB — the explicit half-up floor is the shared
    # quantization (l_quantity is 2dp-quantized, so this is exact)
    x = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long").cast(
        "decimal(38,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.sum(x * x * x).cast("double").alias("s3"),
        F.sum(x * x * x * x).cast("double").alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1") / n
    r2, r3, r4 = F.col("s2") / n, F.col("s3") / n, F.col("s4") / n
    m2 = r2 - m1 * m1
    m3 = r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1
    m4 = r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1
    return s.select(
        "l_returnflag", "n",
        rnd(m3 / F.pow(m2, 1.5), 6).alias("skew_pop"),
        rnd(m4 / (m2 * m2) - 3.0, 6).alias("kurt_pop_excess"),
    )


@register(
    "moving_sum_arrays_per_user",
    oracle="""
WITH w AS (
  SELECT user_id, ts, event_id,
         printf('%.2f', floor(sum(coalesce("value", 0)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100)
           AS mv
  FROM events
)
SELECT user_id,
       string_agg(mv, ',' ORDER BY ts, event_id) AS moving_sums
FROM w GROUP BY user_id
""",
    tags=["clickhouse-parity", "moving-agg"],
)
def moving_sum_arrays_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingSum(3)`` parity: per user, the ARRAY of
    3-element moving sums over the value series in (ts, event_id) order —
    the array-combinator view of a sliding aggregate.

    Spark-first: the moving sum is a frame-bounded window aggregate (ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW — one shuffle on user_id, no
    per-row array state), and the per-user array is a tie-broken
    ``array_sort(collect_list(struct(ts, event_id, mv)))`` fold — the same
    collect-then-sort determinism discipline as ``group_array_user_events``
    (collect_list order is nondeterministic under parallel merge; sorting
    inside the aggregated array restores it without a row-level sort).
    Values render with the fixed ``%.2f``/printf pattern (a bare
    double→string cast goes scientific at ≥1e7, ADVICE r7)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    mv = ev.select(
        "user_id", "ts", "event_id",
        F.format_string(
            "%.2f",
            rnd(F.sum(F.coalesce(F.col("value"), F.lit(0.0))).over(w), 2),
        ).alias("mv"),
    )
    return mv.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "mv"))),
                lambda e: e.mv,
            ),
        ).alias("moving_sums")
    )


@register(
    "except_intersect_all_users",
    oracle="""
SELECT 'clicks_minus_purchases' AS cohort,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT u) AS BIGINT) AS n_users
FROM (SELECT user_id AS u FROM events WHERE event_type = 'click'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT 'clicks_and_views_bag' AS cohort,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT u) AS BIGINT) AS n_users
FROM (SELECT user_id AS u FROM events WHERE event_type = 'click'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'view')
""",
    tags=["U-except-intersect", "clickhouse-parity"],
)
def except_intersect_all_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the MULTISET set-ops (bag semantics:
    each user_id survives with multiplicity |A|−|B| / min(|A|,|B|)),
    completing the §2.7 surface next to the DISTINCT variants.  Catalyst
    plans both as a single hash aggregate over per-key counts plus a
    generate — no row-by-row anti join, so partial aggregation still
    applies map-side."""
    ev = load_table(spark, sf_dir, "events")
    users_of = lambda t: ev.filter(F.col("event_type") == t).select("user_id")  # noqa: E731
    diff = users_of("click").exceptAll(users_of("purchase"))
    both = users_of("click").intersectAll(users_of("view"))

    def summarize(df: DataFrame, cohort: str) -> DataFrame:
        return df.groupBy().agg(
            F.lit(cohort).alias("cohort"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        ).select("cohort", "n_rows", "n_users")

    return summarize(diff, "clicks_minus_purchases").unionAll(
        summarize(both, "clicks_and_views_bag")
    )


@register(
    "limit_with_ties_quantity",
    oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         rank() OVER (ORDER BY l_quantity DESC) AS rk
  FROM lineitem
)
SELECT CAST(l_quantity AS BIGINT) AS quantity,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkeys
FROM ranked WHERE rk <= 10
GROUP BY 1 ORDER BY quantity DESC
""",
    tags=["O-topk", "clickhouse-parity"],
)
def limit_with_ties_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT n WITH TIES``: the top-n rows by sort key PLUS
    every row tying the n-th value.  Spark has no WITH TIES clause; the
    exact analog is ``rank() <= n`` — rank (not row_number) admits the
    whole tie group, and Catalyst evaluates it as a single window over
    the sort without materializing a global sort of non-qualifying rows
    (WindowGroupLimit pushes the rank bound into the shuffle at scale).
    Aggregated per tied value so the gate pins the tie-group membership,
    not an arbitrary intra-tie order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy(F.col("l_quantity").desc())
    top = li.select(
        "l_orderkey", "l_quantity", F.rank().over(w).alias("rk")
    ).filter(F.col("rk") <= 10)
    return (
        top.groupBy(F.col("l_quantity").cast("long").alias("quantity"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("l_orderkey").cast("long").alias("sum_orderkeys"),
        )
        .orderBy(F.col("quantity").desc())
    )


@register(
    "group_concat_user_types",
    oracle="""
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
FROM events GROUP BY user_id
""",
    tags=["clickhouse-parity", "A-aggregate"],
)
def group_concat_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse 24.x ``groupConcat(DISTINCT …, ',')`` parity: each
    user's distinct event types as one sorted CSV string.  Spark:
    ``collect_set`` → ``array_sort`` → ``array_join`` — the sort makes
    the concatenation order-insensitive, which is also what makes it
    cross-engine gateable (CH/DuckDB need the ORDER BY for the same
    reason).  One data-sized group-by, set states merge map-side."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("types_csv")
    )


@register(
    "has_all_any_user_journeys",
    oracle="""
WITH j AS (
  SELECT user_id, list(DISTINCT event_type) AS types
  FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN list_has_all(types, ['click', 'purchase'])
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel,
       CAST(sum(CASE WHEN list_has_any(types, ['error', 'signup'])
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_edge_types,
       CAST(sum(CASE WHEN NOT list_has_any(types, ['purchase'])
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_never_bought
FROM j
""",
    tags=["clickhouse-parity", "array-functions"],
)
def has_all_any_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``hasAll(arr, needles)`` / ``hasAny(arr, needles)`` parity over
    per-user event-type journeys: one collect_set shuffle, then the
    containment predicates evaluate in-plan (``array_except`` emptiness
    for hasAll, ``arrays_overlap`` for hasAny) — no second shuffle, no
    explode."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.groupBy("user_id").agg(
        F.collect_set("event_type").alias("types")
    )
    has_all = F.size(
        F.array_except(F.array(F.lit("click"), F.lit("purchase")), "types")
    ) == 0
    has_any_edge = F.arrays_overlap(
        "types", F.array(F.lit("error"), F.lit("signup"))
    )
    never_bought = ~F.arrays_overlap(
        "types", F.array(F.lit("purchase"))
    )
    return j.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(has_all.cast("int")).cast("long").alias("n_full_funnel"),
        F.sum(has_any_edge.cast("int")).cast("long").alias("n_edge_types"),
        F.sum(never_bought.cast("int")).cast("long").alias("n_never_bought"),
    )
