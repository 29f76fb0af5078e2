"""ClickHouse statistical / timeseries aggregate parity (round 8).

Functions a ClickHouse user reaches for that had no counterpart yet:
``entropy``, ``maxIntersections``/``maxIntersectionsPosition``,
``avgWeighted``, ``minMap``/``maxMap``, ``exponentialMovingAverage``,
``welchTTest``/``studentTTest``, ``cramersV``.  Each follows the registry
conventions: identical aliases both engines, exact DECIMAL power sums where
a double sum's ordering could diverge cross-engine, floor-form rounding.

All are single-shuffle group-bys or grid-sized folds — nothing here grows
driver state or per-row Python at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


@register(
    "entropy_daily_event_types",
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       floor(entropy(event_type) * 1000000 + 0.5) / 1000000 AS type_entropy
FROM events
GROUP BY CAST(ts AS DATE)
""",
    tags=["clickhouse-parity", "entropy"],
)
def entropy_daily_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy(x)`` parity: Shannon entropy (log2) of the
    event_type distribution per day.  Spark-first: one (day, type) count
    aggregate, then p·log2(p) folded per day — two narrow shuffles whose
    second input is |days|×|types| rows, never raw data.  DuckDB's native
    ``entropy`` aggregate is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("day")
    p = F.col("c") / F.sum("c").over(w)
    return (
        counts.withColumn("plogp", -p * F.log2(p))
        .groupBy("day")
        .agg(rnd(F.sum("plogp"), 6).alias("type_entropy"))
    )


@register(
    "max_intersections_sessions",
    oracle="""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 1 HOUR AS t, -1 AS delta FROM events
),
run AS (
  SELECT event_type, t, delta,
         CAST(sum(delta) OVER (
           PARTITION BY event_type ORDER BY t, delta
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS concurrent
  FROM pts
),
mx AS (SELECT event_type, max(concurrent) AS max_intersections FROM run
       GROUP BY event_type)
SELECT run.event_type, mx.max_intersections,
       strftime(min(run.t), '%Y-%m-%d %H:%M:%S.%f') AS first_peak_ts
FROM run JOIN mx ON run.event_type = mx.event_type
               AND run.concurrent = mx.max_intersections
GROUP BY run.event_type, mx.max_intersections
""",
    tags=["clickhouse-parity", "max-intersections"],
)
def max_intersections_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections`` / ``maxIntersectionsPosition``
    parity: treating each event as a 1-hour interval ``[ts, ts+1h)``, the
    maximum number of simultaneously open intervals per event_type and the
    earliest instant that peak is reached.  Classic +1/−1 sweep: endpoints
    become deltas, a running sum counts open intervals (ties order −1
    before +1 so half-open touching intervals don't intersect), max over
    the run.  One window shuffle on (event_type); integer arithmetic, so
    no cross-engine FP concern."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    pts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("concurrent", F.sum("delta").over(w).cast("long"))
    mx = run.groupBy("event_type").agg(
        F.max("concurrent").alias("max_intersections")
    ).withColumnRenamed("event_type", "et")
    return (
        run.join(
            F.broadcast(mx),
            (F.col("event_type") == F.col("et"))
            & (F.col("concurrent") == F.col("max_intersections")),
        )
        .groupBy("event_type", "max_intersections")
        .agg(
            F.date_format(F.min("t"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("first_peak_ts")
        )
    )


@register(
    "avg_weighted_price_by_flag",
    oracle="""
SELECT l_returnflag,
       floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                    * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE)
             / CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS avg_weighted_price,
       floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                    * CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE)
             / CAST(sum(CAST(l_discount AS DECIMAL(19,4))) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS avg_weighted_by_discount
FROM lineitem
GROUP BY l_returnflag
""",
    tags=["clickhouse-parity", "avg-weighted"],
)
def avg_weighted_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``avgWeighted(x, w)`` parity: quantity- and
    discount-weighted mean price per return flag — sum(x·w)/sum(w) from
    exact DECIMAL sums (order-independent, so both engines divide identical
    doubles; see stats_moments_by_returnflag for the width asymmetry)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(12,4)")
    q = F.col("l_quantity").cast("decimal(12,4)")
    d = F.col("l_discount").cast("decimal(12,4)")
    return li.groupBy("l_returnflag").agg(
        rnd(
            F.sum(p * q).cast("double") / F.sum(q).cast("double"), 6
        ).alias("avg_weighted_price"),
        rnd(
            F.sum(p * d).cast("double") / F.sum(d).cast("double"), 6
        ).alias("avg_weighted_by_discount"),
    )


@register(
    "min_max_map_user_event_values",
    oracle="""
SELECT user_id,
       string_agg(event_type || ':' || lo || ':' || hi,
                  ',' ORDER BY event_type) AS minmax_map
FROM (SELECT user_id, event_type,
             printf('%.2f', min("value")) AS lo,
             printf('%.2f', max("value")) AS hi
      FROM events GROUP BY user_id, event_type)
GROUP BY user_id
""",
    tags=["clickhouse-parity", "min-max-map"],
)
def min_max_map_user_event_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``minMap`` / ``maxMap`` parity (completing the Map
    combinator family next to ``sumMap``): per user, a map keyed by
    event_type holding the key-wise min and max value.  Same Spark-first
    shape as sumMap — (user, key) group-by, never wide per-row map state —
    folded to canonical sorted 'k:min:max' entries.  min/max pass original
    doubles through unchanged, so the %.2f rendering is bit-stable
    cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id", "event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    entry = F.concat_ws(
        ":",
        F.col("event_type"),
        F.format_string("%.2f", F.col("lo")),
        F.format_string("%.2f", F.col("hi")),
    )
    return (
        per_key.select("user_id", entry.alias("e"))
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list("e")), ",")
            .alias("minmax_map")
        )
    )


@register(
    "ema_daily_order_totals",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS total
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
idx AS (SELECT day, total, row_number() OVER (ORDER BY day) AS i FROM daily),
rec AS (
  SELECT i, day, total, total AS ema FROM idx WHERE i = 1
  UNION ALL
  SELECT idx.i, idx.day, idx.total,
         0.3 * idx.total + 0.7 * rec.ema
  FROM idx JOIN rec ON idx.i = rec.i + 1
)
SELECT day, floor(ema * 10000 + 0.5) / 10000 AS ema_total
FROM rec
""",
    tags=["clickhouse-parity", "ema"],
)
def ema_daily_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage`` parity: EMA (α = 0.3) over
    the daily order-total series, seeded with the first day's total.

    A recurrence is inherently sequential, but the SERIES is grid-sized
    (one row per day — ~2.4k days at any sf), so the right distributed
    shape is: data-sized DECIMAL aggregate to daily totals (exact, so both
    engines fold identical doubles), then ONE grid-sized fold inside an
    ``aggregate`` expression over the sorted array — never a driver-side
    loop over collected raw rows.  The fold's arithmetic
    (0.3·x + 0.7·ema) is spelled identically in the DuckDB recursive-CTE
    oracle, so the doubles match bit-for-bit before rounding."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,4)"))
        .cast("double")
        .alias("total")
    )
    series = daily.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("day", "total"))).alias("s")
    )
    folded = series.select(
        F.expr(
            """
            aggregate(
              slice(s, 2, size(s) - 1),
              struct(s[0].total AS ema,
                     array(struct(s[0].day AS day, s[0].total AS ema)) AS out),
              (acc, x) -> struct(
                0.3 * x.total + 0.7 * acc.ema AS ema,
                array_append(acc.out,
                  struct(x.day AS day, 0.3 * x.total + 0.7 * acc.ema AS ema))
                  AS out),
              acc -> acc.out
            )
            """
        ).alias("out")
    )
    e = F.explode("out").alias("e")
    return folded.select(e).select(
        F.col("e.day").alias("day"), rnd(F.col("e.ema"), 4).alias("ema_total")
    )


@register(
    "welch_ttest_price_by_flag",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxx
  FROM lineitem WHERE l_returnflag IN ('A', 'R')
  GROUP BY l_returnflag
),
ab AS (
  SELECT max(CASE WHEN l_returnflag = 'A' THEN n END)   AS n1,
         max(CASE WHEN l_returnflag = 'A' THEN sx END)  AS sx1,
         max(CASE WHEN l_returnflag = 'A' THEN sxx END) AS sxx1,
         max(CASE WHEN l_returnflag = 'R' THEN n END)   AS n2,
         max(CASE WHEN l_returnflag = 'R' THEN sx END)  AS sx2,
         max(CASE WHEN l_returnflag = 'R' THEN sxx END) AS sxx2
  FROM s
)
SELECT n1, n2,
       floor((sx1 / n1 - sx2 / n2)
             / sqrt(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                  + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2)
             * 1000000 + 0.5) / 1000000 AS welch_t,
       floor(
         (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
        + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2)
         * (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
          + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2)
         / ((((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1)
            * (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1) / (n1 - 1)
          + (((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2)
            * (((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) / (n2 - 1))
         * 10000 + 0.5) / 10000 AS welch_df
FROM ab
""",
    tags=["clickhouse-parity", "ttest"],
)
def welch_ttest_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``welchTTest(x, g)`` parity: Welch's t statistic and
    Welch–Satterthwaite degrees of freedom comparing l_extendedprice
    between return flags A and R.  Derived entirely from exact DECIMAL
    power sums (n, Σx, Σx²) per group — one map-side-combined aggregate
    over the data, then a 2-row closed form; both engines evaluate the
    identical formula on identical doubles.  (The p-value needs the
    incomplete beta function — not SQL-expressible — so the gate pins the
    statistic and df, which determine it.)"""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    x = F.col("l_extendedprice").cast("decimal(12,4)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    ab = s.groupBy().agg(
        F.max(F.when(F.col("l_returnflag") == "A", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("l_returnflag") == "A", F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("l_returnflag") == "A", F.col("sxx"))).alias("sxx1"),
        F.max(F.when(F.col("l_returnflag") == "R", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("l_returnflag") == "R", F.col("sx"))).alias("sx2"),
        F.max(F.when(F.col("l_returnflag") == "R", F.col("sxx"))).alias("sxx2"),
    )
    n1, sx1, sxx1 = F.col("n1"), F.col("sx1"), F.col("sxx1")
    n2, sx2, sxx2 = F.col("n2"), F.col("sx2"), F.col("sxx2")
    se1 = ((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
    se2 = ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2
    t = (sx1 / n1 - sx2 / n2) / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)
    )
    return ab.select(
        "n1", "n2",
        rnd(t, 6).alias("welch_t"),
        rnd(df, 4).alias("welch_df"),
    )


@register(
    "lttb_downsample_daily_orders",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(19,4))) * 100 AS DOUBLE) AS v
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
pts AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', day) AS DOUBLE) AS t,
         day, v, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS n
  FROM daily
),
mid AS (
  SELECT *, ((i - 1) * 18) // (n - 2) AS b
  FROM pts WHERE i >= 1 AND i <= n - 2
),
nxt AS (
  SELECT b, CAST(count(*) AS DOUBLE) AS cnt,
         sum(t) AS st, sum(v) AS sv
  FROM mid GROUP BY b
),
lastp AS (SELECT t, v FROM pts WHERE i = n - 1),
bstats AS (  -- for bucket b: the NEXT bucket's stats (b=17 → last point)
  SELECT b - 1 AS b, cnt, st, sv FROM nxt WHERE b >= 1
  UNION ALL
  SELECT 17, 1.0, t, v FROM lastp
),
rec AS (
  SELECT CAST(-1 AS BIGINT) AS b, t AS sel_t, v AS sel_v FROM pts WHERE i = 0
  UNION ALL
  SELECT rec.b + 1,
         max_by(m.t, printf('%020.0f',
             abs((rec.sel_t * nx.cnt - nx.st) * (m.v - rec.sel_v)
               - (rec.sel_t - m.t) * (nx.sv - rec.sel_v * nx.cnt)))
           || printf('%05d', 99999 - CAST(m.t AS BIGINT))),
         max_by(m.v, printf('%020.0f',
             abs((rec.sel_t * nx.cnt - nx.st) * (m.v - rec.sel_v)
               - (rec.sel_t - m.t) * (nx.sv - rec.sel_v * nx.cnt)))
           || printf('%05d', 99999 - CAST(m.t AS BIGINT)))
  FROM rec
  JOIN mid m ON m.b = rec.b + 1
  JOIN bstats nx ON nx.b = rec.b + 1
  WHERE rec.b < 17
  GROUP BY rec.b
)
SELECT day, floor(v + 0.5) / 100 AS v
FROM (
  SELECT sel_t AS t FROM rec
  UNION ALL
  SELECT t FROM lastp
) sel JOIN pts USING (t)
""",
    tags=["clickhouse-parity", "lttb"],
)
def lttb_downsample_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets(20)(t, v)`` parity: LTTB
    downsampling of the daily order-total series to 20 points — first and
    last point kept, 18 integer-partitioned middle buckets, each
    contributing the point that maximizes the triangle area with the
    PREVIOUSLY selected point and the NEXT bucket's mean (the last middle
    bucket's "next" is the final point).

    Deterministic variant, exact by construction: bucket assignment is the
    integer division ``((i-1)·m) div (n-2)``; values are CENTS (integral
    doubles from an exact DECIMAL sum), times are epoch days; the triangle
    area is scaled by the next bucket's count so every term is an INTEGER
    below 2^53 (|A| ≤ ~7e15 at sf0.1) — both engines compare identical
    integers, and the argmax key appends ``99999−t`` so it is UNIQUE (no
    tie to break).  The selection recurrence is sequential but GRID-sized:
    data-sized exact-DECIMAL daily aggregate → per-bucket point arrays +
    next-bucket sums (grid-sized shuffles) → ONE ``aggregate`` fold over
    the 18 buckets.  Never a driver loop."""
    m_buckets = 18
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(12,4)")) * 100)
        .cast("double")
        .alias("v")
    )
    w = Window.orderBy("day")
    pts = daily.select(
        F.datediff("day", F.lit("1970-01-01")).cast("double").alias("t"),
        "day", "v",
        (F.row_number().over(w) - 1).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    mid = pts.filter(
        (F.col("i") >= 1) & (F.col("i") <= F.col("n") - 2)
    ).withColumn(
        "b", F.floor((F.col("i") - 1) * m_buckets / (F.col("n") - 2))
    )
    nxt = mid.groupBy("b").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("t").alias("st"),
        F.sum("v").alias("sv"),
    )
    last = pts.filter(F.col("i") == F.col("n") - 1).select(
        F.lit(m_buckets - 1).alias("nb"),  # last middle bucket's "next"
        F.lit(1.0).alias("ncnt"),
        F.col("t").alias("nst"), F.col("v").alias("nsv"),
    )
    # per-bucket struct: its points + the NEXT bucket's (or last point's)
    # count/sums, so the fold needs no lookups
    nxt_shift = nxt.select(
        (F.col("b") - 1).alias("nb"), F.col("cnt").alias("ncnt"),
        F.col("st").alias("nst"), F.col("sv").alias("nsv"),
    ).filter(F.col("nb") >= 0).unionByName(last)
    buckets = (
        mid.groupBy("b")
        .agg(F.collect_list(F.struct("t", "v")).alias("p"))
        .join(nxt_shift, F.col("b") == F.col("nb"))
        .select("b", "p", "ncnt", "nst", "nsv")
    )
    packed = buckets.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("b", "p", "ncnt", "nst", "nsv"))
        ).alias("bs")
    ).join(
        pts.filter(F.col("i") == 0).select(
            F.col("t").alias("t0"), F.col("v").alias("v0")
        )
    )
    # fold: acc = the selected points so far; each bucket argmaxes the
    # scaled triangle area against the LAST selected point
    # (element_at(acc, -1)), with the unique lexicographic key spelled
    # identically to the DuckDB oracle
    folded = packed.select(
        F.expr(
            """
            aggregate(
              bs,
              array(struct(t0 AS t, v0 AS v)),
              (acc, bk) -> array_append(acc, aggregate(
                bk.p,
                struct(CAST(NULL AS DOUBLE) AS t, CAST(NULL AS DOUBLE) AS v,
                       '' AS k),
                (best, q) -> IF(
                  concat(
                    format_string('%020.0f',
                      abs((element_at(acc, -1).t * bk.ncnt - bk.nst)
                            * (q.v - element_at(acc, -1).v)
                        - (element_at(acc, -1).t - q.t)
                            * (bk.nsv - element_at(acc, -1).v * bk.ncnt))),
                    format_string('%05d', 99999 - CAST(q.t AS BIGINT))
                  ) > best.k,
                  struct(q.t AS t, q.v AS v,
                    concat(
                      format_string('%020.0f',
                        abs((element_at(acc, -1).t * bk.ncnt - bk.nst)
                              * (q.v - element_at(acc, -1).v)
                          - (element_at(acc, -1).t - q.t)
                              * (bk.nsv - element_at(acc, -1).v * bk.ncnt))),
                      format_string('%05d', 99999 - CAST(q.t AS BIGINT))
                    ) AS k),
                  best),
                r -> struct(r.t AS t, r.v AS v)))
            )
            """
        ).alias("out")
    )
    sel = folded.select(F.explode("out").alias("e")).select(
        F.col("e.t").alias("t")
    ).unionByName(
        pts.filter(F.col("i") == F.col("n") - 1).select("t")
    )
    return sel.join(pts.select("t", "v", "day"), ["t"]).select(
        "day",
        (F.floor(F.col("v") + F.lit(0.5)) / 100).alias("v"),
    )


@register(
    "dict_get_customer_nations",
    oracle="""
SELECT r_name AS region_name, n_name AS nation_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       floor(sum(c_acctbal) * 100 + 0.5) / 100 AS total_acctbal
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    tags=["clickhouse-parity", "dictionary"],
)
def dict_get_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGet`` parity (functions/dict.py): nation and region
    names resolved through in-plan literal-map dictionaries — two chained
    lookups (customer→nation name, nation→region key→region name) with NO
    join in the plan; the customer scan aggregates directly.  The oracle is
    the equivalent LEFT JOIN chain, so a wrong or missing dictionary entry
    flips the hash.  nation/region are bounded at any sf (the dictionary
    contract); the ``max_rows`` guard in SparkDictionary refuses unbounded
    dims loudly."""
    from ..functions.dict import SparkDictionary

    cust = load_table(spark, sf_dir, "customer")
    nation_d = SparkDictionary(
        load_table(spark, sf_dir, "nation"),
        "n_nationkey", ["n_name", "n_regionkey"],
    )
    region_d = SparkDictionary(
        load_table(spark, sf_dir, "region"), "r_regionkey", ["r_name"]
    )
    return (
        cust.select(
            region_d.get(
                "r_name", nation_d.get("n_regionkey", F.col("c_nationkey"))
            ).alias("region_name"),
            nation_d.get("n_name", F.col("c_nationkey")).alias("nation_name"),
            "c_acctbal",
        )
        .groupBy("region_name", "nation_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "url_functions_stats",
    oracle="""
WITH urls AS (
  SELECT doc_id, source,
         'https://' ||
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 'data.example.com' WHEN 1 THEN 'cdn.example.org'
           WHEN 2 THEN 'api.test.net' ELSE 'www.sample.io' END
         || '/p' || CAST(doc_id % 7 AS VARCHAR)
         || '?page=' || CAST(doc_id % 5 AS VARCHAR) || '&ref=' || source
           AS url
  FROM documents
),
parts AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1) AS host,
         regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#:]+)', 1),
                        '\\.([^.]+)$', 1) AS tld,
         regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page,
         regexp_extract(url, '^([^?#]*)', 1) AS cut_url
  FROM urls
)
SELECT host AS url_domain, tld AS url_tld,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
       CAST(count(DISTINCT page) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT cut_url) AS BIGINT) AS n_cut_urls
FROM parts
GROUP BY host, tld
""",
    tags=["clickhouse-parity", "url-functions"],
)
def url_functions_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL-function parity (``domain``, ``topLevelDomain``,
    ``path``, ``extractURLParameter``, ``cutQueryString`` —
    functions/url.py): deterministic URLs synthesized from doc_id (the
    testdata has no URL column; same precedent as the codec census), then
    every function applied and aggregated.  Spark evaluates its native
    ``parse_url`` inside whole-stage codegen; the oracle decomposes the
    identical strings with regexes, so a semantic difference in any
    function flips the hash."""
    from ..functions.url import (
        cut_query_string,
        domain,
        extract_url_parameter,
        top_level_domain,
        url_path,
    )

    docs = load_table(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 4 == 0, "data.example.com")
        .when(F.col("doc_id") % 4 == 1, "cdn.example.org")
        .when(F.col("doc_id") % 4 == 2, "api.test.net")
        .otherwise("www.sample.io")
    )
    url = F.concat(
        F.lit("https://"), host,
        F.lit("/p"), (F.col("doc_id") % 7).cast("string"),
        F.lit("?page="), (F.col("doc_id") % 5).cast("string"),
        F.lit("&ref="), F.col("source"),
    )
    u = docs.select(url.alias("url"))
    return (
        u.select(
            domain("url").alias("url_domain"),
            top_level_domain("url").alias("url_tld"),
            url_path("url").alias("path"),
            extract_url_parameter("url", "page").alias("page"),
            cut_query_string("url").alias("cut_url"),
        )
        .groupBy("url_domain", "url_tld")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("path").alias("n_paths"),
            F.countDistinct("page").alias("n_pages"),
            F.countDistinct("cut_url").alias("n_cut_urls"),
        )
    )


@register(
    "array_hof_user_values",
    oracle="""
WITH cents AS (
  SELECT user_id, CAST(floor("value" * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE "value" IS NOT NULL
),
agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(count(*) FILTER (WHERE c > 10000) AS BIGINT) AS n_over_100,
         CAST(sum(c * 2) AS BIGINT) AS sum_doubled,
         CAST(count(DISTINCT c) AS BIGINT) AS n_distinct
  FROM cents GROUP BY user_id
),
gaps AS (
  SELECT user_id, max(gap) AS mg
  FROM (SELECT user_id,
               c - lag(c) OVER (PARTITION BY user_id ORDER BY c) AS gap
        FROM cents)
  WHERE gap IS NOT NULL GROUP BY user_id
)
SELECT agg.user_id, cnt, n_over_100, sum_doubled, n_distinct,
       CAST(coalesce(gaps.mg, 0) AS BIGINT) AS max_gap
FROM agg LEFT JOIN gaps ON agg.user_id = gaps.user_id
""",
    tags=["clickhouse-parity", "array-hof"],
)
def array_hof_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array-function parity (``arrayFilter``, ``arrayMap``,
    ``arraySum``, ``arrayUniq``, ``arrayDifference``): per-user sorted
    value arrays (integer cents) pushed through the Spark higher-order
    functions ``filter`` / ``transform`` / ``aggregate`` / ``array_distinct``
    / ``zip_with``-of-slices — the lambda family evaluates JVM-side, no
    UDF.  All-integer outputs, so cross-engine comparison is exact; the
    oracle computes the same facts with plain windows/aggregates (semantic
    parity — DuckDB needn't mirror the HOF mechanics)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    arrs = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            )
        ).alias("a")
    )
    return arrs.select(
        "user_id",
        F.size("a").cast("long").alias("cnt"),
        F.size(F.filter("a", lambda x: x > 10000)).cast("long")
        .alias("n_over_100"),
        F.aggregate(
            F.transform("a", lambda x: x * 2),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_doubled"),
        F.size(F.array_distinct("a")).cast("long").alias("n_distinct"),
        F.coalesce(
            F.array_max(
                F.zip_with(
                    F.slice("a", 2, F.size("a") - 1),
                    F.slice("a", 1, F.size("a") - 1),
                    lambda hi, lo: hi - lo,
                )
            ),
            F.lit(0),
        ).cast("long").alias("max_gap"),
    )


@register(
    "sequence_next_node_users",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e1,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2
  FROM events
),
first_match AS (
  SELECT user_id, min(rn) AS rn
  FROM ordered WHERE event_type = 'view' AND e1 = 'click'
  GROUP BY user_id
)
SELECT o.e2 AS next_node, CAST(count(*) AS BIGINT) AS n_users
FROM ordered o JOIN first_match f
  ON o.user_id = f.user_id AND o.rn = f.rn
WHERE o.e2 IS NOT NULL
GROUP BY o.e2
""",
    tags=["clickhouse-parity", "sequence-next-node"],
)
def sequence_next_node_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode`` parity: per user, the event that
    IMMEDIATELY follows the FIRST view→click chain in (ts, event_id)
    order, histogrammed — the flow-analysis shape ('where do users go
    after converting?').  One user-keyed window shuffle: two LEADs flag
    chain heads, min(rn) anchors the first, the next node is the second
    LEAD at the anchor."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    )
    first = (
        ordered.filter(
            (F.col("event_type") == "view") & (F.col("e1") == "click")
        )
        .groupBy("user_id")
        .agg(F.min("rn").alias("rn"))
    )
    return (
        ordered.join(first, ["user_id", "rn"])
        .filter(F.col("e2").isNotNull())
        .groupBy(F.col("e2").alias("next_node"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "format_readable_sizes",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) * 100
              AS BIGINT) AS DOUBLE) AS b
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CASE
         WHEN b < 1024 THEN printf('%.2f', b) || ' B'
         WHEN b < 1048576 THEN printf('%.2f', b / 1024) || ' KiB'
         WHEN b < 1073741824 THEN printf('%.2f', b / 1048576) || ' MiB'
         ELSE printf('%.2f', b / 1073741824) || ' GiB'
       END AS readable_size,
       CASE
         WHEN b < 1000 THEN printf('%.2f', b)
         WHEN b < 1000000 THEN printf('%.2f', b / 1000) || ' thousand'
         WHEN b < 1000000000 THEN printf('%.2f', b / 1000000) || ' million'
         ELSE printf('%.2f', b / 1000000000) || ' billion'
       END AS readable_quantity
FROM s
""",
    tags=["clickhouse-parity", "format-readable"],
)
def format_readable_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``formatReadableSize`` / ``formatReadableQuantity``
    parity over per-flag totals (exact DECIMAL sums → integral doubles, so
    the binary-power divisions are exact mantissa shifts and both engines
    format identical doubles; %.2f of those is bit-stable)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(12,4)")) * 100)
        .cast("bigint").cast("double").alias("b")
    )
    b = F.col("b")

    def fmt(x):
        return F.format_string("%.2f", x)

    readable_size = (
        F.when(b < 1024, F.concat(fmt(b), F.lit(" B")))
        .when(b < 1048576, F.concat(fmt(b / 1024), F.lit(" KiB")))
        .when(b < 1073741824, F.concat(fmt(b / 1048576), F.lit(" MiB")))
        .otherwise(F.concat(fmt(b / 1073741824), F.lit(" GiB")))
    )
    readable_qty = (
        F.when(b < 1000, fmt(b))
        .when(b < 1000000, F.concat(fmt(b / 1000), F.lit(" thousand")))
        .when(b < 1000000000, F.concat(fmt(b / 1000000), F.lit(" million")))
        .otherwise(F.concat(fmt(b / 1000000000), F.lit(" billion")))
    )
    return s.select(
        "l_returnflag",
        readable_size.alias("readable_size"),
        readable_qty.alias("readable_quantity"),
    )


@register(
    "cramers_v_type_bucket",
    oracle="""
WITH obs AS (
  SELECT event_type, user_id % 8 AS bucket,
         CAST(count(*) AS DOUBLE) AS o
  FROM events GROUP BY event_type, user_id % 8
),
margins AS (
  SELECT event_type, sum(o) OVER (PARTITION BY event_type) AS row_tot,
         sum(o) OVER (PARTITION BY bucket) AS col_tot,
         sum(o) OVER () AS n, o, bucket
  FROM obs
),
chi AS (
  SELECT max(n) AS n,
         sum((o - row_tot * col_tot / n) * (o - row_tot * col_tot / n)
             / (row_tot * col_tot / n)) AS chi2,
         count(DISTINCT event_type) AS r, count(DISTINCT bucket) AS c
  FROM margins
)
SELECT floor(chi2 * 1000000 + 0.5) / 1000000 AS chi2,
       floor(sqrt(chi2 / (n * (least(r, c) - 1))) * 1000000 + 0.5) / 1000000
         AS cramers_v
FROM chi
""",
    tags=["clickhouse-parity", "cramers-v"],
)
def cramers_v_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV(a, b)`` parity (+ the χ² it derives from):
    association between event_type and a user-id hash bucket.  One
    contingency-count aggregate (data-sized, one shuffle), then margins and
    χ² over the |types|×|buckets| grid — the heavy lifting is the count
    group-by; everything after is grid-sized.  χ² sums 40 doubles, so 6dp
    rounding absorbs cross-engine summation order."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 8).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("bucket")
    wn = Window.partitionBy()
    m = obs.select(
        "event_type", "bucket", "o",
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
        F.sum("o").over(wn).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi = m.groupBy().agg(
        F.max("n").alias("n"),
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("bucket").alias("c"),
    )
    return chi.select(
        rnd(F.col("chi2"), 6).alias("chi2"),
        rnd(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "bitmap_segment_overlap",
    oracle="""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
card AS (
  SELECT event_type, count(*) AS n FROM d GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS and_card
  FROM d a JOIN d b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, i.and_card,
       ca.n + cb.n - i.and_card AS or_card,
       ca.n + cb.n - 2 * i.and_card AS xor_card,
       ca.n - i.and_card AS andnot_card,
       floor(i.and_card * 1000000.0 / (ca.n + cb.n - i.and_card) + 0.5)
         / 1000000 AS jaccard
FROM inter i
JOIN card ca ON ca.event_type = i.type_a
JOIN card cb ON cb.event_type = i.type_b
""",
    tags=["clickhouse-parity", "bitmap"],
)
def bitmap_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bitmap-aggregate parity — the audience-overlap workflow
    built on ``groupBitmapState(user_id)`` per segment plus
    ``bitmapAndCardinality`` / ``bitmapOrCardinality`` /
    ``bitmapXorCardinality`` / ``bitmapAndnotCardinality`` between
    segment pairs.  Spark-first, no materialized bitmaps: one distinct
    over (segment, user) — a single shuffle whose output is at most
    |segments|x|users| rows — then a user-keyed self-join counts every
    pairwise intersection in one pass, and the or/xor/andnot
    cardinalities derive from |A|, |B| and |A∩B| by inclusion-exclusion
    (broadcast-joined per-segment cardinalities).  At 100 TB the
    self-join's expansion is bounded by segments-per-user (|types| here),
    not by row count, so the plan stays two shuffles end to end."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    card = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("and_card"))
    )
    ca = card.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    cb = card.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    out = inter.join(F.broadcast(ca), "type_a").join(F.broadcast(cb), "type_b")
    or_card = F.col("na") + F.col("nb") - F.col("and_card")
    return out.select(
        "type_a", "type_b", "and_card",
        or_card.alias("or_card"),
        (F.col("na") + F.col("nb") - 2 * F.col("and_card")).alias("xor_card"),
        (F.col("na") - F.col("and_card")).alias("andnot_card"),
        rnd(F.col("and_card") / or_card, 6).alias("jaccard"),
    )


@register(
    "dict_hierarchy_nation_chain",
    oracle="""
WITH RECURSIVE walk AS (
  SELECT n_nationkey AS node, n_nationkey AS cur,
         CAST(n_nationkey AS BIGINT) AS s, 1 AS c,
         CASE WHEN n_nationkey = 1 THEN 1 ELSE 0 END AS has1
  FROM nation
  UNION ALL
  SELECT w.node, (w.cur - 1) // 2,
         w.s + (w.cur - 1) // 2, w.c + 1,
         CASE WHEN (w.cur - 1) // 2 = 1 THEN 1 ELSE w.has1 END
  FROM walk w WHERE w.cur > 0
),
chains AS (SELECT node, s, c, has1 FROM walk WHERE cur = 0)
SELECT CAST(ch.c AS INT) AS chain_len,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(ch.s) AS BIGINT) AS sum_chain,
       CAST(sum(ch.has1) AS BIGINT) AS n_under_1
FROM customer cu JOIN chains ch ON ch.node = cu.c_nationkey
GROUP BY 1 ORDER BY chain_len
""",
    tags=["clickhouse-parity", "dictionary", "iterative"],
)
def dict_hierarchy_nation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dictGetHierarchy`` / ``dictIsIn`` over a HIERARCHICAL dictionary
    (functions/dict.py): nations form a heap tree (parent(k) =
    (k−1) div 2, root 0) declared as a parent map; every customer's
    nation chain is resolved by UNROLLED in-plan map lookups — no join,
    no recursion in the plan, whole-stage codegen end to end (the CH
    hierarchical-dictionary contract).  The oracle walks the same tree
    with a recursive CTE.  ``n_under_1`` gates ``dictIsIn(…, 1)``."""
    from ..functions.dict import SparkDictionary

    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    d = SparkDictionary(nation, "n_nationkey", ["n_name"])
    parents = {
        int(r["n_nationkey"]): (
            (int(r["n_nationkey"]) - 1) // 2
            if int(r["n_nationkey"]) > 0 else None
        )
        for r in nation.select("n_nationkey").collect()
    }
    d.set_hierarchy(parents)
    chain = d.get_hierarchy(F.col("c_nationkey"))
    enriched = cust.select(
        F.size(chain).alias("chain_len"),
        F.aggregate(
            chain, F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        ).alias("chain_sum"),
        d.is_in(F.col("c_nationkey"), F.lit(1)).cast("int").alias("has1"),
    )
    return (
        enriched.groupBy(F.col("chain_len").cast("int").alias("chain_len"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("chain_sum").cast("long").alias("sum_chain"),
            F.sum("has1").cast("long").alias("n_under_1"),
        )
        .orderBy("chain_len")
    )
