"""ClickHouse hypothesis-test / regression / interval aggregate parity.

Second statistical tranche (round 8, after ``welchTTest``/``cramersV`` in
stats_parity.py): ``mannWhitneyUTest``, ``kolmogorovSmirnovTest``,
``simpleLinearRegression``, ``boundingRatio``, ``intervalLengthSum``.
Reference surface: these are the stock ClickHouse aggregate functions an
analyst would call over the same events/lineitem tables the reference's BI
queries serve (dev-clickhouse exposes stock ClickHouse SQL; see
clickhouse/init/01_schema.sql for the served tables).

Scale design notes (100 TB):

- The rank-based tests (Mann-Whitney, KS) are NOT computed by globally
  ranking raw rows.  Both first aggregate to per-distinct-value group
  counts (one map-side-combined shuffle over the data), then run the
  cumulative window over the |distinct values| aggregate — for a discrete
  measure like ``l_quantity`` that is a 50-row window regardless of table
  size.  For a continuous measure you'd quantize first (same move the
  histogram/percentile queries make); the cumulative window never sees raw
  rows.
- ``intervalLengthSum`` is the classic gaps-and-islands plan: one
  partitioned window (running max of interval end), one flag-cumsum, one
  aggregate — all partitioned by the group key, no global sort.
- Regression/bounding-ratio are closed forms over exact DECIMAL power
  sums, the same discipline as welchTTest (stats_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


def mann_whitney_u(
    df: DataFrame, value_col: str, group_col: str, a_label, b_label
) -> DataFrame:
    """Two-sample Mann-Whitney U with exact midrank tie handling, computed
    aggregate-first: per-distinct-value counts (one map-side-combined
    shuffle), then a cumulative window over the distinct-value grid — never
    a rank over raw rows.  Returns one row (n1, n2, u1, mw_z); see
    ``mann_whitney_quantity_by_flag`` for the rounding contract."""
    vc = df.filter(F.col(group_col).isin(a_label, b_label)).groupBy(
        F.col(value_col).alias("v")
    ).agg(
        F.count(F.when(F.col(group_col) == a_label, 1)).alias("ca"),
        F.count(F.when(F.col(group_col) == b_label, 1)).alias("cr"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    c = F.col("ca") + F.col("cr")
    rk = vc.select(
        "ca", "cr", c.alias("c"),
        (
            F.coalesce(F.sum(c).over(w), F.lit(0)).cast("double")
            + (c + 1) / 2.0
        ).alias("avg_rank"),
    )
    s = rk.groupBy().agg(
        F.sum("ca").cast("double").alias("n1"),
        F.sum("cr").cast("double").alias("n2"),
        F.sum(F.col("ca") * F.col("avg_rank")).alias("r1"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("double").alias("ties"),
    )
    n1, n2, r1, ties = (F.col(x) for x in ("n1", "n2", "r1", "ties"))
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    sigma = F.sqrt(n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    return s.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        rnd(u1, 2).alias("u1"),
        rnd((u1 - n1 * n2 / 2) / sigma, 6).alias("mw_z"),
    )


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, a_label, b_label
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D, aggregate-first like
    ``mann_whitney_u``: the ECDF gap is evaluated at every observed jump
    point of the distinct-value grid, which is exactly sup|F1 − F2| for
    step ECDFs.  Returns one row (n1, n2, ks_d)."""
    vc = df.filter(F.col(group_col).isin(a_label, b_label)).groupBy(
        F.col(value_col).alias("v")
    ).agg(
        F.count(F.when(F.col(group_col) == a_label, 1)).alias("ca"),
        F.count(F.when(F.col(group_col) == b_label, 1)).alias("cn"),
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cn").over(wcum).alias("cum_n"),
        F.sum("ca").over(wall).cast("double").alias("n1"),
        F.sum("cn").over(wall).cast("double").alias("n2"),
    )
    return cum.groupBy().agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        rnd(
            F.max(F.abs(F.col("cum_a") / F.col("n1")
                        - F.col("cum_n") / F.col("n2"))), 6
        ).alias("ks_d"),
    )


def interval_length_sum(
    df: DataFrame, group_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Union length of [start, end) intervals per group with overlaps
    merged (ClickHouse ``intervalLengthSum``), plus the merged-interval
    count.  Gaps-and-islands over integer columns: partitioned running max
    of end marks island starts, a flag cumsum numbers islands, per-island
    max(end) − min(start) sums exactly.  Requires start/end to be integer
    types (epoch-µs in the registered query) so island lengths are exact."""
    wprev = (
        Window.partitionBy(group_col).orderBy(start_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "new_island",
        F.when(
            F.col(start_col)
            > F.coalesce(F.max(end_col).over(wprev), F.lit(-(2 ** 63))),
            1,
        ).otherwise(0),
    )
    wcum = (
        Window.partitionBy(group_col).orderBy(start_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(wcum)
    )
    per_island = islands.groupBy(group_col, "island").agg(
        (F.max(end_col) - F.min(start_col)).alias("len")
    )
    return per_island.groupBy(group_col).agg(
        F.sum("len").alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
    )


@register(
    "mann_whitney_quantity_by_flag",
    oracle="""
WITH vc AS (
  SELECT CAST(l_quantity AS INTEGER) AS v,
         CAST(count(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS cr
  FROM lineitem WHERE l_returnflag IN ('A', 'R')
  GROUP BY CAST(l_quantity AS INTEGER)
),
rk AS (
  SELECT v, ca, cr, ca + cr AS c,
         CAST(coalesce(sum(ca + cr) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE) + (ca + cr + 1) / 2.0 AS avg_rank
  FROM vc
),
s AS (
  SELECT CAST(sum(ca) AS DOUBLE) AS n1, CAST(sum(cr) AS DOUBLE) AS n2,
         sum(ca * avg_rank) AS r1,
         CAST(sum(c * c * c - c) AS DOUBLE) AS ties
  FROM rk
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       floor((r1 - n1 * (n1 + 1) / 2) * 100 + 0.5) / 100 AS u1,
       floor((r1 - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
             / sqrt(n1 * n2 / 12 * ((n1 + n2 + 1)
                    - ties / ((n1 + n2) * (n1 + n2 - 1))))
             * 1000000 + 0.5) / 1000000 AS mw_z
FROM s
""",
    tags=["clickhouse-parity", "rank-test"],
)
def mann_whitney_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``mannWhitneyUTest(x, g)`` parity: the U statistic and
    its tie-corrected normal-approximation z-score comparing ``l_quantity``
    between return flags A and R.  Average ranks come from per-value group
    counts (ca, cr) + a cumulative count over the 50-value grid — the
    textbook midrank formula avg_rank(v) = #smaller + (#equal + 1)/2 — so
    ties are handled exactly and the variance carries the Σ(t³−t)
    correction.  (The p-value needs the normal CDF — erf isn't in either
    engine's SQL surface — so the gate pins U and z, which determine it.)
    All counts < 2^53 make every intermediate double exact except the final
    z division, rounded floor-form 6dp in both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("int").alias("q"), "l_returnflag"
    )
    return mann_whitney_u(li, "q", "l_returnflag", "A", "R")


@register(
    "ks_test_quantity_by_flag",
    oracle="""
WITH vc AS (
  SELECT CAST(l_quantity AS INTEGER) AS v,
         CAST(count(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE l_returnflag = 'N') AS BIGINT) AS cn
  FROM lineitem WHERE l_returnflag IN ('A', 'N')
  GROUP BY CAST(l_quantity AS INTEGER)
),
cum AS (
  SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
         sum(cn) OVER (ORDER BY v) AS cum_n,
         CAST(sum(ca) OVER () AS DOUBLE) AS n1,
         CAST(sum(cn) OVER () AS DOUBLE) AS n2
  FROM vc
)
SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
       floor(max(abs(cum_a / n1 - cum_n / n2)) * 1000000 + 0.5) / 1000000
         AS ks_d
FROM cum
""",
    tags=["clickhouse-parity", "rank-test"],
)
def ks_test_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``kolmogorovSmirnovTest(x, g)`` parity: the two-sample
    D statistic — max ECDF gap between the A and N return-flag
    ``l_quantity`` distributions.  Same aggregate-first shape as the
    Mann-Whitney query: per-value counts, cumulative sums over the 50-value
    grid, max of |F1 − F2| evaluated at every jump point (ECDFs are step
    functions that only move at observed values, so the grid max IS the
    sup).  D is a ratio of exact integers, rounded floor-form 6dp."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("int").alias("q"), "l_returnflag"
    )
    return ks_two_sample(li, "q", "l_returnflag", "A", "N")


@register(
    "simple_linreg_by_flag",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
                * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy,
         CAST(max(l_quantity) AS DOUBLE) AS x_hi,
         CAST(min(l_quantity) AS DOUBLE) AS x_lo,
         CAST(max(CASE WHEN l_quantity = mxq THEN l_extendedprice END)
              AS DOUBLE) AS y_hi,
         CAST(min(CASE WHEN l_quantity = mnq THEN l_extendedprice END)
              AS DOUBLE) AS y_lo
  FROM (SELECT l_returnflag, l_quantity, l_extendedprice,
               max(l_quantity) OVER (PARTITION BY l_returnflag) AS mxq,
               min(l_quantity) OVER (PARTITION BY l_returnflag) AS mnq
        FROM lineitem)
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000 + 0.5)
         / 1000000 AS slope,
       floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             * 10000 + 0.5) / 10000 AS intercept,
       floor((y_hi - y_lo) / (x_hi - x_lo) * 10000 + 0.5) / 10000
         AS bounding_ratio
FROM s
""",
    tags=["clickhouse-parity", "regression"],
)
def simple_linreg_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)`` + ``boundingRatio``
    parity per return flag: least-squares slope/intercept of
    l_extendedprice on l_quantity from exact DECIMAL power sums
    (n, Σx, Σy, Σx², Σxy), and the bounding ratio — rise over run between
    the extreme-x points.  boundingRatio's y-at-extreme-x is made
    deterministic under x-ties by pinning y_hi = max{y : x = max x} and
    y_lo = min{y : x = min x} (ClickHouse's own pick is processing-order
    dependent); both engines use the identical window + filtered-aggregate
    form.  One partitioned window + one map-side-combined aggregate —
    nothing driver-side, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    wflag = Window.partitionBy("l_returnflag")
    base = li.select(
        "l_returnflag", "l_quantity", "l_extendedprice",
        F.max("l_quantity").over(wflag).alias("mxq"),
        F.min("l_quantity").over(wflag).alias("mnq"),
    )
    xq = F.col("l_quantity").cast("decimal(12,4)")
    yp = F.col("l_extendedprice").cast("decimal(19,4)")
    s = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xq).cast("double").alias("sx"),
        F.sum(yp).cast("double").alias("sy"),
        F.sum(xq * xq).cast("double").alias("sxx"),
        F.sum(xq * yp).cast("double").alias("sxy"),
        F.max("l_quantity").cast("double").alias("x_hi"),
        F.min("l_quantity").cast("double").alias("x_lo"),
        F.max(
            F.when(F.col("l_quantity") == F.col("mxq"),
                   F.col("l_extendedprice"))
        ).cast("double").alias("y_hi"),
        F.min(
            F.when(F.col("l_quantity") == F.col("mnq"),
                   F.col("l_extendedprice"))
        ).cast("double").alias("y_lo"),
    )
    n, sx, sy, sxx, sxy = (
        F.col(x) for x in ("n", "sx", "sy", "sxx", "sxy")
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        rnd(slope, 6).alias("slope"),
        rnd((sy - slope * sx) / n, 4).alias("intercept"),
        rnd(
            (F.col("y_hi") - F.col("y_lo"))
            / (F.col("x_hi") - F.col("x_lo")), 4
        ).alias("bounding_ratio"),
    )


@register(
    "interval_length_sum_by_type",
    oracle="""
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s,
         epoch_us(ts) + 3600000000 AS e
  FROM events
),
flagged AS (
  SELECT event_type, s, e,
         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY event_type
              ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -9223372036854775808) THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT event_type, s, e,
         sum(new_island) OVER (PARTITION BY event_type ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT event_type,
       CAST(sum(len) // 1000000 AS BIGINT) AS covered_sec,
       CAST(count(*) AS BIGINT) AS n_islands
FROM (SELECT event_type, island, max(e) - min(s) AS len
      FROM islands GROUP BY event_type, island)
GROUP BY event_type
""",
    tags=["clickhouse-parity", "intervals"],
)
def interval_length_sum_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum(start, end)`` parity: total length of
    the UNION of [ts, ts+1h) intervals per event type (overlaps merged,
    gaps excluded), plus the merged-interval count.  Gaps-and-islands in
    integer epoch-µs: a partitioned running max of interval end marks
    island starts (s strictly greater than every previous end), a flag
    cumsum numbers islands, and per-island max(e) − min(s) sums exactly.
    Tie order within equal s is immaterial: equal-s rows share e, so the
    running max and flags are reproducible.  Everything is partitioned by
    event_type — no global sort; at 100 TB the window shuffles once on the
    group key like any sessionization."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "event_type", us.alias("s"), (us + 3600000000).alias("e")
    )
    # integer floor-division on BOTH sides: a bare `/` is double division
    # in both engines, and DuckDB's double->BIGINT cast ROUNDS while
    # Spark's truncates — an off-by-one at any .5+ microsecond remainder
    return interval_length_sum(iv, "event_type", "s", "e").select(
        "event_type",
        F.expr("covered div 1000000").alias("covered_sec"),
        F.col("n_islands").cast("bigint").alias("n_islands"),
    )
