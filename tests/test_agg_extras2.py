"""Hand-case pins for queries/agg_extras2.py (mode / deltaSumTimestamp /
quantileExactLow/High) — textbook definitions on inputs small enough to
verify by eye; the oracle mirror covers cross-engine equality."""

import statistics

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_mode_tie_breaks_to_lowest_bucket(spark):
    rows = [("a", 1), ("a", 1), ("a", 7), ("a", 7), ("a", 9)]
    df = spark.createDataFrame(rows, "t string, b int")
    cnt = df.groupBy("t", "b").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("t").orderBy(F.col("c").desc(), F.col("b").asc())
    top = cnt.withColumn("rn", F.row_number().over(w)).filter("rn = 1").first()
    assert (top["b"], top["c"]) == (1, 2)  # 1 and 7 tie at 2 -> lowest wins


def test_delta_sum_timestamp_hand_case(spark):
    # one user: 1.00 -> 3.00 -> 2.00 -> 5.00: positive deltas 200 + 300
    rows = [
        (1, 1.00, "2024-01-01 00:00:00", 1),
        (1, 3.00, "2024-01-01 00:01:00", 2),
        (1, 2.00, "2024-01-01 00:02:00", 3),
        (1, 5.00, "2024-01-01 00:03:00", 4),
        # second user decreasing only: contributes 0
        (2, 9.00, "2024-01-01 00:00:00", 5),
        (2, 4.00, "2024-01-01 00:01:00", 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, value double, ts string, event_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    q = df.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "ts", "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = q.select((F.col("cents") - F.lag("cents").over(w)).alias("delta"))
    got = d.agg(
        F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0)).alias("s")
    ).first()["s"]
    assert got == 500


def _quantile_low_high(spark, values, q):
    df = spark.createDataFrame([(v,) for v in values], "v int")
    grid = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = grid.select(
        "v", F.sum("c").over(wcum).alias("cum_c"), F.sum("c").over(wall).alias("n")
    )
    lo_i = F.floor(F.lit(q) * (F.col("n") - 1)).cast("long")
    hi_i = (-F.floor(F.lit(-q) * (F.col("n") - 1))).cast("long")
    r = cum.agg(
        F.min(F.when(F.col("cum_c") > lo_i, F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum_c") > hi_i, F.col("v"))).alias("hi"),
    ).first()
    return r["lo"], r["hi"]


def test_quantile_low_high_matches_statistics_module(spark):
    even = [1, 3, 3, 7, 9, 20]
    odd = [5, 1, 8, 8, 2]
    lo, hi = _quantile_low_high(spark, even, 0.5)
    assert lo == statistics.median_low(even) == 3
    assert hi == statistics.median_high(even) == 7
    lo, hi = _quantile_low_high(spark, odd, 0.5)
    # odd n: low == high == the middle element
    assert lo == hi == statistics.median_low(sorted(odd)) == 5


def test_quantile_low_high_with_duplicates_at_boundary(spark):
    vals = [2, 2, 2, 2, 10]
    lo, hi = _quantile_low_high(spark, vals, 0.5)
    assert lo == hi == 2
    lo, hi = _quantile_low_high(spark, vals, 0.9)
    # index floor(0.9*4)=3 -> 2; ceil(3.6)=4 -> 10
    assert (lo, hi) == (2, 10)
