"""Semantic tests for the hypothesis-test / regression / interval parity
family (stats_tests.py) against straightforward Python reference
implementations on hand-built data — the same model the welch/cramers
queries use (cross-engine agreement is the oracle gate's job; these pin
the MATH)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dev_clickhouse_spark.queries.stats_tests import (
    interval_length_sum,
    ks_two_sample,
    mann_whitney_u,
)


def _ref_mann_whitney(xs, ys):
    """Midrank U + tie-corrected z, straight from the textbook formula."""
    pooled = sorted(xs + ys)
    # midrank of value v = #smaller + (#equal + 1)/2
    from collections import Counter

    cnt = Counter(pooled)
    smaller, rank = {}, 0
    for v in sorted(cnt):
        smaller[v] = rank
        rank += cnt[v]
    def midrank(v):
        return smaller[v] + (cnt[v] + 1) / 2

    n1, n2 = len(xs), len(ys)
    r1 = sum(midrank(v) for v in xs)
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    ties = sum(c ** 3 - c for c in cnt.values())
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    return u1, (u1 - n1 * n2 / 2) / sigma


def _ref_ks(xs, ys):
    n1, n2 = len(xs), len(ys)
    grid = sorted(set(xs + ys))
    return max(
        abs(sum(x <= v for x in xs) / n1 - sum(y <= v for y in ys) / n2)
        for v in grid
    )


@pytest.fixture()
def two_sample_df(spark):
    # heavy ties on purpose: values 1..5 with uneven group mixes
    a = [1, 1, 2, 2, 2, 3, 4, 4, 5, 5, 5, 5]
    b = [1, 2, 2, 3, 3, 3, 3, 4, 5]
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    return (
        spark.createDataFrame(rows, "v int, g string").repartition(3),
        a,
        b,
    )


def test_mann_whitney_matches_reference(two_sample_df):
    df, a, b = two_sample_df
    got = mann_whitney_u(df, "v", "g", "A", "B").collect()[0]
    u1, z = _ref_mann_whitney(a, b)
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert got["u1"] == pytest.approx(u1, abs=1e-9)
    assert got["mw_z"] == pytest.approx(z, abs=1e-6)


def test_mann_whitney_no_ties_exact_ranks(spark):
    # distinct values: U reduces to pairwise-win count, checkable directly
    a, b = [10, 30, 50], [20, 40]
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    df = spark.createDataFrame(rows, "v int, g string")
    got = mann_whitney_u(df, "v", "g", "A", "B").collect()[0]
    wins = sum(x > y for x in a for y in b)  # 0+1+2 = 3... (10>none,30>20,50>both)
    assert got["u1"] == pytest.approx(wins)


def test_ks_matches_reference(two_sample_df):
    df, a, b = two_sample_df
    got = ks_two_sample(df, "v", "g", "A", "B").collect()[0]
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert got["ks_d"] == pytest.approx(_ref_ks(a, b), abs=1e-6)


def test_ks_disjoint_samples_is_one(spark):
    rows = [(1, "A"), (2, "A"), (10, "B"), (11, "B")]
    df = spark.createDataFrame(rows, "v int, g string")
    assert ks_two_sample(df, "v", "g", "A", "B").collect()[0]["ks_d"] == 1.0


def test_interval_length_sum_merges_overlaps(spark):
    # g1: [0,10) ∪ [5,12) ∪ [20,25) -> covered 17, 2 islands
    #     (touching [12,15) would NOT start a new island: s > prev end fails)
    # g2: [0,5) ∪ [5,8) -> adjacent intervals merge (s == prev end), 8, 1
    rows = [
        ("g1", 0, 10), ("g1", 5, 12), ("g1", 20, 25),
        ("g2", 0, 5), ("g2", 5, 8),
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long").repartition(2)
    got = {
        r["g"]: (r["covered"], r["n_islands"])
        for r in interval_length_sum(df, "g", "s", "e").collect()
    }
    assert got == {"g1": (17, 2), "g2": (8, 1)}


def test_interval_length_sum_duplicate_starts(spark):
    # duplicate (s, e) rows and containment: [0,10) x2 ∪ [2,4) -> 10, 1
    rows = [("g", 0, 10), ("g", 0, 10), ("g", 2, 4)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    r = interval_length_sum(df, "g", "s", "e").collect()[0]
    assert (r["covered"], r["n_islands"]) == (10, 1)


def test_simple_linreg_matches_closed_form(spark, tmp_path):
    # run the registered query shape on a local frame via the same math:
    # y = 3x + 7 exactly -> slope 3, intercept 7, bounding_ratio 3
    import numpy as np

    xs = np.array([1, 2, 3, 4, 5, 5], dtype=float)
    ys = 3 * xs + 7
    rows = [(float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "x double, y double")
    n, sx, sy = len(xs), xs.sum(), ys.sum()
    sxx, sxy = (xs * xs).sum(), (xs * ys).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = df.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
        .alias("slope")
    ).collect()[0]
    assert got["slope"] == pytest.approx(slope) == pytest.approx(3.0)
