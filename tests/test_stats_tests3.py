"""Semantic tests for the studentTTest / rankCorr / KMV-theta parity
family (stats_tests3.py) against plain-Python references on hand-built
data — cross-engine agreement is the oracle gate's job; these pin the
MATH (pooled-variance t, midrank Spearman, and the KMV estimator's exact
small-set / estimated large-set branches and intersection soundness)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dev_clickhouse_spark.queries.stats_tests3 import (
    KMV_K,
    _kmv_sketches,
    rank_corr,
    student_ttest,
)


def _ref_student_t(xs, ys):
    n1, n2 = len(xs), len(ys)
    m1, m2 = sum(xs) / n1, sum(ys) / n2
    ss1 = sum((x - m1) ** 2 for x in xs)
    ss2 = sum((y - m2) ** 2 for y in ys)
    sp2 = (ss1 + ss2) / (n1 + n2 - 2)
    return (m1 - m2) / math.sqrt(sp2 * (1 / n1 + 1 / n2))


def _ref_spearman(pairs):
    """Pearson of midranks, the definition rankCorr implements."""
    def midranks(vals):
        from collections import Counter

        cnt = Counter(vals)
        smaller, acc = {}, 0
        for v in sorted(cnt):
            smaller[v] = acc
            acc += cnt[v]
        return [smaller[v] + (cnt[v] + 1) / 2 for v in vals]

    rx = midranks([x for x, _ in pairs])
    ry = midranks([y for _, y in pairs])
    n = len(pairs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    return num / den


def _h48(key: str) -> float:
    """The repo's cross-engine normalized hash: 48-bit md5 prefix."""
    v = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
    return (v + 1) / float(1 << 48)


def test_student_t_matches_reference(spark):
    a = [10, 12, 13, 13, 15, 18, 21]
    b = [9, 11, 11, 14, 16]
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    df = spark.createDataFrame(rows, "x int, g string").repartition(3)
    got = student_ttest(df, "x", "g", "A", "B").collect()[0]
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert got["df"] == len(a) + len(b) - 2
    assert got["student_t"] == pytest.approx(_ref_student_t(a, b), abs=1e-6)


def test_student_t_symmetry(spark):
    a, b = [1, 2, 3, 4], [2, 3, 4, 5]
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    df = spark.createDataFrame(rows, "x int, g string")
    t_ab = student_ttest(df, "x", "g", "A", "B").collect()[0]["student_t"]
    t_ba = student_ttest(df, "x", "g", "B", "A").collect()[0]["student_t"]
    assert t_ab == pytest.approx(-t_ba, abs=1e-9)


def test_rank_corr_matches_reference_with_ties(spark):
    pairs = [
        (1, 10), (1, 20), (2, 20), (2, 20), (3, 30),
        (3, 10), (4, 40), (5, 40), (5, 50), (5, 50),
    ]
    df = spark.createDataFrame(pairs, "x int, y int").repartition(3)
    got = rank_corr(df, "x", "y").collect()[0]
    assert got["n"] == len(pairs)
    assert got["rank_corr"] == pytest.approx(_ref_spearman(pairs), abs=1e-6)


def test_rank_corr_perfect_monotone_is_one(spark):
    pairs = [(i, i * i) for i in range(1, 20)]  # monotone, nonlinear
    df = spark.createDataFrame(pairs, "x int, y int")
    assert rank_corr(df, "x", "y").collect()[0]["rank_corr"] == pytest.approx(
        1.0
    )
    anti = [(i, -i * i) for i in range(1, 20)]
    df2 = spark.createDataFrame(anti, "x int, y int")
    assert rank_corr(df2, "x", "y").collect()[0][
        "rank_corr"
    ] == pytest.approx(-1.0)


def _sketch_df(spark, groups: dict[str, list[str]]):
    rows = [(g, _h48(k)) for g, keys in groups.items() for k in keys]
    return spark.createDataFrame(rows, "g string, h double").repartition(3)


def test_kmv_small_set_is_exact(spark):
    keys = [f"k{i}" for i in range(40)]  # well under k=256
    df = _sketch_df(spark, {"a": keys, "b": keys[:10]})
    sk = _kmv_sketches(df, "g", "h", KMV_K)
    th = {
        r["g"]: (r["n_distinct"], r["theta"])
        for r in sk.groupBy("g").agg(
            F.max("n_distinct").alias("n_distinct"),
            F.max("theta").alias("theta"),
        ).collect()
    }
    assert th["a"] == (40, 1.0) and th["b"] == (10, 1.0)
    # exact mode keeps every distinct hash
    assert sk.filter(F.col("g") == "a").count() == 40


def test_kmv_large_set_estimator_within_error(spark):
    n = 5000
    df = _sketch_df(spark, {"a": [f"key-{i}" for i in range(n)]})
    sk = _kmv_sketches(df, "g", "h", KMV_K)
    row = sk.groupBy("g").agg(
        F.max("rn").alias("mx"), F.max("h").alias("theta"),
        F.max("n_distinct").alias("nd"),
    ).collect()[0]
    assert row["mx"] == KMV_K and row["nd"] == n
    est = (KMV_K - 1) / row["theta"]
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - n) / n < 0.25
    # sketch is the k smallest hashes: theta equals the python k-th smallest
    hs = sorted(_h48(f"key-{i}") for i in range(n))
    assert row["theta"] == pytest.approx(hs[KMV_K - 1], abs=0)


def test_kmv_registered_query_sketch_vs_exact(spark):
    """Intersection estimate from sketches tracks the true overlap on a
    controlled two-group universe (shared prefix of keys)."""
    shared = [f"s{i}" for i in range(1500)]
    only_a = [f"a{i}" for i in range(1500)]
    only_b = [f"b{i}" for i in range(2000)]
    df = _sketch_df(spark, {"a": shared + only_a, "b": shared + only_b})
    sk = _kmv_sketches(df, "g", "h", KMV_K).cache()
    th = sk.groupBy("g").agg(
        F.when(F.max("rn") == KMV_K, F.max("h")).otherwise(F.lit(1.0))
        .alias("theta")
    ).collect()
    theta = min(r["theta"] for r in th)
    a_h = {r["h"] for r in sk.filter(F.col("g") == "a").collect()}
    b_h = {r["h"] for r in sk.filter(F.col("g") == "b").collect()}
    n_common = sum(1 for h in a_h & b_h if h < theta)
    est = n_common / theta
    assert abs(est - 1500) / 1500 < 0.35  # intersection error ~ 2x per-set
