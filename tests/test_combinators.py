"""Semantic tests for the combinator/matrix/positional parity family
(combinators.py) against Python/numpy references on hand-built data."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _entropy(counts):
    n = sum(counts)
    return -sum(c / n * math.log(c / n) for c in counts if c)


def test_theils_u_identity_on_hand_grid(spark):
    # independent X,Y -> U ~ 0; Y = f(X) -> U(Y|X) = 1
    # verify the ln(n) - sum(c ln c)/n identity the query uses
    counts = [4, 6, 10]
    n = sum(counts)
    ident = math.log(n) - sum(c * math.log(c) for c in counts) / n
    assert ident == pytest.approx(_entropy(counts), abs=1e-12)


def test_theils_u_functional_dependence(spark):
    # y = x exactly: H(X|Y) = 0 so U(X|Y) = 1 in both directions
    rows = [(i % 3, i % 3) for i in range(30)]
    cells = (
        spark.createDataFrame(rows, "x int, y int")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )

    def h(df):
        return df.agg(
            (F.log(F.sum("ck")) - F.sum(F.col("ck") * F.log("ck"))
             / F.sum("ck")).alias("h")
        ).collect()[0]["h"]

    h_x = h(cells.groupBy("x").agg(F.sum("c").alias("ck")))
    h_y = h(cells.groupBy("y").agg(F.sum("c").alias("ck")))
    h_xy = h(cells.select(F.col("c").alias("ck")))
    u = (h_x - (h_xy - h_y)) / h_x
    assert u == pytest.approx(1.0, abs=1e-12)
    assert h_x == pytest.approx(math.log(3), abs=1e-12)


def test_corr_power_sum_form_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.normal(size=200)
    b = 0.5 * a + rng.normal(size=200)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)], "a double, b double"
    )
    s = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("a").alias("sa"), F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    ).collect()[0]
    corr = (s["n"] * s["sab"] - s["sa"] * s["sb"]) / math.sqrt(
        (s["n"] * s["saa"] - s["sa"] ** 2)
        * (s["n"] * s["sbb"] - s["sb"] ** 2)
    )
    assert corr == pytest.approx(np.corrcoef(a, b)[0, 1], abs=1e-9)


def test_sum_resample_grid_semantics(spark):
    # buckets [1,11),[11,21): out-of-range dropped, empty buckets zero
    rows = [
        ("A", 1, 100), ("A", 10, 50), ("A", 15, 30),
        ("A", 60, 999),          # out of range -> dropped
        ("B", 5, 10),            # B has only bucket 0
    ]
    df = spark.createDataFrame(rows, "g string, q int, v long")
    b = (
        df.filter((F.col("q") >= 1) & (F.col("q") < 21))
        .groupBy("g", F.floor((F.col("q") - 1) / 10).cast("long").alias("bk"))
        .agg(F.sum("v").alias("s"))
    )
    per = b.groupBy("g").agg(
        F.map_from_entries(F.collect_list(F.struct("bk", "s"))).alias("m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(1)),
        lambda i: F.coalesce(
            F.element_at("m", i.cast("long")), F.lit(0).cast("long")
        ),
    )
    got = {r["g"]: r["a"] for r in per.select("g", arr.alias("a")).collect()}
    assert got == {"A": [150, 30], "B": [10, 0]}


def test_paste_join_rank_alignment(spark):
    from dev_clickhouse_spark.queries.combinators import (
        paste_join_price_ranks,
    )

    out = paste_join_price_ranks(spark, "/root/testdata/sf0.001")
    rows = out.orderBy("rank").collect()
    assert len(rows) == 100
    assert [r["rank"] for r in rows] == list(range(1, 101))
    # rank 1 really is the global max on both sides, and ranks descend
    cents_o = [r["order_cents"] for r in rows]
    cents_p = [r["part_cents"] for r in rows]
    assert cents_o == sorted(cents_o, reverse=True)
    assert cents_p == sorted(cents_p, reverse=True)
