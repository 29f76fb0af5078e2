"""Semantic tests for the string-search / geo / bitmap parity family
(string_geo.py): known-value geodesics and hand-built bitmap-cardinality
cases; cross-engine agreement is the oracle gate's job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dev_clickhouse_spark.queries.string_geo import haversine_meters


def _dist(spark, p1, p2):
    df = spark.createDataFrame(
        [p1 + p2], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    return df.select(
        haversine_meters(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("m")
    ).collect()[0]["m"]


def test_haversine_known_points(spark):
    R = 6371000.0
    import math

    # equator -> pole: a quarter great circle
    assert _dist(spark, (0.0, 0.0), (90.0, 0.0)) == pytest.approx(
        math.pi / 2 * R, rel=1e-12
    )
    # antipodal along the equator: half circumference
    assert _dist(spark, (0.0, 0.0), (0.0, 180.0)) == pytest.approx(
        math.pi * R, rel=1e-12
    )
    # identical points and symmetry
    assert _dist(spark, (48.85, 2.35), (48.85, 2.35)) == 0.0
    assert _dist(spark, (48.85, 2.35), (40.71, -74.0)) == pytest.approx(
        _dist(spark, (40.71, -74.0), (48.85, 2.35)), rel=1e-12
    )
    # 1 degree of longitude at the equator = R * pi/180
    assert _dist(spark, (0.0, 10.0), (0.0, 11.0)) == pytest.approx(
        R * 3.141592653589793 / 180, rel=1e-9
    )


def test_bitmap_cardinalities_hand_case(spark):
    # 3 types; users: u1 in all 3 (odd), u2 in {a,b} (even), u3 in {a} (odd)
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),
        (2, "a"), (2, "b"),
        (3, "a"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("k")
    )
    nt = ev.agg(F.countDistinct("event_type").alias("n_types"))
    got = (
        per_user.crossJoin(F.broadcast(nt))
        .groupBy("n_types")
        .agg(
            F.count(F.lit(1)).alias("or_card"),
            F.count(F.when(F.col("k") == F.col("n_types"), 1))
            .alias("and_card"),
            F.count(F.when(F.col("k") % 2 == 1, 1)).alias("xor_card"),
        )
        .collect()[0]
    )
    assert (got["n_types"], got["or_card"], got["and_card"],
            got["xor_card"]) == (3, 3, 1, 2)


def test_levenshtein_first_last_word(spark):
    # pin a few classic distances through the same JVM fn the query uses
    df = spark.createDataFrame(
        [("kitten sitting",), ("flaw lawn",), ("same same",)], "s string"
    )
    words = F.split(F.col("s"), " ")
    got = [
        r["d"]
        for r in df.select(
            F.levenshtein(
                F.element_at(words, 1), F.element_at(words, -1)
            ).alias("d")
        ).collect()
    ]
    assert got == [3, 2, 0]


def test_sparkbar_uses_unicode_blocks(spark):
    # Spark's char() is ASCII-mod-256 — the query must emit REAL block
    # elements (U+2581..U+2588) or spaces, never mangled single bytes
    from dev_clickhouse_spark.queries.string_geo import (
        _SPARKBAR_BUCKETS,
        sparkbar_daily_events_by_type,
    )

    rows = sparkbar_daily_events_by_type(
        spark, "/root/testdata/sf0.001"
    ).collect()
    allowed = set("▁▂▃▄▅▆▇█ ")
    assert rows
    for r in rows:
        assert len(r["bar"]) == _SPARKBAR_BUCKETS
        assert set(r["bar"]) <= allowed
        assert "█" in r["bar"]  # the max bucket always renders full-height
