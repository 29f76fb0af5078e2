"""geohashEncode/geohashDecode contract tests — public known vectors
(Wikipedia's worked example and the original geohash.org examples) plus a
roundtrip property: decode(encode(p)) lands inside the cell, and encoding
the decoded midpoint reproduces the hash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dev_clickhouse_spark.functions.geo import (
    _decode_str,
    geohash_decode,
    geohash_encode,
)


def _encode_one(spark, lat, lon, precision):
    df = spark.createDataFrame([(lat, lon)], "lat double, lon double")
    return df.select(
        geohash_encode(F.col("lat"), F.col("lon"), precision).alias("g")
    ).collect()[0]["g"]


def test_known_vectors(spark):
    # Wikipedia worked example: (57.64911, 10.40744) -> u4pruydqqvj (11)
    assert _encode_one(spark, 57.64911, 10.40744, 11) == "u4pruydqqvj"
    # original geohash.org example
    assert _encode_one(spark, 42.605, -5.603, 5) == "ezs42"
    # poles / meridian edges stay in-alphabet and deterministic
    assert _encode_one(spark, 90.0, 180.0, 6) == _encode_one(
        spark, 90.0, -180.0, 6
    )  # lon wraps


def test_null_in_null_out(spark):
    df = spark.createDataFrame(
        [(None, 10.0), (50.0, None), (50.0, 10.0)],
        "lat double, lon double",
    )
    got = [
        r["g"]
        for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), 6).alias("g")
        ).collect()
    ]
    assert got[0] is None and got[1] is None and got[2] is not None


def test_decode_midpoint_and_roundtrip(spark):
    la, lo = _decode_str("u4pruydqqvj")
    assert la == pytest.approx(57.64911, abs=1e-4)
    assert lo == pytest.approx(10.40744, abs=1e-4)
    # roundtrip through the Spark columns
    pts = [(57.64911, 10.40744), (-33.8688, 151.2093), (0.0, 0.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    enc = df.select(
        "lat", "lon",
        geohash_encode(F.col("lat"), F.col("lon"), 9).alias("g"),
    )
    dec = enc.select(
        "lat", "lon", "g", geohash_decode(F.col("g")).alias("d")
    ).collect()
    for r in dec:
        # cell at precision 9 is ~5m: midpoint must be within 1e-3 deg
        assert r["d"]["lat"] == pytest.approx(r["lat"], abs=1e-3)
        assert r["d"]["lon"] == pytest.approx(r["lon"], abs=1e-3)
    # re-encoding the midpoint reproduces the hash (midpoint is interior)
    mid = [(r["d"]["lat"], r["d"]["lon"], r["g"]) for r in dec]
    df2 = spark.createDataFrame(mid, "lat double, lon double, g string")
    again = df2.select(
        "g", geohash_encode(F.col("lat"), F.col("lon"), 9).alias("g2")
    ).collect()
    assert all(r["g"] == r["g2"] for r in again)


def test_decode_invalid_is_null(spark):
    df = spark.createDataFrame([("u4pr",), ("",), ("ilo!",), (None,)],
                               "g string")
    got = df.select(geohash_decode(F.col("g")).alias("d")).collect()
    assert got[0]["d"]["lat"] is not None
    assert got[1]["d"]["lat"] is None          # empty
    assert got[2]["d"]["lat"] is None          # 'i','l','o' not in alphabet
    assert got[3]["d"]["lat"] is None
