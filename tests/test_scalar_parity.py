"""Semantic hand-case tests for the codec / date-arithmetic / array-scan
parity family (scalar_parity.py); cross-engine agreement on the real
tables is the oracle gate's job (tools/check_correctness.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.queries.scalar_parity import array_cumsum


def test_codec_functions_known_values(spark):
    df = spark.createDataFrame([("hello", 26), ("", 255)], "s string, k long")
    row = df.select(
        F.base64(F.col("s").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("s").cast("binary")))
        .cast("string").alias("rt"),
        F.hex(F.col("k")).alias("hx"),
        F.bit_count(F.col("k")).alias("bc"),
    ).collect()
    assert row[0]["b64"] == "aGVsbG8="          # RFC 4648
    assert row[0]["rt"] == "hello"
    assert (row[0]["hx"], row[0]["bc"]) == ("1A", 3)
    assert row[1]["rt"] == ""                    # empty round-trips
    assert (row[1]["hx"], row[1]["bc"]) == ("FF", 8)


def test_date_arithmetic_known_values(spark):
    df = spark.createDataFrame([("2024-01-31 07:08:09",)], "s string") \
        .select(F.col("s").cast("timestamp").alias("ts"))
    d = F.col("ts").cast("date")
    row = df.select(
        F.datediff(d, F.lit("2024-01-01")).alias("dd"),
        F.date_trunc("week", d).cast("date").cast("string").alias("mon"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("fmt"),
        F.add_months(d, 1).cast("string").alias("m1"),
        F.date_add(d, 45).cast("string").alias("d45"),
    ).collect()[0]
    assert row["dd"] == 30
    # 2024-01-31 is a Wednesday; Monday-start week begins 2024-01-29
    assert row["mon"] == "2024-01-29"
    assert row["fmt"] == "2024-01-31 07"
    # end-of-month clamp: Jan 31 + 1 month = Feb 29 (leap year)
    assert row["m1"] == "2024-02-29"
    assert row["d45"] == "2024-03-16"


def test_array_cumsum_hand_cases(spark):
    df = spark.createDataFrame(
        [([10, 20, 30],), ([5],), ([],)],
        "arr array<bigint>",
    )
    got = [r["cs"] for r in df.select(array_cumsum("arr").alias("cs"))
           .collect()]
    assert got == [[10, 30, 60], [5], []]


def test_array_slice_clamps_like_oracle(spark):
    # arraySlice(arr, 3, 4) on a short array clamps; empty slice sums to 0
    df = spark.createDataFrame([([1, 2],), ([1, 2, 3, 4, 5, 6, 7],)],
                               "arr array<bigint>")
    mid = F.aggregate(
        F.slice(F.col("arr"), 3, 4),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    got = [r["m"] for r in df.select(mid.alias("m")).collect()]
    assert got == [0, 3 + 4 + 5 + 6]


def test_array_structure_hand_cases(spark):
    """arrayDifference leads with 0; arrayCompact collapses only
    CONSECUTIVE duplicates (it is not distinct)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([5, 5, 7, 7, 7, 9, 5],)], "arr array<bigint>"
    )
    arr = F.col("arr")
    diff = F.transform(
        arr,
        lambda x, i: F.when(i == 0, F.lit(0).cast("bigint"))
        .otherwise(x - F.element_at(arr, i)),
    )
    compact = F.filter(
        arr, lambda x, i: (i == 0) | (x != F.element_at(arr, i))
    )
    row = df.select(diff.alias("d"), compact.alias("c")).collect()[0]
    assert row["d"] == [0, 0, 2, 0, 0, 2, -4]
    # trailing 5 survives: it is not consecutive with the leading run
    assert row["c"] == [5, 7, 9, 5]
