from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from dev_clickhouse_spark.functions import (
    day_of_week_mon1,
    iso_week,
    json_array_string,
    json_has,
    json_string,
    parse_ts_best_effort,
    surrogate_key,
    time_key,
    to_start_of_five_minute,
    to_yyyymmdd,
)


def test_date_time_keys(spark):
    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 3, 31, 23, 59, 58))]
    ).select(
        to_yyyymmdd("ts").alias("dk"),
        time_key("ts").alias("tk"),
        day_of_week_mon1("ts").alias("dow"),
        iso_week("ts").alias("wk"),
    )
    r = df.first()
    assert r.dk == 20240331
    assert r.tk == 235958
    assert r.dow == 7  # 2024-03-31 is a Sunday → 7 in Mon=1 numbering
    assert r.wk == 13


def test_dow_full_week(spark):
    # 2024-01-01 is a Monday.
    rows = [Row(ts=dt.datetime(2024, 1, 1 + i)) for i in range(7)]
    vals = [
        r.dow
        for r in spark.createDataFrame(rows)
        .select(day_of_week_mon1("ts").alias("dow"))
        .collect()
    ]
    assert vals == [1, 2, 3, 4, 5, 6, 7]


def test_iso_week_year_boundaries(spark):
    # SURVEY §2.8 caveat: toISOWeek ↔ weekofyear must agree at year bounds.
    cases = [
        (dt.datetime(2021, 1, 1), 53),   # belongs to ISO week 53 of 2020
        (dt.datetime(2020, 12, 31), 53),
        (dt.datetime(2024, 12, 30), 1),  # Monday of ISO week 1 of 2025
        (dt.datetime(2024, 1, 1), 1),
        (dt.datetime(2023, 1, 1), 52),   # Sunday of ISO week 52 of 2022
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "ts timestamp").select(
        "ts", iso_week("ts").alias("wk")
    )
    got = {r.ts: r.wk for r in df.collect()}
    import duckdb

    for d, want in cases:
        assert got[d] == want
        assert duckdb.sql(f"SELECT weekofyear(TIMESTAMP '{d}')").fetchone()[0] == want


def test_five_minute_bucket(spark):
    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1, 10, 7, 31))]
    ).select(to_start_of_five_minute("ts").alias("b"))
    assert df.first().b == dt.datetime(2024, 1, 1, 10, 5, 0)


def test_parse_ts_best_effort(spark):
    samples = [
        ("2024-05-01T10:00:00.123Z", dt.datetime(2024, 5, 1, 10, 0, 0, 123000)),
        ("2024-05-01T10:00:00Z", dt.datetime(2024, 5, 1, 10, 0)),
        ("2024-05-01 10:00:00", dt.datetime(2024, 5, 1, 10, 0)),
        ("2024-05-01T10:00:00.123456Z", dt.datetime(2024, 5, 1, 10, 0, 0, 123456)),
        ("2024-05-01", dt.datetime(2024, 5, 1)),
        ("not a date", None),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in samples], "s string").select(
        "s", parse_ts_best_effort("s").alias("ts")
    )
    got = {r.s: r.ts for r in df.collect()}
    for s, want in samples:
        assert got[s] == want, (s, got[s], want)


def test_json_helpers(spark):
    raw = '{"a": {"b": "x"}, "tags": ["t1", "t2"], "arr": [{"v": 1}]}'
    df = spark.createDataFrame([Row(raw=raw), Row(raw="{}")]).select(
        json_string("raw", "$.a.b").alias("s"),
        json_has("raw", "$.a").alias("h"),
        json_array_string("raw", "$.tags").alias("t"),
        json_string("raw", "$.arr[0].v").alias("idx"),
    )
    rows = df.collect()
    assert rows[0].s == "x" and rows[0].h and rows[0].t == ["t1", "t2"]
    assert rows[0].idx == "1"
    assert rows[1].s is None and not rows[1].h and rows[1].t == []


def test_surrogate_key_canonicalization(spark):
    # Null string and empty string canonicalize identically (reference
    # ifNull(x,'') idiom) — dim build and fact lookup must agree.
    df = spark.createDataFrame(
        [("a", None, 1), ("a", "", 1)], "x string, y string, z int"
    ).select(surrogate_key("x", "y", "z").alias("k"))
    ks = [r.k for r in df.collect()]
    assert ks[0] == ks[1]
    assert isinstance(ks[0], int)
