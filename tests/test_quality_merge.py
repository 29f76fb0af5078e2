from __future__ import annotations

import datetime as dt

from dev_clickhouse_spark.operators.merge import merge_upsert
from dev_clickhouse_spark.quality import (
    check_freshness,
    check_not_null,
    check_schema_drift,
    check_unique_key,
    check_volume,
    run_dq_rules,
)


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, 10, "keep"), (2, 20, "update-me")], "k int, v int, note string"
    )
    source = spark.createDataFrame(
        [(2, 99, None), (3, 30, "new")], "k int, v int, note string"
    )
    out = {r.k: (r.v, r.note) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out[1] == (10, "keep")       # target-only passes through
    assert out[2] == (99, None)         # matched: source wins, null overwrites
    assert out[3] == (30, "new")        # source-only inserts


def test_merge_upsert_update_cols_subset(spark):
    target = spark.createDataFrame([(1, 10, "t")], "k int, v int, note string")
    source = spark.createDataFrame([(1, 99, "s")], "k int, v int, note string")
    out = merge_upsert(target, source, ["k"], update_cols=["v"]).first()
    assert out.v == 99 and out.note == "t"   # note not in update set → preserved


def test_dq_checks(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1, 12, 0)), (2, dt.datetime(2026, 1, 1, 12, 30)),
         (2, None)],
        "id int, ts timestamp",
    )
    now = dt.datetime(2026, 1, 1, 12, 40)
    assert check_freshness(df, "ts", 15, now=now)["passed"]
    assert not check_freshness(df, "ts", 5, now=now)["passed"]
    assert check_volume(df, min_rows=3)["passed"]
    assert not check_volume(df, min_rows=4)["passed"]
    assert check_schema_drift(df, {"id": "int", "ts": "timestamp"})["passed"]
    drift = check_schema_drift(df, {"id": "bigint", "ts": "timestamp"})
    assert not drift["passed"] and "id" in drift["observed"]
    assert not check_not_null(df, ["ts"])["passed"]
    assert check_not_null(df, ["id"])["passed"]
    assert not check_unique_key(df, ["id"])["passed"]
    assert check_unique_key(df, ["id", "ts"])["passed"]

    results = run_dq_rules(
        df,
        [
            {"rule_type": "volume", "min_rows": 1},
            {"rule_type": "not_null", "cols": ["id"]},
            {"rule_type": "unique_key", "keys": ["id", "ts"]},
        ],
        table="t",
    )
    assert all(r["passed"] for r in results) and len(results) == 3
