"""OPTIMIZE TABLE ... FINAL DEDUPLICATE [BY cols]: full-merge row dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dev_clickhouse_spark.io import load_table
from dev_clickhouse_spark.plans.warehouse import Warehouse

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    # batch 0 and batch 1 share half their rows -> exact duplicates
    w.append("ev", ev.filter(F.col("event_id") % 2 == 0), batch_id=0)
    w.append("ev", ev.filter(F.col("event_id") % 4 != 1), batch_id=1)
    return w


def test_deduplicate_all_columns(spark, wh):
    total = load_table(spark, SF, "events").count()
    before = wh.read("ev").count()
    assert before > total  # duplicates exist
    r = wh.optimize_deduplicate("ev")
    assert r["rows_before"] == before
    assert r["rows_removed"] > 0
    got = wh.read("ev")
    assert got.count() == r["rows_after"] == got.distinct().count()
    # exactly the union of the two batch predicates, each row once
    expect = (
        load_table(spark, SF, "events")
        .filter((F.col("event_id") % 2 == 0) | (F.col("event_id") % 4 != 1))
        .count()
    )
    assert r["rows_after"] == expect


def test_deduplicate_by_columns_is_deterministic(spark, wh):
    r = wh.optimize_deduplicate("ev", by=["user_id", "event_type"])
    got = wh.read("ev")
    assert got.count() == r["rows_after"]
    assert (
        got.select("user_id", "event_type").distinct().count()
        == r["rows_after"]
    )
    # pinned pick: rerunning the full merge is a no-op on row content
    snap = sorted(map(tuple, got.collect()))
    wh.optimize_deduplicate("ev", by=["user_id", "event_type"])
    assert sorted(map(tuple, wh.read("ev").collect())) == snap


def test_deduplicate_survives_concurrent_append_contract(spark, wh):
    """The manifest pointer flip keeps batches appended after the
    snapshot: dedupe acts on the snapshot only."""
    wh.optimize_deduplicate("ev")
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    wh.append("ev", ev.filter(F.col("event_id") % 4 == 1), batch_id=2)
    n = wh.read("ev").count()
    assert n == wh.read("ev").distinct().count()  # still no dupes overall
