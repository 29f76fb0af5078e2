"""ATTACH / REPLACE PARTITION FROM: metadata-only partition movement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dev_clickhouse_spark.io import load_table
from dev_clickhouse_spark.plans.warehouse import Warehouse

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def env(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.set_partitioning("src", ["event_id"])
    w.set_partitioning("dst", ["event_id"])
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    for b in range(2):
        w.append("src", ev.filter(F.col("event_id") % 2 == b), batch_id=b)
    w.append("dst", ev.limit(0), batch_id=0)
    dates = sorted(
        r.event_date for r in w.read("src").select("event_date").distinct().collect()
    )
    return w, dates


def _inodes(root):
    out = set()
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.stat(os.path.join(dirpath, f)).st_ino)
    return out


def test_attach_moves_partition_without_copying(spark, env):
    w, dates = env
    d = dates[0]
    src_rows = w.read("src").filter(F.col("event_date") == d).count()
    assert src_rows > 0
    n = w.attach_partition("src", "dst", d)
    assert n > 0
    got = w.read("dst")
    assert got.count() == src_rows
    assert {r.event_date for r in got.select("event_date").distinct().collect()} == {d}
    # source untouched
    assert w.read("src").count() == load_table(spark, SF, "events").count()
    # hardlinks, not copies: every attached inode exists in the source set
    src_inodes = _inodes(w.path("src"))
    dst_inodes = _inodes(w.path("dst"))
    assert dst_inodes and dst_inodes <= src_inodes


def test_replace_partition_swaps_existing_rows(spark, env):
    w, dates = env
    d = dates[0]
    w.attach_partition("src", "dst", d)
    before = w.read("dst").count()
    # second attach without replace DUPLICATES (union of members)
    w.attach_partition("src", "dst", d)
    assert w.read("dst").count() == 2 * before
    # REPLACE collapses back to exactly one copy
    w.attach_partition("src", "dst", d, replace=True)
    assert w.read("dst").count() == before


def test_attach_missing_partition_is_noop(spark, env):
    w, dates = env
    v0 = w.load_manifest("dst")["version"]
    assert w.attach_partition("src", "dst", "1990-01-01") == 0
    assert w.load_manifest("dst")["version"] == v0


def test_attach_refuses_source_with_deletion_vectors(spark, env):
    w, dates = env
    w.delete_where_lightweight("src", "event_type = 'error'")
    with pytest.raises(ValueError, match="deletion vectors"):
        w.attach_partition("src", "dst", dates[0])
    # compaction materializes the mask; attach works again
    w.compact("src")
    assert w.attach_partition("src", "dst", dates[0]) > 0
    got = w.read("dst").filter("event_type = 'error'").count()
    assert got == 0
