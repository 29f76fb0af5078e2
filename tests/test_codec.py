"""Warehouse compression codec: every write path honors codec="zstd"."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dev_clickhouse_spark.io import load_table
from dev_clickhouse_spark.plans.warehouse import Warehouse

SF = "/root/testdata/sf0.001"


def _suffixes(root):
    out = set()
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("."):
                out.add(f.rsplit(".", 2)[-2])  # codec token before .parquet
    return out


def test_zstd_codec_on_every_write_path(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"), codec="zstd")
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    w.append("ev", ev.filter(F.col("event_id") % 2 == 0), batch_id=0)
    w.append("ev", ev.filter(F.col("event_id") % 2 == 1), batch_id=1)
    w.update_where_lightweight(
        "ev", {"value": "value * 2"}, "event_type = 'purchase'"
    )
    w.delete_where_lightweight("ev", "event_type = 'error'")
    n = w.read("ev").count()
    w.compact("ev")
    assert w.read("ev").count() == n
    assert _suffixes(w.path("ev")) == {"zstd"}
    # default warehouse stays on the session default (snappy)
    w2 = Warehouse(spark, str(tmp_path / "wh2"))
    w2.append("ev", ev.limit(10), batch_id=0)
    assert _suffixes(w2.path("ev")) == {"snappy"}
