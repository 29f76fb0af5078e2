"""BACKUP TABLE / RESTORE TABLE: consistent snapshot with overlay remap."""

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
    for b in range(2):
        w.append("ev", ev.filter(F.col("event_id") % 2 == b), batch_id=b)
    # overlays that must survive the round-trip with remapped addresses
    w.delete_where_lightweight("ev", "event_type = 'error'")
    w.update_where_lightweight(
        "ev", {"event_type": F.lit("tap")}, "event_type = 'click'"
    )
    return w


def _snapshot(w, table):
    return sorted(map(tuple, w.read(table).collect()))


def test_backup_restore_roundtrip_with_overlays(spark, wh, tmp_path):
    at_backup = _snapshot(wh, "ev")
    r = wh.backup_table("ev", str(tmp_path / "bak"))
    assert r["files"] > 0 and r["members"] == 2
    # mutate the source AFTER the backup — the snapshot must not follow
    wh.delete_where_lightweight("ev", "event_type = 'tap'")
    wh.compact("ev")
    rr = wh.restore_table(str(tmp_path / "bak"), "ev_restored")
    assert rr["members"] == 2
    got = _snapshot(wh, "ev_restored")
    assert got == at_backup
    # deleted/patched state specifically: no errors, clicks renamed
    restored = wh.read("ev_restored")
    assert restored.filter("event_type = 'error'").count() == 0
    assert restored.filter("event_type = 'click'").count() == 0
    assert restored.filter("event_type = 'tap'").count() > 0


def test_restore_into_other_warehouse(spark, wh, tmp_path):
    at_backup = _snapshot(wh, "ev")
    wh.backup_table("ev", str(tmp_path / "bak2"))
    other = Warehouse(spark, str(tmp_path / "wh2"))
    other.restore_table(str(tmp_path / "bak2"), "ev")
    assert _snapshot(other, "ev") == at_backup
    # the restored copy is independently mutable
    other.delete_where_lightweight("ev", "event_type = 'tap'")
    assert other.read("ev").filter("event_type = 'tap'").count() == 0
    assert wh.read("ev").filter("event_type = 'tap'").count() > 0


def test_restore_refuses_existing_table(spark, wh, tmp_path):
    wh.backup_table("ev", str(tmp_path / "bak3"))
    with pytest.raises(ValueError, match="already exists"):
        wh.restore_table(str(tmp_path / "bak3"), "ev")
    with pytest.raises(ValueError, match="not empty"):
        wh.backup_table("ev", str(tmp_path / "bak3"))
