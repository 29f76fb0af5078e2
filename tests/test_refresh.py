"""Refreshable materialized views (plans/refresh.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dev_clickhouse_spark.plans.refresh import RefreshableViews
from dev_clickhouse_spark.plans.warehouse import Warehouse


@pytest.fixture
def rig(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 5.0)],
        "id long, grp string, v double",
    )
    wh.save_schema_override("src", src.schema)
    wh.overwrite("src", src)
    return wh, RefreshableViews(spark, wh)


def _rollup(wh):
    def build(spark):
        return (
            wh.read("src").groupBy("grp")
            .agg(F.sum("v").alias("total"))
        )
    return build


def test_populate_and_scheduled_refresh(spark, rig):
    wh, rv = rig
    rv.create("mv_rollup", _rollup(wh), refresh_every_sec=3600)
    got = {r.grp: r.total for r in wh.read("mv_rollup").collect()}
    assert got == {"a": 15.0, "b": 20.0}

    # source mutates; nothing due inside the interval
    wh.overwrite("src", spark.createDataFrame(
        [(1, "a", 100.0)], "id long, grp string, v double"
    ))
    assert rv.run_pending() == []
    assert {r.grp: r.total for r in wh.read("mv_rollup").collect()} == {
        "a": 15.0, "b": 20.0,
    }
    # past the interval the tick refreshes and the rollup catches up
    [s] = [v for v in rv.view_refreshes() if v["view"] == "mv_rollup"]
    assert rv.run_pending(now=s["last_refresh_time"] + 3601) == ["mv_rollup"]
    assert {r.grp: r.total for r in wh.read("mv_rollup").collect()} == {
        "a": 100.0,
    }


def test_system_refresh_view_and_status(spark, rig):
    wh, rv = rig
    rv.create("mv", _rollup(wh), refresh_every_sec=3600)
    [row] = rv.view_refreshes()
    assert row["status"] == "ok" and row["refresh_count"] == 1
    assert row["next_refresh_time"] == row["last_refresh_time"] + 3600
    rv.refresh("mv")  # SYSTEM REFRESH VIEW — out of schedule
    [row] = rv.view_refreshes()
    assert row["refresh_count"] == 2


def test_error_is_recorded_not_raised(spark, rig):
    wh, rv = rig

    def broken(spark):
        return wh.read("src").selectExpr("no_such_column")

    rv.create("mv_bad", broken, refresh_every_sec=1)
    [row] = [v for v in rv.view_refreshes() if v["view"] == "mv_bad"]
    assert row["status"] == "error"
    assert row["exception"]


def test_depends_on_chains_within_one_tick(spark, rig):
    wh, rv = rig
    rv.create("mv_base", _rollup(wh), refresh_every_sec=3600)

    def second_level(spark):
        return (
            wh.read("mv_base").groupBy()
            .agg(F.sum("total").alias("grand"))
        )

    rv.create(
        "mv_grand", second_level, refresh_every_sec=10**9,
        depends_on=["mv_base"],
    )
    assert wh.read("mv_grand").collect()[0]["grand"] == 35.0

    wh.overwrite("src", spark.createDataFrame(
        [(9, "z", 7.0)], "id long, grp string, v double"
    ))
    # base becomes due; the dependent re-runs in the SAME tick even though
    # its own (enormous) interval is nowhere near due
    [base] = [v for v in rv.view_refreshes() if v["view"] == "mv_base"]
    order = rv.run_pending(now=base["last_refresh_time"] + 3601)
    assert order == ["mv_base", "mv_grand"]
    assert wh.read("mv_grand").collect()[0]["grand"] == 7.0

    # unknown dependency refused at create
    with pytest.raises(ValueError, match="DEPENDS ON"):
        rv.create("mv_x", _rollup(wh), 1, depends_on=["nope"])


def test_refreshable_mv_ticks_through_runner(spark, tmp_path):
    """Refreshable MVs ride the scheduled pipeline path (VERDICT r10 #5):
    views registered on ``PipelineRunner.refreshable_views()`` are ticked
    by ``run_latest`` after each gold refresh, so an upstream lightweight
    DELETE is reflected in the rollup MV after the NEXT tick — the CH use
    case for ``REFRESH EVERY`` (incremental insert-time state would go
    stale under mutations)."""
    import datetime as dt

    from test_siem import raw_df, wazuh_payload

    from dev_clickhouse_spark.plans import PipelineRunner
    from dev_clickhouse_spark.sources.json_events import extract_wazuh

    runner = PipelineRunner(spark, str(tmp_path / "wh"), max_active_tasks=4)
    typed = extract_wazuh(raw_df(spark, [
        wazuh_payload("w1", "10.1.0.1", "2026-01-08T09:10:00.000Z"),
        wazuh_payload("w2", "10.1.0.1", "2026-01-08T09:20:00.000Z"),
        wazuh_payload("w3", "10.1.0.1", "2026-01-08T09:25:00.000Z"),
    ]))
    # manifest layout (batch_id) so the lightweight DELETE has a DV target
    runner.wh.append("wazuh_events_raw", typed, batch_id=0)
    wh = runner.wh

    def build(_spark):
        return (
            wh.read("wazuh_events_raw").groupBy("agent_name")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    rv = runner.refreshable_views()
    rv.create("mv_agent_counts", build, refresh_every_sec=0)
    assert {r.agent_name: r.n_events
            for r in wh.read("mv_agent_counts").collect()} == {"agent7": 3}

    # upstream lightweight DELETE: the MV is stale until a tick runs
    wh.delete_where_lightweight("wazuh_events_raw", "event_id = 'w1'")
    assert {r.n_events
            for r in wh.read("mv_agent_counts").collect()} == {3}
    # the next scheduled tick (gold refresh) also converges the MV
    runner.run_latest(
        window_minutes=60, now=dt.datetime(2026, 1, 8, 10, 0), monitor=False,
    )
    assert {r.agent_name: r.n_events
            for r in wh.read("mv_agent_counts").collect()} == {"agent7": 2}
    [row] = [v for v in rv.view_refreshes() if v["view"] == "mv_agent_counts"]
    assert row["status"] == "ok" and row["refresh_count"] == 2
