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


def test_monitoring_tables_persisted_e2e(spark, tmp_path):
    """End-to-end: ingest → gold refresh with monitor=True → the reference's
    monitoring family (lag/volume/drift/alerts) exists with rows
    (postgres/init/04_monitoring_tables.sql:11-46)."""
    from dev_clickhouse_spark.plans import PipelineRunner
    from dev_clickhouse_spark.quality.monitor import Monitor
    from tests.test_siem import raw_df, suricata_payload, wazuh_payload, zeek_payload

    runner = PipelineRunner(spark, str(tmp_path / "wh"), max_active_tasks=4)
    runner.ingest_raw(raw_df(spark, [
        suricata_payload(), wazuh_payload(), zeek_payload(),
    ]), collect_counts=False)

    start = dt.datetime(2026, 1, 8, 9, 20)
    end = dt.datetime(2026, 1, 8, 9, 40)
    runner.run_window(start, end)
    obs = runner.monitor_tick(start, end)
    assert {o["pipeline_id"] for o in obs} == {
        "suricata_events_raw", "wazuh_events_raw", "zeek_events_raw",
    }

    mon = Monitor(spark, str(tmp_path / "wh"))
    lag = mon.read("lag_metrics").collect()
    assert len(lag) == 3
    # events at 09:28:36, observed at end=09:40 → lag ≈ 684s, all positive
    assert all(0 < r.lag_seconds < 3600 for r in lag)
    vol = mon.read("volume_metrics").collect()
    assert len(vol) == 3 and all(r.event_count == 1 and r.status == "ok" for r in vol)
    # healthy run: no drift rows, no alerts
    assert mon.read("schema_drift").count() == 0
    assert mon.read("alerts").count() == 0


def test_monitoring_detects_drift_lag_and_volume(spark, tmp_path):
    from dev_clickhouse_spark.quality.monitor import Monitor

    mon = Monitor(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0), "x")],
        "event_id long, event_ts timestamp, surprise string",
    )
    out = mon.observe(
        "p1", df,
        ts_col="event_ts",
        expected_columns={"event_id": "string", "event_ts": "timestamp"},
        min_rows=5,
        freshness_threshold_minutes=60,
        now=dt.datetime(2024, 1, 1, 2, 0),
    )
    assert out["volume_status"] == "low"
    assert out["drifted_columns"] == 2          # mistyped event_id + surprise
    assert out["alerts"] == 3                   # lag + volume + drift

    drift = {r.column_name: r.status for r in mon.read("schema_drift").collect()}
    assert drift == {"event_id": "type_mismatch", "surprise": "unexpected"}
    alerts = {r.alert_type: r.severity for r in mon.read("alerts").collect()}
    assert alerts == {"lag": "warning", "volume": "warning", "schema_drift": "critical"}
    lag_row = mon.read("lag_metrics").first()
    assert lag_row.lag_seconds == 7200.0

    # dq_results round-trip (gold.dq_results with jsonb details)
    from dev_clickhouse_spark.quality import check_volume
    results = [check_volume(df, 1, "t")]
    mon.record_dq_results("p1", results)
    dq = mon.read("dq_results").first()
    assert dq.status == "passed"
    import json as _json
    assert _json.loads(dq.results_json)[0]["rule"] == "volume"
