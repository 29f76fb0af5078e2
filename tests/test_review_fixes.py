"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from dev_clickhouse_spark.operators.range_join import binned_range_join, range_join
from dev_clickhouse_spark.operators.scd import scd2_apply
from dev_clickhouse_spark.plans.runner import PipelineRunner
from dev_clickhouse_spark.streaming import BronzeStream
from dev_clickhouse_spark.streaming.stateful import sessionize
from test_siem import suricata_payload, wazuh_payload


def test_binned_range_join_open_intervals(spark):
    """NULL right_end must behave as an open interval, like range_join."""
    left = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1, 0, 1, 40))], "row_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, dt.datetime(2026, 1, 1, 0, 0), None),
         (11, dt.datetime(2026, 1, 2, 0, 0), None)],   # opens after the probe
        "iv_id int, start timestamp, end timestamp",
    )
    plain = {(r.row_id, r.iv_id)
             for r in range_join(left, right, "ts", "start", "end").collect()}
    binned = {(r.row_id, r.iv_id)
              for r in binned_range_join(left, right, "ts", "start", "end",
                                         bin_seconds=300).collect()}
    assert plain == binned == {(1, 10)}


def test_sessionize_out_of_order_across_batches(spark, tmp_path):
    """A late event inside the open session must not regress `last` and
    fabricate a gap close with end < start."""
    import time

    rows1 = [(1, dt.datetime(2026, 1, 8, 10, 0))]
    rows2 = [(1, dt.datetime(2026, 1, 8, 9, 50)),    # late, within gap of start
             (1, dt.datetime(2026, 1, 8, 10, 25))]   # 25min after 10:00 → same session
    src = tmp_path / "events"
    schema = "user_id long, ts timestamp"
    # two files, oldest first + maxFilesPerTrigger=1 → two micro-batches in
    # one query: batch 1 sees only 10:00, batch 2 delivers 9:50 late
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "f1"))
    time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    sessions = sessionize(stream, gap_minutes=30)
    q = (sessions.writeStream.format("memory").queryName("ooo_sessions")
         .outputMode("append").option("checkpointLocation", str(tmp_path / "c1"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ooo_sessions").collect()
    # no gap close may be emitted: all three events belong to one open session
    assert got == [], [tuple(r) for r in got]


def test_scd2_replay_at_effective_from_no_dup_key(spark):
    """A replayed row at exactly the current version's effective_from must not
    mint a second version with the same surrogate key."""
    t0 = dt.datetime(2026, 1, 1, 9, 0)
    src1 = spark.createDataFrame(
        [("a1", t0, "ip1")], "agent_name string, ets timestamp, agent_ip string"
    )
    dim = scd2_apply(None, src1, F.col("agent_name"), ["agent_ip"], "ets", "agent_key")
    # replay at the same instant with a different attribute
    src2 = spark.createDataFrame(
        [("a1", t0, "ip2")], "agent_name string, ets timestamp, agent_ip string"
    )
    dim2 = scd2_apply(dim, src2, F.col("agent_name"), ["agent_ip"], "ets", "agent_key")
    rows = dim2.collect()
    assert len(rows) == 1 and rows[0].is_current == 1
    keys = [r.agent_key for r in rows]
    assert len(keys) == len(set(keys))
    # a genuinely later change still opens a version with a distinct key
    t1 = dt.datetime(2026, 1, 1, 10, 0)
    src3 = spark.createDataFrame(
        [("a1", t1, "ip2")], "agent_name string, ets timestamp, agent_ip string"
    )
    dim3 = scd2_apply(dim2, src3, F.col("agent_name"), ["agent_ip"], "ets", "agent_key")
    assert dim3.count() == 2
    assert dim3.select("agent_key").distinct().count() == 2


def test_unrouted_count_multi_route_doc(spark, tmp_path):
    """A doc matching two routes lands in both streams but counts as routed
    once; n_unrouted never goes negative."""
    both = suricata_payload("both1")
    both["zeek"] = {"uid": "Z1"}   # matches suricata AND zeek routes
    payloads = [both, {"no": "route"}]
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "b.jsonl").write_text("\n".join(json.dumps(p) for p in payloads))
    bs = BronzeStream(spark, str(tmp_path / "wh"), str(tmp_path / "ckpt"))
    bs.from_files(str(inp)).awaitTermination(120)
    m = spark.read.parquet(str(tmp_path / "wh" / "ingest_metrics")).first()
    assert m.n_raw == 2
    assert m.n_suricata == 1 and m.n_zeek == 1
    assert m.n_unrouted == 1   # only the truly unroutable doc


def test_resolve_window_uses_utc(spark, tmp_path):
    runner = PipelineRunner(spark, str(tmp_path / "wh"))
    start, end = runner.resolve_window(10)
    utc_now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    assert abs((end - utc_now).total_seconds()) < 60
    assert (end - start) == dt.timedelta(minutes=10)
    # conf override wins (backfill path)
    s = dt.datetime(2026, 1, 1)
    e = dt.datetime(2026, 1, 2)
    assert runner.resolve_window(10, conf={"start_ts": s, "end_ts": e}) == (s, e)


def test_merge_upsert_rejects_multi_match_source(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from dev_clickhouse_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    dup_src = spark.createDataFrame([(1, 11.0), (1, 12.0)], "k long, v double")
    with pytest.raises(SparkRuntimeException, match="multiple rows"):
        merge_upsert(target, dup_src, keys=["k"]).collect()

    ok_src = spark.createDataFrame([(1, 11.0), (3, 30.0)], "k long, v double")
    out = {r.k: r.v for r in merge_upsert(target, ok_src, keys=["k"]).collect()}
    assert out == {1: 11.0, 2: 20.0, 3: 30.0}


def test_parse_ts_epoch_gating(spark):
    from dev_clickhouse_spark.functions.ch_compat import parse_ts_best_effort

    df = spark.createDataFrame(
        [("20260813",), ("1700000000",), ("1700000000123",), ("12345",),
         ("0",), ("999",), ("2024-01-02",)],
        "s string",
    ).select("s", parse_ts_best_effort("s").cast("string").alias("ts"))
    got = {r.s: r.ts for r in df.collect()}
    assert got["20260813"] == "2026-08-13 00:00:00"        # yyyyMMdd, not epoch
    assert got["1700000000"] == "2023-11-14 22:13:20"      # epoch seconds
    assert got["1700000000123"] == "2023-11-14 22:13:20.123"  # epoch millis
    assert got["12345"] is None                            # implausible digits
    assert got["0"] is None
    assert got["999"] is None
    assert got["2024-01-02"] == "2024-01-02 00:00:00"


def test_bronze_batch_replay_is_exactly_once(spark, tmp_path):
    import json

    from pyspark.sql import functions as F

    from dev_clickhouse_spark.streaming.bronze_stream import BronzeStream

    def payload(i):
        return json.dumps({
            "@timestamp": f"2024-01-01T00:00:{i:02d}Z",
            "event": {"hash": f"h{i}", "provider": "wazuh",
                      "dataset": "alerts", "kind": "alert", "module": "wazuh"},
            "agent": {"name": "a", "ip": "1.2.3.4"},
            "host": {"name": "h", "ip": "1.2.3.4"},
            "rule": {"id": "r", "level": 1, "name": "n", "ruleset": "rs"},
            "message": "m",
        })

    bs = BronzeStream(spark, str(tmp_path / "wh"), str(tmp_path / "ck"))
    batch = spark.createDataFrame([(payload(i),) for i in range(5)], "raw string")

    bs._process_batch(batch, batch_id=0)
    first = bs.wh.read("wazuh_events_raw").count()
    assert first == 5

    # replay the same micro-batch (failure-recovery path): no duplicates
    bs._process_batch(batch, batch_id=0)
    assert bs.wh.read("wazuh_events_raw").count() == 5
    m = spark.read.parquet(str(tmp_path / "wh" / "ingest_metrics"))
    assert m.count() == 1

    # a NEW batch still appends
    batch2 = spark.createDataFrame([(payload(9),)], "raw string")
    bs._process_batch(batch2, batch_id=1)
    assert bs.wh.read("wazuh_events_raw").count() == 6
    assert spark.read.parquet(str(tmp_path / "wh" / "ingest_metrics")).count() == 2
