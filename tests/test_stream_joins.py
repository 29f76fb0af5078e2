"""Stream-stream interval join + stream-static enrichment
(streaming/joins.py): result parity with the equivalent batch join, state
bounded by the watermark horizon via the event-time range condition."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dev_clickhouse_spark.streaming.joins import (
    enrich_with_static,
    interval_join_streams,
)

_ALERT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("alert_id", T.LongType()),
    T.StructField("alert_ts", T.TimestampType()),
])
_EVENT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("event_ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])

_T0 = dt.datetime(2026, 1, 1, 12, 0)


def _mins(m):
    return _T0 + dt.timedelta(minutes=m)


@pytest.fixture()
def sources(spark, tmp_path):
    alerts = spark.createDataFrame(
        [
            (1, 100, _mins(60)),   # events 30-60 min in window
            (2, 200, _mins(90)),   # no events for user 2 in window
            (3, 300, _mins(240)),  # event exactly at the boundary
        ],
        _ALERT_SCHEMA,
    )
    events = spark.createDataFrame(
        [
            (1, 1, _mins(30), 1.0),    # inside [0, 60]
            (1, 2, _mins(59), 2.0),    # inside
            (1, 3, _mins(61), 3.0),    # after the alert: excluded
            (2, 4, _mins(0), 4.0),     # 90 min before alert 200: excluded
            (3, 5, _mins(180), 5.0),   # exactly alert_ts - 1h: included
        ],
        _EVENT_SCHEMA,
    )
    a_dir, e_dir = str(tmp_path / "alerts"), str(tmp_path / "events")
    alerts.coalesce(1).write.parquet(a_dir)
    events.coalesce(1).write.parquet(e_dir)
    return a_dir, e_dir, alerts, events


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_interval_join_matches_batch(spark, sources, tmp_path):
    a_dir, e_dir, alerts, events = sources
    la = spark.readStream.schema(_ALERT_SCHEMA).parquet(a_dir)
    re_ = spark.readStream.schema(_EVENT_SCHEMA).parquet(e_dir)
    joined = interval_join_streams(
        la, re_, key="user_id", left_ts="alert_ts", right_ts="event_ts",
        lookback="1 hour",
    )
    got = {
        (r["alert_id"], r["event_id"])
        for r in _run(spark, joined, "ssj_inner").collect()
    }
    # batch equivalent of the same interval condition
    want = {
        (r["alert_id"], r["event_id"])
        for r in alerts.join(
            events,
            (alerts.user_id == events.user_id)
            & (events.event_ts >= alerts.alert_ts - F.expr("INTERVAL 1 HOUR"))
            & (events.event_ts <= alerts.alert_ts),
        ).collect()
    }
    assert got == want == {(100, 1), (100, 2), (300, 5)}


def test_interval_join_requires_supported_type(spark, sources):
    a_dir, e_dir, *_ = sources
    la = spark.readStream.schema(_ALERT_SCHEMA).parquet(a_dir)
    re_ = spark.readStream.schema(_EVENT_SCHEMA).parquet(e_dir)
    with pytest.raises(ValueError, match="unsupported"):
        interval_join_streams(
            la, re_, key="user_id", left_ts="alert_ts",
            right_ts="event_ts", join_type="fullOuter",
        )


def test_interval_join_disambiguates_overlap(spark, tmp_path):
    """Overlapping non-key columns on the right are r_-prefixed, so the
    joined stream has no ambiguous names."""
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    rows = [(1, _mins(10), 1.0), (1, _mins(11), 2.0)]
    d = str(tmp_path / "s")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    s1 = spark.readStream.schema(schema).parquet(d)
    s2 = spark.readStream.schema(schema).parquet(d)
    joined = interval_join_streams(
        s1, s2, key="user_id", left_ts="ts", right_ts="ts",
        lookback="5 minutes",
    )
    cols = joined.columns
    assert cols.count("user_id") == 1
    assert "r_ts" in cols and "r_value" in cols
    out = _run(spark, joined, "ssj_overlap")
    # self-join within 5 min: (10,10) (11,10) (11,11) pairs
    assert out.count() == 3


def test_enrich_with_static_picks_up_dim_refresh(spark, tmp_path):
    """The static side is re-planned per micro-batch: rows streamed after
    a dim overwrite join against the NEW dim rows."""
    e_dir = str(tmp_path / "ev")
    d_dir = str(tmp_path / "dim")
    dim_schema = "user_id long, segment string"
    spark.createDataFrame(
        [(1, "bronze"), (2, "silver")], dim_schema
    ).coalesce(1).write.parquet(d_dir)
    spark.createDataFrame(
        [(1, 1, _mins(1), 1.0)], _EVENT_SCHEMA
    ).coalesce(1).write.parquet(e_dir)

    stream = spark.readStream.schema(_EVENT_SCHEMA).parquet(e_dir)
    dim = spark.read.parquet(d_dir)
    enriched = enrich_with_static(stream, dim, key="user_id")
    out1 = _run(spark, enriched, "sse_1")
    assert out1.select("segment").first()[0] == "bronze"

    # refresh the dim and stream one more file through a NEW query
    spark.createDataFrame(
        [(1, "gold"), (2, "silver")], dim_schema
    ).coalesce(1).write.mode("overwrite").parquet(d_dir)
    spark.createDataFrame(
        [(1, 2, _mins(2), 2.0)], _EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(e_dir)
    stream2 = spark.readStream.schema(_EVENT_SCHEMA).parquet(e_dir)
    enriched2 = enrich_with_static(
        stream2, spark.read.parquet(d_dir), key="user_id"
    )
    out2 = _run(spark, enriched2, "sse_2")
    assert {r["segment"] for r in out2.collect()} == {"gold"}
