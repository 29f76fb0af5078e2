from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dev_clickhouse_spark.operators.skew import salted_join
from dev_clickhouse_spark.plans.spec import PIPELINES, load_pipelines_yml, topo_sorted_waves
from dev_clickhouse_spark.streaming.stateful import sessionize


def test_sessionize_streaming(spark, tmp_path):
    # events for one user with a >30min gap between two bursts; second user
    # keeps one session open
    rows = [
        (1, dt.datetime(2026, 1, 8, 9, 0)),
        (1, dt.datetime(2026, 1, 8, 9, 10)),
        (1, dt.datetime(2026, 1, 8, 10, 0)),   # 50min gap → closes session 1
        (1, dt.datetime(2026, 1, 8, 10, 5)),
        (2, dt.datetime(2026, 1, 8, 9, 30)),
    ]
    src = tmp_path / "events"
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(str(src))
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(str(src))
    sessions = sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out").collect()
    # the gap-closed session is emitted; open sessions stay in state
    assert len(got) == 1
    s = got[0]
    assert s.user_id == 1 and s.closed_by == "gap"
    assert s.session_start == dt.datetime(2026, 1, 8, 9, 0)
    assert s.session_end == dt.datetime(2026, 1, 8, 9, 10)
    assert s.n_events == 2


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k int, v int"
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (4, "d")], "k int, name string")
    plain = left.join(right, "k", "left").groupBy("name").count()
    salted = salted_join(left, right, "k", how="left").groupBy("name").count()
    assert {(r.name, r["count"]) for r in plain.collect()} == {
        (r.name, r["count"]) for r in salted.collect()
    }
    inner_plain = left.join(right, "k").count()
    inner_salted = salted_join(left, right, "k").count()
    assert inner_plain == inner_salted


def test_pipelines_yml_matches_builtin():
    dag, specs = load_pipelines_yml()
    assert dag["max_active_tasks"] == 8
    by_id = {s.pipeline_id: s for s in specs}
    builtin = {s.pipeline_id: s for s in PIPELINES}
    assert set(by_id) == set(builtin)
    for pid, s in by_id.items():
        assert s.depends_on == builtin[pid].depends_on
        assert s.mode == builtin[pid].mode
    # yml-loaded specs topo-sort identically
    waves = topo_sorted_waves(specs)
    assert sum(len(w) for w in waves) == len(specs)
