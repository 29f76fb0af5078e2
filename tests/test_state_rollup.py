"""Mergeable-state rollups (AggregatingMergeTree -State/-Merge analog):
persistence through the Warehouse, incremental refresh, lossless HLL merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.io import load_table
from dev_clickhouse_spark.plans.warehouse import Warehouse
from dev_clickhouse_spark.queries.state_rollup import (
    daily_user_states,
    merge_user_states,
)

SF = "/root/testdata/sf0.001"


def test_incremental_state_refresh_matches_single_pass(spark, tmp_path):
    """Append per-day states in TWO refreshes (each scanning only its half
    of the dates — the incremental contract), then merge the persisted
    state table: counts/sums must equal a direct aggregation exactly, and
    the HLL estimate must be IDENTICAL to a single-pass sketch over all
    rows — register union is lossless, so pre-aggregation costs nothing in
    accuracy."""
    ev = load_table(spark, SF, "events")
    dates = sorted(
        r.d for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(dates) >= 2
    cut = dates[len(dates) // 2]

    wh = Warehouse(spark, str(tmp_path / "wh"))
    old = ev.filter(F.to_date("ts") < F.lit(cut))
    new = ev.filter(F.to_date("ts") >= F.lit(cut))
    wh.append("rollup_user_state", daily_user_states(old), batch_id=0)
    wh.append("rollup_user_state", daily_user_states(new), batch_id=1)

    states = wh.read("rollup_user_state")
    n_days = ev.select(F.to_date("ts")).distinct().count()
    n_types = ev.select("event_type").distinct().count()
    assert states.count() <= n_days * n_types

    merged = {
        r.event_type: r for r in merge_user_states(states).collect()
    }
    direct = {
        r.event_type: r
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id")
            ).alias("approx_users"),
        ).collect()
    }
    assert set(merged) == set(direct)
    for t in direct:
        assert merged[t].n_events == direct[t].n_events
        assert abs(merged[t].sum_value - direct[t].sum_value) < 1e-6
        # lossless merge: estimates agree exactly, not just approximately
        assert merged[t].approx_users == direct[t].approx_users


def test_state_refresh_is_idempotent_and_compactable(spark, tmp_path):
    """A replayed refresh batch must not double states (manifest ledger),
    and compaction must preserve the merged result byte-for-byte."""
    ev = load_table(spark, SF, "events")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append("rollup_user_state", daily_user_states(ev), batch_id=7)
    before = {
        r.event_type: r.n_events
        for r in merge_user_states(wh.read("rollup_user_state")).collect()
    }
    wh.append("rollup_user_state", daily_user_states(ev), batch_id=7)  # replay
    wh.compact("rollup_user_state")
    after = {
        r.event_type: r.n_events
        for r in merge_user_states(wh.read("rollup_user_state")).collect()
    }
    assert before == after


def test_streaming_state_mv_matches_batch_recompute(spark, tmp_path):
    """AggregatingMergeTree MV analog: two parquet micro-batches stream
    through foreachBatch into per-day state rows; the -Merge read must
    equal a batch recompute over all rows (exact n/sum, identical HLL
    estimate), and a replayed batch must not double the states."""
    import datetime as dt

    from dev_clickhouse_spark.streaming import StateRollupMV
    from dev_clickhouse_spark.streaming.state_mv import EVENTS_STREAM

    def rows(day, base_id, users):
        return [
            (base_id + i, dt.datetime(2026, 1, day, 9, i % 60), u,
             ["view", "click"][i % 2], float(10 + i), "{}")
            for i, u in enumerate(users)
        ]

    inp = tmp_path / "in"
    b0 = rows(5, 0, [1, 2, 3, 1, 2, 4])
    b1 = rows(6, 100, [2, 5, 6, 1])
    mv = StateRollupMV(spark, str(tmp_path / "wh"), str(tmp_path / "ck"))
    spark.createDataFrame(b0, EVENTS_STREAM).coalesce(1).write.mode(
        "append").parquet(str(inp))
    mv.from_files(str(inp)).awaitTermination(180)
    spark.createDataFrame(b1, EVENTS_STREAM).coalesce(1).write.mode(
        "append").parquet(str(inp))
    mv.from_files(str(inp)).awaitTermination(180)

    merged = {r.event_type: r for r in mv.merged().collect()}
    both = spark.createDataFrame(b0 + b1, EVENTS_STREAM)
    direct = {
        r.event_type: r
        for r in both.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id")
            ).alias("approx_users"),
        ).collect()
    }
    assert set(merged) == set(direct)
    for t in direct:
        assert merged[t].n_events == direct[t].n_events
        assert abs(merged[t].sum_value - direct[t].sum_value) < 1e-9
        assert merged[t].approx_users == direct[t].approx_users

    # replay convergence: re-running an already-committed batch id is a no-op
    before = mv.wh.read("mv_user_state").count()
    mv._process_batch(spark.createDataFrame(b1, EVENTS_STREAM), 1)
    assert mv.wh.read("mv_user_state").count() == before


def test_quantile_bf16_error_contract_and_mergeability(spark):
    """The bf16 bucket quantile must sit within 2^-7 relative error of the
    exact quantile (plus the half-cent quantization), and the state must
    be truly mergeable: bucket counts summed across day-states equal a
    single-pass bucketing of all rows (same bucket ids, same counts)."""
    import duckdb

    from dev_clickhouse_spark.queries.state_rollup import (
        rollup_state_quantile_bf16,
    )

    sf = "/root/testdata/sf0.01"
    got = {
        r["event_type"]: (r["n_events"], r["p50_bf16"], r["p90_bf16"])
        for r in rollup_state_quantile_bf16(spark, sf).collect()
    }
    exact = duckdb.sql(
        f"""SELECT event_type,
                   quantile_disc("value", 0.5), quantile_disc("value", 0.9)
            FROM '{sf}/events.parquet' GROUP BY event_type"""
    ).fetchall()
    for et, q50, q90 in exact:
        n, p50, p90 = got[et]
        # bucket representative underestimates by < 1/128 relative; the
        # discrete-rank conventions differ by at most one sample, so allow
        # 2x the mantissa step
        assert abs(p50 - q50) / q50 < 2 / 128, (et, p50, q50)
        assert abs(p90 - q90) / q90 < 2 / 128, (et, p90, q90)

    # mergeability: single-pass bucket counts == day-merged bucket counts
    one = duckdb.sql(
        f"""WITH q AS (SELECT CAST(floor("value"*100+0.5) AS BIGINT) AS c
                       FROM '{sf}/events.parquet')
            SELECT length(bin(c))-1 AS e,
                   CAST(floor(c*128.0/power(2, length(bin(c))-1)) AS BIGINT) AS m,
                   count(*) FROM q GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    two = duckdb.sql(
        f"""WITH q AS (SELECT CAST(ts AS DATE) AS d,
                              CAST(floor("value"*100+0.5) AS BIGINT) AS c
                       FROM '{sf}/events.parquet'),
            day_states AS (
              SELECT d, length(bin(c))-1 AS e,
                     CAST(floor(c*128.0/power(2, length(bin(c))-1)) AS BIGINT) AS m,
                     count(*) AS cnt
              FROM q GROUP BY 1, 2, 3)
            SELECT e, m, sum(cnt) FROM day_states GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    assert [(e, m, int(c)) for e, m, c in one] == [
        (e, m, int(c)) for e, m, c in two
    ]
