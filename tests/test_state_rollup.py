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
