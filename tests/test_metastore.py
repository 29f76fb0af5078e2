"""DB-backed metadata control plane (reference metadata.gold_dags /
metadata.gold_pipelines, postgres/init/10_metadata.sql:3-34; loader
gold_pipeline.py:323-371): seed, reload, operator edits at runtime, and the
YAML snapshot fallback — over embedded Derby, the same stand-in the S6
federated-scan tests use."""

from __future__ import annotations

import datetime as dt
import os

from dev_clickhouse_spark.plans import (
    PIPELINES,
    MetadataStore,
    PipelineRunner,
    load_pipeline_specs,
    topo_sorted_waves,
)


def _url(tmp_path, name="meta"):
    return f"jdbc:derby:{os.path.join(str(tmp_path), name)};create=true"


def test_seed_and_load_roundtrip(spark, tmp_path):
    """Seeding the store from the in-code snapshot and loading it back must
    reproduce the catalog exactly — ids, targets, modes, windows, dependency
    edges, and the (pipeline_order, pipeline_name) ordering."""
    store = MetadataStore(spark, _url(tmp_path))
    store.seed()
    dag, specs = store.load()
    assert dag["max_active_tasks"] == 8
    assert dag["default_window_minutes"] == 10
    assert specs == PIPELINES  # frozen dataclasses: full equality
    # and the runner topology derived from the store matches the static one
    assert [
        [s.pipeline_id for s in w] for w in topo_sorted_waves(specs)
    ] == [[s.pipeline_id for s in w] for w in topo_sorted_waves(PIPELINES)]


def test_operator_edits_apply_at_runtime(spark, tmp_path):
    """The reference contract: an operator disables a pipeline or changes its
    window by UPDATEing the store — the next load sees it, no code change."""
    url = _url(tmp_path)
    store = MetadataStore(spark, url)
    store.seed()

    store.set_enabled("bridge_zeek_event_tag", False)
    store.set_window("fact_wazuh_events", 30)
    _dag, specs = store.load()
    by_id = {s.pipeline_id: s for s in specs}
    assert "bridge_zeek_event_tag" not in by_id
    assert by_id["fact_wazuh_events"].window_minutes == 30
    # everything else untouched
    assert len(specs) == len(PIPELINES) - 1

    # re-enable → full catalog again
    store.set_enabled("bridge_zeek_event_tag", True)
    _dag, specs = store.load()
    assert len(specs) == len(PIPELINES)


def test_runner_from_store_skips_disabled_pipeline(spark, tmp_path):
    """End-to-end: a runner built from the store runs exactly the enabled
    set.  Disabling a fact in the store removes it (and nothing else) from
    the next run — the reference's enabled flag honored at orchestration
    time (gold_pipeline.py:420-427 skips disabled rows)."""
    from test_siem import wazuh_payload
    from pyspark.sql import functions as F

    url = _url(tmp_path)
    store = MetadataStore(spark, url)
    store.seed()
    store.set_enabled("fact_wazuh_events", False)
    store.set_enabled("bridge_wazuh_event_tag", False)  # depends on the fact

    runner = PipelineRunner.from_store(spark, str(tmp_path / "wh"), url)
    raw = spark.createDataFrame(
        [(str(__import__("json").dumps(
            wazuh_payload("m1", "10.0.0.1", "2026-01-08T09:10:00.000Z"))),)],
        "raw string",
    )
    runner.ingest_raw(raw)
    metrics = runner.run_window(
        dt.datetime(2026, 1, 8, 9, 0), dt.datetime(2026, 1, 8, 10, 0)
    )
    ran = {m["pipeline_id"] for m in metrics}
    assert "fact_wazuh_events" not in ran
    assert "bridge_wazuh_event_tag" not in ran
    assert "dim_agent_scd2" in ran and "fact_zeek_events" in ran
    assert not runner.wh.exists("fact_wazuh_events")
    # dims still built from the window
    assert runner.wh.read("dim_agent").filter(F.col("is_current") == 1).count() >= 1


def test_yaml_fallback_when_store_unreachable(spark, tmp_path):
    """load_pipeline_specs degrades to the YAML snapshot when the store is
    absent/unreachable — the reference's two-tier load
    (postgres configs `or` file configs, gold_pipeline.py:498-507)."""
    import warnings as _w

    import pytest

    bad_url = f"jdbc:derby:{os.path.join(str(tmp_path), 'nope')}"  # no ;create
    # a BROKEN store must fall back LOUDLY — silent fallback would make
    # operator edits appear to work while the runner serves the snapshot
    with pytest.warns(RuntimeWarning, match="falling back to the YAML"):
        dag, specs = load_pipeline_specs(spark, bad_url)
    assert {s.pipeline_id for s in specs} == {s.pipeline_id for s in PIPELINES}
    assert dag["max_active_tasks"] == 8
    # …while url=None (store intentionally absent) is silent
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)  # only the fallback class
        _dag2, specs2 = load_pipeline_specs(spark, None)
    assert specs2 == specs


def test_seed_from_yaml_migration(spark, tmp_path):
    """File → DB migration: seeding from the YAML snapshot then loading from
    the store yields the same catalog as reading the YAML directly."""
    from dev_clickhouse_spark.plans.spec import load_pipelines_yml

    store = MetadataStore(spark, _url(tmp_path, "meta2"))
    store.seed_from_yaml()
    _dag, specs = store.load()
    _ycfg, yspecs = load_pipelines_yml()
    assert specs == yspecs


def test_streaming_picks_up_metadata_edits(spark, tmp_path):
    """A RUNNING continuous pipeline re-reads the metadata store on its
    reload interval: disabling a fact in the store stops the stream
    refreshing it — no restart, no code change (the streaming analog of the
    reference DAG generator re-parsing metadata.gold_pipelines)."""
    import json as _json

    from test_siem import wazuh_payload
    from dev_clickhouse_spark.streaming import ContinuousPipeline

    url = _url(tmp_path, "meta_stream")
    store = MetadataStore(spark, url)
    store.seed()

    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "b1.jsonl").write_text(
        _json.dumps(wazuh_payload("sw1", "10.3.0.1", "2026-01-08T09:10:00.000Z"))
        + "\n"
    )
    cp = ContinuousPipeline(
        spark, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
        metadata_url=url, metadata_reload_batches=1,
    )
    cp.from_files(str(inp)).awaitTermination(180)
    n1 = cp.wh.read("fact_wazuh_events").count()
    assert n1 == 1

    # operator edit while the pipeline keeps running off the same checkpoint
    store.set_enabled("fact_wazuh_events", False)
    store.set_enabled("bridge_wazuh_event_tag", False)
    (inp / "b2.jsonl").write_text(
        _json.dumps(wazuh_payload("sw2", "10.3.0.2", "2026-01-08T09:20:00.000Z"))
        + "\n"
    )
    cp.from_files(str(inp)).awaitTermination(180)
    # bronze still ingests; the disabled fact stopped refreshing
    assert cp.wh.read("wazuh_events_raw").count() == 2
    assert cp.wh.read("fact_wazuh_events").count() == n1
    # dims kept flowing
    assert cp.wh.read("dim_agent").count() >= 2


def test_set_window_drives_pipeline_trailing_window(spark, tmp_path):
    """set_window must change BEHAVIOR, not just the stored row: on the
    scheduled tick each pipeline reads its own [now - window_minutes, now)
    trailing window (reference per-pipeline window override,
    gold_pipelines.yml:11).  dim_tag widened to 120 min picks up an event
    the default 10-min pipelines ignore."""
    import json as _json

    from test_siem import suricata_payload

    url = _url(tmp_path, "meta_win")
    store = MetadataStore(spark, url)
    store.seed()
    store.set_window("dim_tag", 120)

    runner = PipelineRunner.from_store(spark, str(tmp_path / "wh"), url)
    raw = spark.createDataFrame(
        [
            (_json.dumps(suricata_payload(
                "old1", ts="2026-01-08T09:00:00.000Z", tags=["old_only"])),),
            (_json.dumps(suricata_payload(
                "new1", ts="2026-01-08T09:55:00.000Z", tags=["new_tag"])),),
        ],
        "raw string",
    )
    runner.ingest_raw(raw)
    metrics = runner.run_latest(
        window_minutes=10, now=dt.datetime(2026, 1, 8, 10, 0), monitor=False
    )

    tags = {r.tag_value for r in runner.wh.read("dim_tag").collect()}
    assert {"old_only", "new_tag"} <= tags  # 120-min window saw both
    facts = {r.event_id for r in
             runner.wh.read("fact_suricata_events").collect()}
    assert facts == {"new1"}  # default 10-min window saw only the new event
    # the per-pipeline window is visible in the run metrics
    by_id = {m["pipeline_id"]: m for m in metrics}
    assert by_id["dim_tag"]["start_ts"].startswith("2026-01-08 08:00")
    assert by_id["fact_suricata_events"]["start_ts"].startswith(
        "2026-01-08 09:50"
    )


def test_operator_edit_on_unknown_pipeline_raises(spark, tmp_path):
    """A typo'd pipeline name (or wrong dag) must raise, not silently no-op
    while the CLI prints success — the exact operator-confusion failure the
    store's fallback warning exists to prevent."""
    import pytest as _pytest

    store = MetadataStore(spark, _url(tmp_path, "meta_typo"))
    store.seed()
    with _pytest.raises(LookupError, match="fact_wazuh_eventz"):
        store.set_enabled("fact_wazuh_eventz", False)
    with _pytest.raises(LookupError, match="no_such_dag"):
        store.set_window("fact_wazuh_events", 30, dag_name="no_such_dag")
    # catalog untouched
    _dag, specs = store.load()
    assert specs == PIPELINES


def test_stream_reload_keeps_last_good_on_store_outage(spark, tmp_path):
    """A transient store outage during a RUNNING stream's periodic reload
    must keep the last-good catalog — falling back to the YAML snapshot
    would silently revert operator edits (e.g. re-enable a disabled
    pipeline) mid-run."""
    import warnings as _warnings

    import pytest as _pytest

    from dev_clickhouse_spark.streaming import ContinuousPipeline

    url = _url(tmp_path, "meta_outage")
    store = MetadataStore(spark, url)
    store.seed()
    store.set_enabled("bridge_zeek_event_tag", False)

    cp = ContinuousPipeline(
        spark, str(tmp_path / "wh"), str(tmp_path / "ckpt"), metadata_url=url,
    )
    edited = [s.pipeline_id for s in cp.runner.pipelines]
    assert "bridge_zeek_event_tag" not in edited

    # simulate the outage: periodic reloads now hit an unusable store
    cp.metadata_url = f"jdbc:derby:{os.path.join(str(tmp_path), 'gone')}"
    with _pytest.warns(RuntimeWarning, match="keeping the last-good"):
        cp._reload_pipelines()
    assert [s.pipeline_id for s in cp.runner.pipelines] == edited

    # initial construction against a dead store still comes up (YAML
    # fallback is reserved for that path), warning loudly
    with _pytest.warns(RuntimeWarning, match="falling back"):
        cp2 = ContinuousPipeline(
            spark, str(tmp_path / "wh2"), str(tmp_path / "ckpt2"),
            metadata_url=cp.metadata_url,
        )
    assert len(cp2.runner.pipelines) == len(PIPELINES)
