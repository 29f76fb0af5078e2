from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dev_clickhouse_spark.operators import (
    asof_join,
    exact_dedupe,
    replacing_dedupe,
    scd1_upsert,
    scd2_apply,
    scd2_from_history,
)


def ts(*args):
    return dt.datetime(*args)


# ---------------------------------------------------------------------------
# asof_join — mirrors fact_wazuh_events.sql:60-68 ASOF LEFT JOIN semantics
# ---------------------------------------------------------------------------

def test_asof_join_basic(spark):
    events = spark.createDataFrame(
        [
            ("a1", ts(2024, 1, 1, 10, 0)),   # before any version → NULL
            ("a1", ts(2024, 1, 1, 12, 0)),   # v1 in effect
            ("a1", ts(2024, 1, 2, 12, 0)),   # v2 in effect
            ("a2", ts(2024, 1, 1, 12, 0)),   # key with no versions → NULL
            ("a1", ts(2024, 1, 1, 11, 0)),   # tie with v1 effective_from → inclusive
        ],
        "agent string, ets timestamp",
    )
    dim = spark.createDataFrame(
        [
            ("a1", ts(2024, 1, 1, 11, 0), 101),
            ("a1", ts(2024, 1, 2, 0, 0), 102),
        ],
        "agent string, effective_from timestamp, agent_key int",
    )
    out = asof_join(events, dim, on="agent", left_ts="ets", right_ts="effective_from")
    got = {(r.agent, r.ets): r.agent_key for r in out.collect()}
    assert got[("a1", ts(2024, 1, 1, 10, 0))] is None
    assert got[("a1", ts(2024, 1, 1, 11, 0))] == 101  # inclusive >=
    assert got[("a1", ts(2024, 1, 1, 12, 0))] == 101
    assert got[("a1", ts(2024, 1, 2, 12, 0))] == 102
    assert got[("a2", ts(2024, 1, 1, 12, 0))] is None
    assert out.count() == events.count()  # left join: no row loss/dup


def test_asof_join_null_payload_not_skipped(spark):
    # A version whose attribute is NULL must still win over an older non-null
    # version (struct packing prevents ignoreNulls from skipping it).
    events = spark.createDataFrame(
        [("k", ts(2024, 1, 3))], "k string, ets timestamp"
    )
    dim = spark.createDataFrame(
        [("k", ts(2024, 1, 1), "old"), ("k", ts(2024, 1, 2), None)],
        "k string, vts timestamp, attr string",
    )
    out = asof_join(events, dim, on="k", left_ts="ets", right_ts="vts")
    assert out.first().attr is None


def test_asof_join_tolerance(spark):
    events = spark.createDataFrame(
        [("k", ts(2024, 1, 1, 10, 0))], "k string, ets timestamp"
    )
    dim = spark.createDataFrame(
        [("k", ts(2024, 1, 1, 9, 0), 1)], "k string, vts timestamp, v int"
    )
    hit = asof_join(events, dim, on="k", left_ts="ets", right_ts="vts",
                    tolerance_seconds=7200)
    miss = asof_join(events, dim, on="k", left_ts="ets", right_ts="vts",
                     tolerance_seconds=60)
    assert hit.first().v == 1
    assert miss.first().v is None


# ---------------------------------------------------------------------------
# scd1_upsert — anti-join insert idiom (dim_date.sql:50-52)
# ---------------------------------------------------------------------------

def test_scd1_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a")], "k int, v string")
    source = spark.createDataFrame([(1, "a-new"), (2, "b")], "k int, v string")
    out = scd1_upsert(target, source, ["k"])
    got = {r.k: r.v for r in out.collect()}
    # existing key untouched (SCD1-insert-only, like the reference), new key added
    assert got == {1: "a", 2: "b"}
    # rerun with same source adds nothing
    again = scd1_upsert(out, source, ["k"])
    assert again.count() == 2


# ---------------------------------------------------------------------------
# scd2 — close/open protocol (dim_agent_scd2.sql) + full-history builder
# ---------------------------------------------------------------------------

def test_scd2_from_history(spark):
    hist = spark.createDataFrame(
        [
            ("u1", ts(2024, 1, 1), "ip1"),
            ("u1", ts(2024, 1, 2), "ip1"),
            ("u1", ts(2024, 1, 3), "ip2"),
            ("u1", ts(2024, 1, 4), None),   # change to NULL is a real change
            ("u1", ts(2024, 1, 5), None),   # no change
            ("u2", ts(2024, 1, 1), None),   # first version with NULL attr
        ],
        "agent string, ets timestamp, ip string",
    )
    dim = scd2_from_history(hist, "agent", ["ip"], "ets")
    rows = sorted(dim.collect(), key=lambda r: (r.agent, r.effective_from))
    u1 = [r for r in rows if r.agent == "u1"]
    assert [(r.ip, r.effective_from, r.effective_to, r.is_current) for r in u1] == [
        ("ip1", ts(2024, 1, 1), ts(2024, 1, 3), 0),
        ("ip2", ts(2024, 1, 3), ts(2024, 1, 4), 0),
        (None, ts(2024, 1, 4), None, 1),
    ]
    u2 = [r for r in rows if r.agent == "u2"]
    assert len(u2) == 1 and u2[0].is_current == 1
    # invariant: exactly one current row per key, intervals non-overlapping
    cur = dim.filter("is_current = 1").groupBy("agent").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_apply_incremental(spark):
    src1 = spark.createDataFrame(
        [("a1", ts(2024, 1, 1, 10), "ip1"), ("a1", ts(2024, 1, 1, 11), "ip1")],
        "agent_name string, ets timestamp, agent_ip string",
    )
    dim = scd2_apply(
        None, src1, F.col("agent_name"), ["agent_ip"], "ets", "agent_key"
    )
    assert dim.count() == 1
    v1 = dim.first()
    assert v1.is_current == 1 and v1.effective_from == ts(2024, 1, 1, 10)

    # window 2: ip changes → close v1, open v2 at min(ets) of the window
    src2 = spark.createDataFrame(
        [("a1", ts(2024, 1, 2, 9), "ip2"), ("a2", ts(2024, 1, 2, 10), "ipX")],
        "agent_name string, ets timestamp, agent_ip string",
    )
    dim2 = scd2_apply(dim, src2, F.col("agent_name"), ["agent_ip"], "ets", "agent_key")
    rows = {(r["__nk"], r.is_current): r for r in dim2.collect()}
    assert len(rows) == 3
    closed = rows[("a1", 0)]
    assert closed.agent_ip == "ip1" and closed.effective_to == ts(2024, 1, 2, 9)
    opened = rows[("a1", 1)]
    assert opened.agent_ip == "ip2" and opened.effective_from == ts(2024, 1, 2, 9)
    assert rows[("a2", 1)].agent_ip == "ipX"

    # window 3: same attributes again → no new versions (idempotent-ish rerun)
    dim3 = scd2_apply(dim2, src2, F.col("agent_name"), ["agent_ip"], "ets", "agent_key")
    assert dim3.count() == dim2.count()


def test_scd2_apply_natural_key_fallback(spark):
    # coalesce(nullIf(agent_name,''), agent_ip) fallback (dim_agent_scd2.sql:43)
    src = spark.createDataFrame(
        [("", ts(2024, 1, 1), "10.0.0.1"), (None, ts(2024, 1, 1), "10.0.0.2")],
        "agent_name string, ets timestamp, agent_ip string",
    )
    nk = F.coalesce(F.nullif(F.col("agent_name"), F.lit("")), F.col("agent_ip"))
    dim = scd2_apply(None, src, nk, ["agent_ip"], "ets", "agent_key")
    nks = sorted(r["__nk"] for r in dim.collect())
    assert nks == ["10.0.0.1", "10.0.0.2"]


# ---------------------------------------------------------------------------
# replacing_dedupe — ReplacingMergeTree(updated_at) semantics (S4)
# ---------------------------------------------------------------------------

def test_replacing_dedupe(spark):
    df = spark.createDataFrame(
        [
            ("e1", ts(2024, 1, 1), ts(2024, 1, 1, 1), "old"),
            ("e1", ts(2024, 1, 1), ts(2024, 1, 1, 2), "new"),
            ("e2", ts(2024, 1, 1), ts(2024, 1, 1, 1), "only"),
        ],
        "event_id string, event_ts timestamp, updated_at timestamp, payload string",
    )
    out = replacing_dedupe(df, ["event_id", "event_ts"], "updated_at")
    got = {r.event_id: r.payload for r in out.collect()}
    assert got == {"e1": "new", "e2": "only"}


def test_exact_dedupe(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], "k int, v string")
    assert exact_dedupe(df).count() == 2
    assert exact_dedupe(df, ["k"]).count() == 1


def test_asof_join_multi_matches_three_singles(spark):
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.operators.asof import asof_join, asof_join_multi

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "a1", "h1", "r1"),
            (2, "2024-01-01 11:00:00", "a1", "h2", "r9"),   # r9: no rule dim
            (3, "2024-01-01 09:00:00", "a2", None, "r1"),   # null host key
            (4, "2024-01-01 08:00:00", "a1", "h1", "r1"),   # before any version
        ],
        "event_id long, event_ts string, ank string, hnk string, rnk string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))

    def dim(rows, nk, key):
        return spark.createDataFrame(
            rows, f"{nk} string, effective_from string, {key} long"
        ).withColumn("effective_from", F.col("effective_from").cast("timestamp"))

    agents = dim([("a1", "2024-01-01 09:00:00", 11), ("a1", "2024-01-01 10:30:00", 12),
                  ("a2", "2024-01-01 00:00:00", 21)], "agent_name", "agent_key")
    hosts = dim([("h1", "2024-01-01 09:30:00", 31), ("h2", "2024-01-01 00:00:00", 32)],
                "host_name", "host_key")
    rules = dim([("r1", "2024-01-01 00:00:00", 41)], "rule_id", "rule_key")

    fused = asof_join_multi(
        events,
        [
            ("agent", agents, "ank", "agent_name", "effective_from", "agent_key"),
            ("host", hosts, "hnk", "host_name", "effective_from", "host_key"),
            ("rule", rules, "rnk", "rule_id", "effective_from", "rule_key"),
        ],
        left_ts="event_ts",
        id_cols=["event_id", "event_ts"],
    )

    step = asof_join(events, agents.withColumnRenamed("agent_name", "ank"),
                     on="ank", left_ts="event_ts", right_ts="effective_from")
    step = asof_join(step, hosts.withColumnRenamed("host_name", "hnk"),
                     on="hnk", left_ts="event_ts", right_ts="effective_from")
    step = asof_join(step, rules.withColumnRenamed("rule_id", "rnk"),
                     on="rnk", left_ts="event_ts", right_ts="effective_from")

    cols = ["event_id", "agent_key", "host_key", "rule_key"]
    got = sorted(tuple(r[c] for c in cols) for r in fused.select(cols).collect())
    want = sorted(tuple(r[c] for c in cols) for r in step.select(cols).collect())
    assert got == want
    # spot semantics: inclusive >=, carry-forward, misses are NULL
    by_id = {r[0]: r[1:] for r in got}
    assert by_id[1] == (11, 31, 41)
    assert by_id[2] == (12, 32, None)
    assert by_id[3] == (21, None, 41)
    assert by_id[4] == (None, None, 41)


def test_asof_join_multi_single_window_exchange(spark):
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.operators.asof import asof_join_multi

    events = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a", "b", "c")],
        "event_id long, event_ts string, ank string, hnk string, rnk string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    d = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1)],
        "nk string, effective_from string, k long",
    ).withColumn("effective_from", F.col("effective_from").cast("timestamp"))

    out = asof_join_multi(
        events,
        [("agent", d, "ank", "nk", "effective_from", "k"),
         ("host", d, "hnk", "nk", "effective_from", "k"),
         ("rule", d, "rnk", "nk", "effective_from", "k")],
        left_ts="event_ts", id_cols=["event_id", "event_ts"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly ONE window sort serves all three lookups
    assert plan.count("Window") == 1


def test_asof_join_multi_raises_on_duplicate_probe_ids(spark):
    """Duplicate (event_id, event_ts) left rows with DIFFERENT natural keys
    (possible across micro-batches — per-batch dropDuplicates) must raise at
    action time, not silently mix one row's dim key onto another."""
    import pytest
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.operators.asof import asof_join_multi

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "a", "h"),
            (1, "2024-01-01 10:00:00", "b", "h"),  # same id, different agent nk
        ],
        "event_id long, event_ts string, ank string, hnk string",
    ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    d = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1), ("b", "2024-01-01 00:00:00", 2),
         ("h", "2024-01-01 00:00:00", 3)],
        "nk string, effective_from string, k long",
    ).withColumn("effective_from", F.col("effective_from").cast("timestamp"))

    out = asof_join_multi(
        events,
        [("agent", d, "ank", "nk", "effective_from", "k"),
         ("host", d, "hnk", "nk", "effective_from", "k")],
        left_ts="event_ts", id_cols=["event_id", "event_ts"],
    )
    with pytest.raises(Exception, match="uniquely identify"):
        out.collect()
