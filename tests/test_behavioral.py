"""Semantic tests for the ClickHouse-parity behavioral pack, pinned
against hand-built fixtures so the oracle SQL can't hide a shared
misunderstanding of windowFunnel / retention / WITH-FILL semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from dev_clickhouse_spark.queries.behavioral import (
    funnel_window_counts,
    retention_cohorts,
    timeseries_fill_gaps,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, float(i), "{}") for i, (ts, uid, et) in enumerate(rows)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_levels_on_fixture(spark, tmp_path):
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full chain inside 24h → level 3
        (T0, 1, "view"), (T0 + h, 1, "click"), (T0 + 2 * h, 1, "purchase"),
        # user 2: click precedes every view → level 1
        (T0, 2, "click"), (T0 + h, 2, "view"),
        # user 3: purchase arrives 30h after the view (click at +1h) → level 2
        (T0, 3, "view"), (T0 + h, 3, "click"), (T0 + 30 * h, 3, "purchase"),
        # user 4: never views → level 0
        (T0, 4, "signup"), (T0 + h, 4, "purchase"),
        # user 5: first view->chain dies, but a LATER view completes → level 3
        (T0, 5, "view"), (T0 + 40 * h, 5, "view"),
        (T0 + 41 * h, 5, "click"), (T0 + 42 * h, 5, "purchase"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.funnel_level: r.n_users for r in funnel_window_counts(spark, sf).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2}


def test_retention_cohort_flags(spark, tmp_path):
    d = dt.timedelta(days=1)
    rows = [
        (T0, 1, "signup"), (T0 + d, 1, "click"),            # d1 yes, d7 no
        (T0, 2, "signup"), (T0 + 7 * d, 2, "view"),         # d1 no, d7 yes
        (T0, 3, "signup"), (T0 + 2 * d, 3, "click"),        # neither
        (T0 + d, 4, "signup"), (T0 + 2 * d, 4, "error"),    # next cohort, d1 yes
        (T0 + 3 * d, 5, "click"),                           # never signed up: absent
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.cohort_date.isoformat(): (r.n_users, r.d1_retained, r.d7_retained)
        for r in retention_cohorts(spark, sf).collect()
    }
    assert got == {"2024-03-01": (3, 1, 1), "2024-03-02": (1, 1, 0)}


def test_fill_gaps_densifies_and_carries_forward(spark, tmp_path):
    h = dt.timedelta(hours=1)
    rows = [
        (T0, 1, "view"), (T0 + dt.timedelta(minutes=30), 2, "view"),  # hour 0: vals 0,1
        (T0 + 4 * h, 3, "click"),                                     # hour 4: val 2
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = sorted(timeseries_fill_gaps(spark, sf).collect(), key=lambda r: r.hour)
    assert [r.hour for r in out] == [
        f"2024-03-01 0{i}:00:00" for i in range(5)
    ]
    assert [r.n_events for r in out] == [2, 0, 0, 0, 1]
    assert [r.filled for r in out] == [0, 1, 1, 1, 0]
    # LOCF: hours 1-3 inherit hour 0's avg (values 0.0, 1.0 → 0.5)
    assert [r.avg_value for r in out] == pytest.approx([0.5, 0.5, 0.5, 0.5, 2.0])


def test_sequence_match_ordering_semantics(spark, tmp_path):
    """sequenceMatch parity on a hand-built stream: order matters (p before
    v→c→p chain absent → no match), gaps allowed, ts ties broken by
    event_id so the symbol string is deterministic."""
    import datetime as dt

    from dev_clickhouse_spark.queries.behavioral import sequence_match_users

    t0 = dt.datetime(2026, 1, 8, 9, 0)
    rows = [
        # user 1: view .. click .. purchase with noise between → match
        (1, t0, 1, "view", 0.0, None),
        (2, t0 + dt.timedelta(minutes=1), 1, "error", 0.0, None),
        (3, t0 + dt.timedelta(minutes=2), 1, "click", 0.0, None),
        (4, t0 + dt.timedelta(minutes=3), 1, "purchase", 0.0, None),
        # user 2: purchase BEFORE view+click → no match
        (5, t0, 2, "purchase", 0.0, None),
        (6, t0 + dt.timedelta(minutes=1), 2, "view", 0.0, None),
        (7, t0 + dt.timedelta(minutes=2), 2, "click", 0.0, None),
        # user 3: same-ts tie — event_id order makes it v,c,p → match
        (8, t0, 3, "view", 0.0, None),
        (9, t0, 3, "click", 0.0, None),
        (10, t0, 3, "purchase", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "events_parquet")
    df.write.parquet(sf_dir + "/events.parquet")
    got = {
        r.user_id: r.matched
        for r in sequence_match_users(spark, sf_dir).collect()
    }
    assert got == {1: 1, 2: 0, 3: 1}


def test_sequence_count_non_overlapping(spark, tmp_path):
    """Two complete v→c→p chains in a row count as 2; a chain prefix after
    them does not count; interleaved symbols are lazy-skipped."""
    import datetime as dt

    from dev_clickhouse_spark.queries.behavioral import sequence_count_users

    t0 = dt.datetime(2026, 1, 8, 9, 0)
    seqs = {1: "vcpvcp", 2: "vcpvc", 3: "vvccpp", 4: "pcv"}
    sym_to_type = {"v": "view", "c": "click", "p": "purchase"}
    rows = []
    eid = 0
    for uid, s in seqs.items():
        for i, ch in enumerate(s):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(minutes=i), uid,
                         sym_to_type[ch], 0.0, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "ev")
    df.write.parquet(sf_dir + "/events.parquet")
    got = {r.user_id: r.n_chains
           for r in sequence_count_users(spark, sf_dir).collect()}
    # "vvccpp": the lazy leftmost match is v(0)..c(2)..p(4); the scanner
    # resumes AFTER the match end, where only "p" remains → 1 chain, even
    # though two disjoint chains exist combinatorially — exactly the
    # non-overlapping left-to-right contract sequenceCount documents
    assert got == {1: 2, 2: 1, 3: 1, 4: 0}


def test_sequence_match_timed_gap_semantics(spark, tmp_path):
    """(?t<=N) parity on a hand-built stream, including the case where the
    EARLIEST-predecessor greedy would wrongly miss: user 2's first view is
    out of window for the click, but a later view is in window — ClickHouse
    (and the brute-force oracle) match, so greedy-latest must too."""
    import datetime as dt

    from dev_clickhouse_spark.queries.behavioral import (
        _SEQ_TIMED_GAP_US,
        sequence_match_timed_users,
    )

    w_min = _SEQ_TIMED_GAP_US // 60_000_000  # gap bound in minutes
    t0 = dt.datetime(2026, 1, 8, 9, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=int(minutes))

    rows = [
        # user 1: v→c→p all inside the window → match
        (1, at(0), 1, "view", 0.0, None),
        (2, at(1), 1, "click", 0.0, None),
        (3, at(2), 1, "purchase", 0.0, None),
        # user 2: v@0 too old for c, but v@w-10 is in window → match
        (4, at(0), 2, "view", 0.0, None),
        (5, at(w_min - 10), 2, "view", 0.0, None),
        (6, at(w_min + 30), 2, "click", 0.0, None),
        (7, at(w_min + 40), 2, "purchase", 0.0, None),
        # user 3: right order, but the v→c gap exceeds the bound → no match
        (8, at(0), 3, "view", 0.0, None),
        (9, at(w_min + 1), 3, "click", 0.0, None),
        (10, at(w_min + 2), 3, "purchase", 0.0, None),
        # user 4: gaps OK pairwise but order is c,v,p → no match
        (11, at(0), 4, "click", 0.0, None),
        (12, at(1), 4, "view", 0.0, None),
        (13, at(2), 4, "purchase", 0.0, None),
        # user 5: p exactly AT the bound from c → match (<=, not <)
        (14, at(0), 5, "view", 0.0, None),
        (15, at(1), 5, "click", 0.0, None),
        (16, at(1 + w_min), 5, "purchase", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "ev")
    df.write.parquet(sf_dir + "/events.parquet")
    got = {r.user_id: r.matched
           for r in sequence_match_timed_users(spark, sf_dir).collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 1}


def test_funnel_strict_order_breaks_on_interruption(spark, tmp_path):
    """strict_order parity: any event between two chain steps breaks the
    chain (user 2's error between view and click caps them at level 1),
    while the consecutive chain (user 1) reaches level 3 — the exact
    delta from the default windowFunnel mode, which ignores gaps."""
    import datetime as dt

    from dev_clickhouse_spark.queries.behavioral import (
        funnel_strict_order_levels,
        funnel_window_counts,
    )

    t0 = dt.datetime(2026, 1, 8, 9, 0)
    rows = [
        # user 1: consecutive v,c,p → strict level 3
        (1, t0, 1, "view", 0.0, None),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 0.0, None),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 0.0, None),
        # user 2: v, error, c, p → default level 3, strict level 1
        (4, t0, 2, "view", 0.0, None),
        (5, t0 + dt.timedelta(minutes=1), 2, "error", 0.0, None),
        (6, t0 + dt.timedelta(minutes=2), 2, "click", 0.0, None),
        (7, t0 + dt.timedelta(minutes=3), 2, "purchase", 0.0, None),
        # user 3: consecutive v,c but the purchase is out of window
        (8, t0, 3, "view", 0.0, None),
        (9, t0 + dt.timedelta(minutes=1), 3, "click", 0.0, None),
        (10, t0 + dt.timedelta(hours=25), 3, "purchase", 0.0, None),
        # user 4: no view at all
        (11, t0, 4, "error", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "ev")
    df.write.parquet(sf_dir + "/events.parquet")

    strict = {r.funnel_level: r.n_users
              for r in funnel_strict_order_levels(spark, sf_dir).collect()}
    assert strict == {3: 1, 2: 1, 1: 1, 0: 1}
    dflt = {r.funnel_level: r.n_users
            for r in funnel_window_counts(spark, sf_dir).collect()}
    assert dflt == {3: 2, 2: 1, 0: 1}  # user 2 reaches 3 when gaps are OK
