"""Semantic checks for the round-8 statistical parity queries — brute-force
twins in plain Python over tiny synthetic frames (the DuckDB oracles gate
the full-size runs; these pin the math itself)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from dev_clickhouse_spark.queries.stats_parity import (
    ema_daily_order_totals,
    entropy_daily_event_types,
    lttb_downsample_daily_orders,
    max_intersections_sessions,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_entropy_matches_closed_form(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    # one day: 2×a, 1×b, 1×c → H = -(0.5 log2 0.5 + 2 * 0.25 log2 0.25) = 1.5
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0, 1, "a", 1.0, "{}"),
        (3, t0, 1, "b", 1.0, "{}"),
        (4, t0, 1, "c", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = entropy_daily_event_types(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["type_entropy"] == 1.5


def test_max_intersections_brute_force(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # intervals of 60 min: starts at 0, 30, 45, 120 → peak 3 at t=45
    rows = [
        (i, at(m), 1, "x", 1.0, "{}") for i, m in enumerate([0, 30, 45, 120])
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = max_intersections_sessions(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["max_intersections"] == 3
    assert got[0]["first_peak_ts"].startswith("2024-01-01 10:45:00")
    # half-open: an interval ending exactly when another starts must NOT
    # count as intersecting — starts at 0 and 60 overlap nowhere
    rows2 = [(1, at(0), 1, "y", 1.0, "{}"), (2, at(60), 1, "y", 1.0, "{}")]
    sf2 = _write_events(spark, tmp_path / "b", rows2)
    got2 = max_intersections_sessions(spark, sf2).collect()
    assert got2[0]["max_intersections"] == 1


def test_ema_fold_matches_python_loop(spark, tmp_path):
    days = [datetime.datetime(2024, 1, d, 0, 0, 0) for d in range(1, 8)]
    totals = [100.0, 200.0, 50.0, 300.0, 100.0, 100.0, 400.0]
    rows = [
        (i, i, d, t, "O", "1-URGENT")
        for i, (d, t) in enumerate(zip(days, totals))
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double, o_orderstatus string, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["day"].isoformat(): r["ema_total"]
        for r in ema_daily_order_totals(spark, str(tmp_path)).collect()
    }
    ema = totals[0]
    expect = {days[0].date().isoformat(): ema}
    for d, x in zip(days[1:], totals[1:]):
        ema = 0.3 * x + 0.7 * ema
        expect[d.date().isoformat()] = math.floor(ema * 1e4 + 0.5) / 1e4
    assert got == expect


def _lttb_brute(ts, vs, m=18):
    """Reference LTTB with the integer bucketing + scaled-area argmax the
    query documents (v in cents, t epoch days, next-bucket mean as
    count-scaled sums, ties to smallest t)."""
    n = len(ts)
    sel = [(ts[0], vs[0])]
    buckets: dict[int, list[int]] = {}
    for i in range(1, n - 1):
        buckets.setdefault(((i - 1) * m) // (n - 2), []).append(i)
    for b in range(m):
        idx = buckets.get(b, [])
        if not idx:
            continue
        nxt = buckets.get(b + 1)
        if nxt:
            cnt = float(len(nxt))
            st = float(sum(ts[j] for j in nxt))
            sv = float(sum(vs[j] for j in nxt))
        else:
            cnt, st, sv = 1.0, float(ts[-1]), float(vs[-1])
        pt, pv = sel[-1]
        best = max(
            idx,
            key=lambda j: (
                abs((pt * cnt - st) * (vs[j] - pv) - (pt - ts[j]) * (sv - pv * cnt)),
                -ts[j],
            ),
        )
        sel.append((ts[best], vs[best]))
    sel.append((ts[-1], vs[-1]))
    return sel


def test_lttb_matches_brute_force(spark, tmp_path):
    import random

    rng = random.Random(42)
    base = datetime.datetime(2020, 1, 1)
    days = [base + datetime.timedelta(days=i) for i in range(200)]
    # one order per day with a 2dp price — daily total = that price
    prices = [round(rng.uniform(10, 5000), 2) for _ in range(200)]
    rows = [
        (i, i, d, p, "O", "1-URGENT")
        for i, (d, p) in enumerate(zip(days, prices))
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double, o_orderstatus string, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = sorted(
        (r["day"].isoformat(), r["v"])
        for r in lttb_downsample_daily_orders(spark, str(tmp_path)).collect()
    )
    epoch = datetime.date(1970, 1, 1)
    ts = [float((d.date() - epoch).days) for d in days]
    vs = [float(round(p * 100)) for p in prices]  # cents, integral
    expect = sorted(
        ((epoch + datetime.timedelta(days=int(t))).isoformat(),
         math.floor(v + 0.5) / 100)
        for t, v in _lttb_brute(ts, vs)
    )
    assert len(got) == 20
    assert got == expect
