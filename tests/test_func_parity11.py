"""Round-11b parity batch: time-decayed aggregates, bounded group arrays,
continuous-metric sample size — brute-force checks on tiny frames (the
sf0.01 DuckDB mirror is the full gate)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )


def test_exp_time_decayed_matches_bruteforce(spark, tmp_path, monkeypatch):
    from dev_clickhouse_spark.queries.func_parity11 import (
        exp_time_decayed_daily,
    )
    import dev_clickhouse_spark.queries.func_parity11 as mod

    rows = [
        (1, dt.datetime(2026, 1, 1, 5), 1, "click", 10.0, "{}"),
        (2, dt.datetime(2026, 1, 1, 9), 1, "click", 20.0, "{}"),
        (3, dt.datetime(2026, 1, 3, 9), 2, "click", 40.0, "{}"),
        (4, dt.datetime(2026, 1, 7, 9), 2, "click", 8.0, "{}"),
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(mod, "load_table", lambda s, d, t: ev)
    out = {
        str(r["day"]): (r["decayed_sum"], r["decayed_avg"])
        for r in exp_time_decayed_daily(spark, "ignored").collect()
    }
    # day1: sum=30; day3: 40 + 30*2^-2 = 47.5, cnt = 1 + 1*0.25 = 1.25
    # day7: 8 + 47.5*2^-4 = 10.96875, cnt = 1 + 1.25*0.0625 = 1.078125
    assert out["2026-01-01"] == (30.0, 30.0)
    assert out["2026-01-03"] == (47.5, 38.0)
    assert math.isclose(out["2026-01-07"][0], 10.9688, abs_tol=1e-4)
    assert math.isclose(
        out["2026-01-07"][1], 10.96875 / 1.078125, abs_tol=1e-4
    )


def test_group_array_sorted_last_bounds(spark, monkeypatch):
    from dev_clickhouse_spark.queries.func_parity11 import (
        group_array_sorted_last,
    )
    import dev_clickhouse_spark.queries.func_parity11 as mod

    rows = [
        (i, dt.datetime(2026, 1, 1) + dt.timedelta(hours=i), 1, "c",
         float(100 - i), "{}")
        for i in range(8)
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(mod, "load_table", lambda s, d, t: ev)
    r = group_array_sorted_last(spark, "ignored").collect()[0]
    assert r["n"] == 8
    # r12: columns serialize as comma-joined round-half-up cents
    # (array_join convention) so the driver comparator is hash-stable.
    # values are 100..93 descending over time: smallest 5 = 93..97
    assert r["smallest5"] == "9300,9400,9500,9600,9700"
    # last 5 in arrival order = values of events 3..7
    assert r["last5"] == "9700,9600,9500,9400,9300"


def test_group_array_last_shorter_than_n(spark, monkeypatch):
    from dev_clickhouse_spark.queries.func_parity11 import (
        group_array_sorted_last,
    )
    import dev_clickhouse_spark.queries.func_parity11 as mod

    rows = [
        (1, dt.datetime(2026, 1, 1, 1), 7, "c", 5.0, "{}"),
        (2, dt.datetime(2026, 1, 1, 2), 7, "c", 3.0, "{}"),
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(mod, "load_table", lambda s, d, t: ev)
    r = group_array_sorted_last(spark, "ignored").collect()[0]
    assert r["smallest5"] == "300,500"
    assert r["last5"] == "500,300"


def test_min_sample_size_continuous_formula(spark, monkeypatch):
    from dev_clickhouse_spark.queries.func_parity11 import (
        min_sample_size_continuous_by_type,
        _MDE_REL, _Z_ALPHA, _Z_POWER,
    )
    import dev_clickhouse_spark.queries.func_parity11 as mod

    vals = [10.0, 12.0, 14.0, 20.0]
    rows = [
        (i, dt.datetime(2026, 1, 1, i + 1), 1, "c", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(mod, "load_table", lambda s, d, t: ev)
    r = min_sample_size_continuous_by_type(spark, "ignored").collect()[0]
    mean = sum(vals) / len(vals)
    var = sum(v * v for v in vals) / len(vals) - mean * mean
    expect = math.ceil(
        2 * (_Z_ALPHA + _Z_POWER) ** 2 * var / (_MDE_REL * mean) ** 2
    )
    assert r["min_sample_size"] == expect
    assert abs(r["baseline_mean"] - mean) < 1e-6
