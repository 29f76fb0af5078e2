"""Data-quality / monitoring checks (SURVEY.md §1.1 monitoring model, §5.3).

The reference declares a DQ framework as metadata — ``control.dq_rules``
(postgres/init/03_control_metadata.sql:18-27), results in ``gold.dq_results``
(04_monitoring_tables.sql:48-54), plus freshness/volume/schema-drift monitors
(04_monitoring_tables.sql:11-46; ``expected_columns`` drift spec
06_dynamic_dag_metadata.sql:34) — but ships no executor for it.  This module
is that executor: each check returns a result dict shaped like a
``dq_results`` row, and ``run_dq_rules`` evaluates a rule list against a
table the way the metadata tables describe.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _result(rule: str, table: str, passed: bool, observed, expected) -> dict:
    return {
        "rule": rule,
        "table": table,
        "passed": bool(passed),
        "observed": str(observed),
        "expected": str(expected),
        "checked_at": dt.datetime.now(dt.timezone.utc).isoformat(),
    }


def check_freshness(
    df: DataFrame, ts_col: str, threshold_minutes: int, table: str = "",
    now: dt.datetime | None = None,
) -> dict:
    """max(ts) must be within threshold of now — the reference's
    ``freshness_threshold_minutes`` per pipeline (06_dynamic_dag_metadata.sql:36)."""
    row = df.agg(F.max(ts_col).alias("m")).first()
    # naive-UTC now: collected timestamps are naive UTC under the engine's
    # UTC session timezone — a host-local now() would skew lag by the offset
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    lag_min = None if row.m is None else (now - row.m).total_seconds() / 60
    ok = lag_min is not None and lag_min <= threshold_minutes
    return _result("freshness", table, ok, f"{lag_min:.1f}min" if lag_min is not None else "empty",
                   f"<={threshold_minutes}min")


def check_volume(
    df: DataFrame, min_rows: int, table: str = "", max_rows: int | None = None
) -> dict:
    """Row-count envelope — ``monitoring.volume_metrics`` intent
    (04_monitoring_tables.sql:19-27)."""
    n = df.count()
    ok = n >= min_rows and (max_rows is None or n <= max_rows)
    return _result("volume", table, ok, n, f">={min_rows}" + (f", <={max_rows}" if max_rows else ""))


def check_schema_drift(
    df: DataFrame, expected_columns: dict[str, str], table: str = ""
) -> dict:
    """Compare live schema to the declared ``expected_columns`` map —
    ``monitoring.schema_drift`` (04_monitoring_tables.sql:29-37)."""
    actual = dict(df.dtypes)
    missing = {c: t for c, t in expected_columns.items() if actual.get(c) != t}
    extra = sorted(set(actual) - set(expected_columns))
    ok = not missing and not extra
    return _result("schema_drift", table, ok,
                   f"missing/mistyped={sorted(missing)} extra={extra}", "exact match")


def check_not_null(df: DataFrame, cols: list[str], table: str = "") -> dict:
    """NOT NULL rule over required columns (the bronze required-field guards,
    e.g. event_id/event_ts)."""
    cond = None
    for c in cols:
        bad = F.col(c).isNull()
        cond = bad if cond is None else (cond | bad)
    n_bad = df.filter(cond).count() if cond is not None else 0
    return _result("not_null", table, n_bad == 0, f"{n_bad} null rows", "0")


def check_unique_key(df: DataFrame, keys: list[str], table: str = "") -> dict:
    """Key uniqueness — the ReplacingMergeTree dedupe invariant the engine
    enforces synchronously (SURVEY.md S4)."""
    dups = (
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).count()
    )
    return _result("unique_key", table, dups == 0, f"{dups} duplicate keys", "0")


def run_dq_rules(df: DataFrame, rules: list[dict], table: str = "") -> list[dict]:
    """Evaluate a metadata-driven rule list (the ``control.dq_rules`` shape:
    rule_type + params)."""
    out = []
    for rule in rules:
        kind = rule["rule_type"]
        if kind == "freshness":
            out.append(check_freshness(df, rule["ts_col"], rule["threshold_minutes"], table))
        elif kind == "volume":
            out.append(check_volume(df, rule["min_rows"], table, rule.get("max_rows")))
        elif kind == "schema":
            out.append(check_schema_drift(df, rule["expected_columns"], table))
        elif kind == "not_null":
            out.append(check_not_null(df, rule["cols"], table))
        elif kind == "unique_key":
            out.append(check_unique_key(df, rule["keys"], table))
        else:
            raise ValueError(f"unknown rule_type {kind!r}")
    return out
