"""ClickHouse-compatible scalar function layer (SURVEY.md §2.8).

Each helper states the reference function it re-expresses and where the
reference uses it.  All are thin Column expressions over built-in
``pyspark.sql.functions`` so they stay inside whole-stage codegen — no Python
UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

JAKARTA_TZ = "Asia/Jakarta"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Date / time keys
# ---------------------------------------------------------------------------

def to_yyyymmdd(ts: Column | str) -> Column:
    """``toYYYYMMDD(ts)`` → int date key (reference
    airflow/dags/sql/dim_date.sql:28, fact_wazuh_events.sql:28)."""
    return F.date_format(_col(ts), "yyyyMMdd").cast("int")


def time_key(ts: Column | str) -> Column:
    """``toHour*10000 + toMinute*100 + toSecond`` (reference
    airflow/dags/sql/dim_time.sql:20-27, fact_wazuh_events.sql:29-33)."""
    t = _col(ts)
    return (F.hour(t) * 10000 + F.minute(t) * 100 + F.second(t)).cast("int")


def day_of_week_mon1(ts: Column | str) -> Column:
    """``toDayOfWeek`` with Monday=1..Sunday=7 (reference dim_date.sql:35).

    Spark's ``dayofweek`` is Sunday=1..Saturday=7; remap.
    """
    return ((F.dayofweek(_col(ts)) + 5) % 7 + 1).cast("int")


def iso_week(ts: Column | str) -> Column:
    """``toISOWeek`` (reference dim_date.sql:34) — Spark ``weekofyear`` is ISO."""
    return F.weekofyear(_col(ts)).cast("int")


def to_start_of_five_minute(ts: Column | str) -> Column:
    """``toStartOfFiveMinute(ts)`` (reference scripts/superset_sql_examples.sql:2).

    Epoch-floor arithmetic — equivalent to a 5-minute tumbling bucket start and
    cheap inside codegen.
    """
    t = _col(ts)
    return F.timestamp_seconds((F.unix_timestamp(t) - F.unix_timestamp(t) % 300))


def parse_ts_best_effort(s: Column | str) -> Column:
    """``parseDateTime64BestEffortOrNull`` (reference
    clickhouse/init/02_kafka_ingest.sql.tmpl:20-21).

    Lenient ISO-8601 parse returning NULL on failure: try a chain of formats
    covering the shapes the three fixture payloads carry (Z-suffixed ISO with
    millis / micros, bare datetime, compact yyyyMMdd, epoch seconds/millis).

    The epoch fallbacks are gated on PLAUSIBLE digit counts (10 = seconds,
    13 = millis) — an unrestricted ``try_cast(long)`` would silently turn any
    numeric token into a 1970-adjacent timestamp, and a compact date like
    '20260813' (which ClickHouse parses as yyyyMMdd) into 1970-08-23.
    """
    c = _col(s)
    cleaned = F.regexp_replace(c, r"Z$", "+00:00")
    return F.coalesce(
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd HH:mm:ss.SSS")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.when(c.rlike(r"^\d{8}$"), c), F.lit("yyyyMMdd")),
        F.timestamp_seconds(F.when(c.rlike(r"^\d{10}$"), c).cast("long")),
        F.timestamp_millis(F.when(c.rlike(r"^\d{13}$"), c).cast("long")),
    )


# ---------------------------------------------------------------------------
# JSON extraction (reference 02_kafka_ingest.sql.tmpl throughout)
# ---------------------------------------------------------------------------

def json_string(raw: Column | str, path: str) -> Column:
    """``JSON_VALUE(raw, '$.path')`` / ``JSONExtractString`` →
    ``get_json_object``.  Path uses the same ``$.a.b[0]`` syntax."""
    return F.get_json_object(_col(raw), path)


def json_has(raw: Column | str, path: str) -> Column:
    """``JSONHas(raw, 'key')`` (reference :83,261) — routing predicate."""
    return F.get_json_object(_col(raw), path).isNotNull()


def json_array_string(raw: Column | str, path: str) -> Column:
    """``JSONExtract(raw, key, 'Array(String)')`` (reference :73,124) with the
    reference's ``[]`` default for missing/invalid arrays."""
    extracted = F.from_json(F.get_json_object(_col(raw), path), "array<string>")
    return F.coalesce(extracted, F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# Surrogate keys (reference cityHash64 idiom)
# ---------------------------------------------------------------------------

def surrogate_key(*cols: Column | str) -> Column:
    """``cityHash64(ifNull(a,''), …)`` → ``xxhash64`` surrogate key
    (reference dim_sensor.sql:17, fact_suricata_events.sql:58-67).

    Exact hash values differ from cityHash64 — irrelevant, because keys are
    always recomputed from natural keys on BOTH sides of every join (SURVEY.md
    J3).  What must be identical between the dim build and the fact lookup is
    the canonicalization.  This helper canonicalizes every column to its
    string form with NULL→'' — callers that need a distinct NULL sentinel for
    numeric keys (the reference's ``ifNull(signature_id, -1)``) coalesce it
    BEFORE calling, as gold/keys.signature_key does; otherwise a NULL id
    would collide with an empty-string id.
    """
    canon = []
    for c in cols:
        c = _col(c)
        canon.append(F.coalesce(c.cast("string"), F.lit("")))
    return F.xxhash64(*canon)


def round_half_up(c: Column | str, scale: int) -> Column:
    """Deterministic double rounding: ``floor(x * 10^s + 0.5) / 10^s``.

    Spark's ``round()`` re-decimalizes the double (BigDecimal HALF_UP on the
    shortest decimal rep) while DuckDB rounds the binary value — they disagree
    on half-boundary doubles like 234984.47625.  This formula is plain IEEE
    arithmetic, so any engine evaluating it on the same double gets the same
    bits; oracle SQL uses the literal same expression.
    """
    m = 10 ** scale
    return F.floor(_col(c) * m + F.lit(0.5)) / m


def round_sql(expr: str, scale: int) -> str:
    """The DuckDB-side twin of :func:`round_half_up`."""
    m = 10 ** scale
    return f"floor(({expr}) * {m} + 0.5) / {m}"


