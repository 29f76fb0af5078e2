"""CH-flavored CREATE TABLE parsing (plans/ddl.py): ClickHouse-native
DDL registers the same declaration here, and show_create_table output
round-trips to the identical declared state."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import types as T

from dev_clickhouse_spark.plans.ddl import create_table_from_ddl, parse_type
from dev_clickhouse_spark.plans.warehouse import Warehouse


def test_parse_type_matrix(spark):  # session: the struct<>/array<> fallback
    # parser delegates to Spark's own DDL parser
    assert parse_type("String") == T.StringType()
    assert parse_type("UInt64") == T.LongType()
    assert parse_type("Int32") == T.IntegerType()
    assert parse_type("Float64") == T.DoubleType()
    assert parse_type("DateTime") == T.TimestampType()
    assert parse_type("DateTime64(3)") == T.TimestampType()
    assert parse_type("Date") == T.DateType()
    assert parse_type("Nullable(String)") == T.StringType()
    assert parse_type("LowCardinality(String)") == T.StringType()
    assert parse_type("Array(UInt32)") == T.ArrayType(T.LongType())
    assert parse_type("Decimal(18, 4)") == T.DecimalType(18, 4)
    assert parse_type("FixedString(16)") == T.StringType()
    assert parse_type("Enum8('a' = 1, 'b' = 2)") == T.StringType()
    # Spark spellings round-trip too
    assert parse_type("bigint") == T.LongType()
    assert parse_type("array<string>") == T.ArrayType(T.StringType())


_CH_DDL = """
CREATE TABLE IF NOT EXISTS siem.events_raw (
  `event_id` String,
  `event_ts` DateTime64(3),
  `rule_level` UInt16,
  `bytes` UInt64,
  `tags` Array(LowCardinality(String)),
  `message` Nullable(String) CODEC(ZSTD(3)),
  `event_day` Date MATERIALIZED toDate(event_ts),
  `raw_data` String TTL event_ts + INTERVAL 30 DAY
)
ENGINE = MergeTree
PARTITION BY toDate(event_ts)
ORDER BY (event_ts, event_id)
TTL event_ts + INTERVAL 365 DAY WHERE rule_level < 3
SETTINGS index_granularity = 8192;
"""


def test_clickhouse_native_ddl_registers_declaration(spark, tmp_path):
    """The reference's MergeTree DDL shape (clickhouse/init/
    01_bronze_tables.sql) parses into the full declared state: schema,
    sort key, date partitioning, MATERIALIZED column, conditional table
    TTL, and a per-column TTL."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    name = create_table_from_ddl(wh, _CH_DDL)
    assert name == "events_raw"
    sch = {f.name: f.dataType for f in wh.schema_for(name).fields}
    assert sch["event_id"] == T.StringType()
    assert sch["event_ts"] == T.TimestampType()
    assert sch["rule_level"] == T.IntegerType()      # UInt16 widens
    assert sch["bytes"] == T.LongType()
    assert sch["tags"] == T.ArrayType(T.StringType())
    assert sch["event_date"] == T.DateType()         # partition column
    assert wh._sort_key(name) == ["event_ts", "event_id"]
    assert wh._is_date_partitioned(name)
    cc = wh.computed_columns(name)
    assert cc["event_day"]["kind"] == "materialized"
    assert "to_date" in cc["event_day"]["expr"]      # CH fn rewritten
    ttl = wh.table_ttl(name)
    assert ttl["interval_days"] == 365.0
    assert ttl["where"] == "rule_level < 3"
    assert wh.column_ttls(name)["raw_data"]["interval_days"] == 30.0

    # the declaration is live: an insert adopts it, the MATERIALIZED
    # column fills at write (so the input omits it, as a CH insert does)
    in_schema = T.StructType([
        f for f in wh.schema_for(name).fields
        if f.name not in ("event_day", "event_date")
    ])
    df = spark.createDataFrame(
        [("e1", dt.datetime(2026, 3, 1, 10), 5, 100, ["t"], "m", "r")],
        in_schema,
    )
    wh.append(name, df, batch_id=0)
    row = wh.read(name).collect()[0]
    assert row["event_day"] == dt.date(2026, 3, 1)


def test_show_create_round_trips(spark, tmp_path):
    """show_create_table output feeds back through the parser into a
    FRESH warehouse and reproduces the identical declared state."""
    from dev_clickhouse_spark.quality import SchemaMigrator

    wh = Warehouse(spark, str(tmp_path / "a"))
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("event_date", T.DateType()),
    ])
    wh.set_partitioning("rt", ["event_ts", "event_id"])
    wh.save_schema_override("rt", schema)
    SchemaMigrator(wh).add_computed_column(
        "rt", "v_cents", T.LongType(),
        "CAST(floor(v * 100 + 0.5) AS BIGINT)", kind="default")
    wh.set_table_ttl("rt", 90, ttl_col="event_ts", where="v < 1")
    wh.append("rt", spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1), 2.0, dt.date(2026, 1, 1))], schema),
        batch_id=0)

    ddl = wh.show_create_table("rt")
    wh2 = Warehouse(spark, str(tmp_path / "b"))
    create_table_from_ddl(wh2, ddl)
    assert wh2.schema_for("rt") == wh.schema_for("rt")
    assert wh2._sort_key("rt") == wh._sort_key("rt")
    assert wh2.computed_columns("rt") == wh.computed_columns("rt")
    assert wh2.table_ttl("rt") == wh.table_ttl("rt")


_REF_DDL = "/root/reference/clickhouse/init/01_bronze_tables.sql"


@pytest.mark.skipif(
    not __import__("os").path.exists(_REF_DDL),
    reason="reference checkout not available",
)
def test_reference_bronze_ddl_reproduces_declared_schemas(spark, tmp_path):
    """The reference's OWN MergeTree bronze DDL
    (clickhouse/init/01_bronze_tables.sql) parses statement-by-statement
    and reproduces this engine's hand-declared bronze schemas exactly —
    types (IPv6 → canonical string, DateTime64(3, tz) → UTC instant,
    Nullable unwrap), the (event_ts, event_id) sort key, and the
    toDate(event_ts) partitioning mapped to event_date."""
    from dev_clickhouse_spark.schemas import BRONZE_SCHEMAS

    src = open(_REF_DDL).read()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    parsed = []
    for stmt in src.split(";"):
        if "CREATE TABLE" in stmt.upper():
            parsed.append(create_table_from_ddl(wh, stmt))
    assert set(parsed) == set(BRONZE_SCHEMAS)
    for t in parsed:
        got = {f.name: f.dataType for f in wh.schema_for(t).fields}
        want = {f.name: f.dataType for f in BRONZE_SCHEMAS[t].fields}
        want["event_date"] = T.DateType()
        assert got == want, t
        assert wh._sort_key(t) == ["event_ts", "event_id"]
        assert wh._is_date_partitioned(t)


def test_unsupported_partition_by_is_refused(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="PARTITION BY"):
        create_table_from_ddl(wh, """
CREATE TABLE t (`k` UInt64, `ts` DateTime)
ENGINE = MergeTree PARTITION BY cityHash64(k) ORDER BY k
""")
