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
    # UInt8/UInt32 follow schemas.py's declared conventions (Integer) so
    # the reference's gold DDL reproduces GOLD_SCHEMAS exactly
    assert parse_type("UInt8") == T.IntegerType()
    assert parse_type("Array(UInt32)") == T.ArrayType(T.IntegerType())
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


_REF_GOLD_DDL = "/root/reference/clickhouse/init/03_gold_tables.sql"


@pytest.mark.skipif(
    not __import__("os").path.exists(_REF_GOLD_DDL),
    reason="reference checkout not available",
)
def test_reference_gold_ddl_reproduces_declared_schemas(spark, tmp_path):
    """The reference's OWN gold DDL (clickhouse/init/03_gold_tables.sql)
    bootstraps this engine's complete star schema: every dim/fact/bridge
    parses into the hand-declared GOLD_SCHEMAS exactly — UInt8/16/32 →
    Integer, UInt64 keys → Long, DateTime64(3, tz) → UTC instant, IPv6 →
    canonical string — with the ReplacingMergeTree(updated_at) version
    column captured as the declared engine, ORDER-BY-only dims staying
    UNpartitioned, toDate(event_ts) facts date-partitioned, and the
    ifNull(col, '') sort entries mapped to their columns."""
    from dev_clickhouse_spark.plans.ddl import bootstrap_from_ddl
    from dev_clickhouse_spark.schemas import GOLD_SCHEMAS

    wh = Warehouse(spark, str(tmp_path / "wh"))
    created = bootstrap_from_ddl(wh, open(_REF_GOLD_DDL).read())
    assert set(created) == set(GOLD_SCHEMAS)

    partitioned = {
        "fact_wazuh_events", "fact_suricata_events", "fact_zeek_events",
        "bridge_wazuh_event_tag", "bridge_suricata_event_tag",
        "bridge_zeek_event_tag",
    }
    for t in created:
        got = {f.name: f.dataType for f in wh.schema_for(t).fields}
        want = {f.name: f.dataType for f in GOLD_SCHEMAS[t].fields}
        if t in partitioned:
            want["event_date"] = T.DateType()
        assert got == want, t
        assert wh._is_date_partitioned(t) == (t in partitioned), t

    # sort keys: single-column dims, composite facts, ifNull-mapped SCD2
    assert wh._sort_key("dim_date") == ["date_key"]
    assert wh._sort_key("dim_host") == ["host_name", "effective_from"]
    assert wh._sort_key("dim_rule") == ["rule_id", "effective_from"]
    assert wh._sort_key("fact_zeek_events") == ["event_id", "event_ts"]
    assert wh._sort_key("bridge_zeek_event_tag") == [
        "event_id", "event_ts", "tag_key"]

    # engine family: ReplacingMergeTree(updated_at) everywhere the
    # reference declares it; the SCD2 dims are plain MergeTree
    assert wh.table_engine("dim_date") == {
        "engine": "ReplacingMergeTree", "version_col": "updated_at"}
    assert wh.table_engine("fact_wazuh_events") == {
        "engine": "ReplacingMergeTree", "version_col": "updated_at"}
    assert wh.table_engine("dim_host") is None
    assert wh.table_engine("dim_agent") is None


@pytest.mark.skipif(
    not __import__("os").path.exists(_REF_GOLD_DDL),
    reason="reference checkout not available",
)
def test_gold_pipeline_runs_on_ddl_bootstrapped_warehouse(spark, tmp_path):
    """End-to-end: bootstrap the warehouse from the reference's own
    bronze+gold DDL files, ingest events, run the full gold refresh —
    facts, SCD2 dims, and star integrity land identically on the
    DDL-declared tables, and a bare FINAL read resolves its keys/version
    from the parsed ReplacingMergeTree declaration."""
    import datetime as dt
    from dev_clickhouse_spark.plans.ddl import bootstrap_from_ddl
    from dev_clickhouse_spark.plans.runner import PipelineRunner
    from dev_clickhouse_spark.sources import extract_suricata, extract_wazuh
    from tests.test_siem import raw_df, suricata_payload, wazuh_payload

    wh_root = str(tmp_path / "wh")
    runner = PipelineRunner(spark, wh_root, max_active_tasks=4)
    for path in (_REF_DDL, _REF_GOLD_DDL):
        bootstrap_from_ddl(runner.wh, open(path).read())

    raw = raw_df(spark, [
        wazuh_payload("w1", "10.0.0.1", "2026-01-08T09:10:00.000Z"),
        wazuh_payload("w2", "10.0.0.1", "2026-01-08T09:20:00.000Z"),
        suricata_payload("s1", ts="2026-01-08T09:15:00.000Z"),
    ])
    runner.wh.append("wazuh_events_raw", extract_wazuh(raw), batch_id=0)
    runner.wh.append("suricata_events_raw", extract_suricata(raw),
                     batch_id=0)
    metrics = runner.run_window(
        dt.datetime(2026, 1, 8, 9, 0), dt.datetime(2026, 1, 8, 10, 0))
    by_id = {m["pipeline_id"]: m for m in metrics}
    assert by_id["fact_wazuh_events"]["rows_delta"] == 2
    assert by_id["fact_suricata_events"]["rows_delta"] == 1
    fact = runner.wh.read("fact_wazuh_events")
    dim = runner.wh.read("dim_agent")
    assert fact.join(dim, "agent_key", "left_anti").count() == 0
    # bare FINAL: keys + version resolve from the parsed declaration
    assert runner.wh.read_final("fact_wazuh_events").count() == 2


def test_orderby_only_table_round_trips_unpartitioned(spark, tmp_path):
    """An ORDER-BY-only MergeTree (no PARTITION BY — every dim in the
    reference's gold DDL) round-trips through show_create_table WITHOUT
    flipping to date-partitioned, and its first append needs no event_ts."""
    wh = Warehouse(spark, str(tmp_path / "a"))
    create_table_from_ddl(wh, """
CREATE TABLE dim_plain (`k` UInt64, `name` String, `updated_at` DateTime)
ENGINE = ReplacingMergeTree(updated_at) ORDER BY k
""")
    assert wh._sort_key("dim_plain") == ["k"]
    assert not wh._is_date_partitioned("dim_plain")
    sch = {f.name for f in wh.schema_for("dim_plain").fields}
    assert "event_date" not in sch

    ddl = wh.show_create_table("dim_plain")
    assert "PARTITION BY" not in ddl
    assert "ReplacingMergeTree(updated_at)" in ddl
    wh2 = Warehouse(spark, str(tmp_path / "b"))
    create_table_from_ddl(wh2, ddl)
    assert not wh2._is_date_partitioned("dim_plain")
    assert wh2.table_engine("dim_plain") == wh.table_engine("dim_plain")

    # the declaration is live without any event_ts/event_date plumbing
    import datetime as dt
    wh2.append("dim_plain", spark.createDataFrame(
        [(1, "a", dt.datetime(2026, 1, 1))], wh2.schema_for("dim_plain")),
        batch_id=0)
    assert wh2.read("dim_plain").count() == 1


def test_generic_struct_map_columns_round_trip(spark, tmp_path):
    """Columns typed with multi-parameter Spark generics
    (map<string,int>, struct<a:int,b:string>) split correctly at the top
    level and round-trip through show_create_table."""
    wh = Warehouse(spark, str(tmp_path / "a"))
    create_table_from_ddl(wh, """
CREATE TABLE generic_t (
  `k` bigint,
  `m` map<string,int>,
  `s` struct<a:int,b:string>,
  `arr` array<struct<x:double,y:double>>
) ENGINE = MergeTree ORDER BY k
""")
    sch = {f.name: f.dataType for f in wh.schema_for("generic_t").fields}
    assert sch["m"] == T.MapType(T.StringType(), T.IntegerType())
    assert sch["s"] == T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType())])
    wh2 = Warehouse(spark, str(tmp_path / "b"))
    create_table_from_ddl(wh2, wh.show_create_table("generic_t"))
    assert wh2.schema_for("generic_t") == wh.schema_for("generic_t")


def test_expression_order_by_rejected_loudly(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="ORDER BY"):
        create_table_from_ddl(wh, """
CREATE TABLE t (`k` UInt64, `ts` DateTime)
ENGINE = MergeTree ORDER BY (cityHash64(k), ts)
""")


def test_in_partition_mutation_on_orderby_only_table(spark, tmp_path):
    """ADVICE r11: on a table with an event_date COLUMN but no partition
    DIRECTORIES (declared ORDER-BY-only), IN PARTITION mutations fall back
    to predicate probing instead of silently skipping every member."""
    import datetime as dt

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.set_partitioning("obo", ["k"], partitioned=False)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("event_date", T.DateType()),
    ])
    d1, d2 = dt.date(2026, 1, 1), dt.date(2026, 1, 2)
    wh.append("obo", spark.createDataFrame(
        [(1, 10, d1), (2, 20, d1), (3, 30, d2)], schema), batch_id=0)
    res = wh.delete_where(
        "obo", T.StructField and __import__(
            "pyspark.sql.functions", fromlist=["col"]).col("v") >= 20,
        partition="2026-01-01")
    assert res["rows_deleted"] == 1          # only the d1 row ≥ 20
    left = sorted(r.k for r in wh.read("obo").collect())
    assert left == [1, 3]


def test_ddl_round_trip_property(spark, tmp_path):
    """Property: ANY declared table state (random schema, sort key,
    partitioned-or-not, engine family, table TTL) survives
    show_create_table → create_table_from_ddl into a fresh warehouse
    identically.  Random column types cover the generic spellings
    (map/struct/array) whose commas the top-level splitter must skip."""
    import itertools

    from hypothesis import given, settings, strategies as st

    types = [
        T.StringType(), T.LongType(), T.IntegerType(), T.DoubleType(),
        T.TimestampType(), T.DateType(), T.DecimalType(12, 3),
        T.ArrayType(T.StringType()),
        T.MapType(T.StringType(), T.IntegerType()),
        T.StructType([T.StructField("a", T.IntegerType()),
                      T.StructField("b", T.StringType())]),
    ]
    counter = itertools.count()

    @settings(max_examples=10, deadline=None)
    @given(data=st.data())
    def run(data):
        n_cols = data.draw(st.integers(min_value=1, max_value=6))
        cols = [
            (f"c{i}", data.draw(st.sampled_from(types)))
            for i in range(n_cols)
        ]
        schema = T.StructType(
            [T.StructField(n, t, True) for n, t in cols]
        )
        t_name = f"prop_{next(counter)}"
        wh = Warehouse(spark, str(tmp_path / t_name))
        wh.save_schema_override(t_name, schema)
        sort_n = data.draw(st.integers(min_value=0, max_value=min(2, n_cols)))
        if sort_n:
            partitioned = data.draw(st.booleans())
            wh.set_partitioning(
                t_name, [c for c, _ in cols[:sort_n]],
                partitioned=partitioned,
            )
        engine = data.draw(st.sampled_from(
            [None, "ReplacingMergeTree", "CollapsingMergeTree"]
        ))
        if engine == "ReplacingMergeTree":
            wh.set_table_engine(t_name, engine, version_col=cols[0][0])
        elif engine == "CollapsingMergeTree":
            wh.set_table_engine(t_name, engine, sign_col=cols[0][0])
        ts_cols = [c for c, t in cols if t == T.TimestampType()]
        if ts_cols and data.draw(st.booleans()):
            wh.set_table_ttl(t_name, 30, ttl_col=ts_cols[0])

        ddl = wh.show_create_table(t_name)
        wh2 = Warehouse(spark, str(tmp_path / (t_name + "_rt")))
        assert create_table_from_ddl(wh2, ddl) == t_name
        assert wh2.schema_for(t_name) == wh.schema_for(t_name), ddl
        assert wh2._sort_key(t_name) == wh._sort_key(t_name), ddl
        assert (
            wh2._is_date_partitioned(t_name)
            == wh._is_date_partitioned(t_name)
        ), ddl
        assert wh2.table_engine(t_name) == wh.table_engine(t_name), ddl
        assert wh2.table_ttl(t_name) == wh.table_ttl(t_name), ddl

    run()


def test_engine_defaulted_merge_reads(spark, tmp_path):
    """Bare FINAL-style reads resolve keys + engine arguments from the
    parsed CREATE TABLE declaration: SummingMergeTree(cols) sums its
    declared columns per sort key; VersionedCollapsingMergeTree(sign,
    ver) nets signs per key (the version column is dropped from the
    defaulted key set, as CH collapses) and serves the latest surviving
    state."""
    import datetime as dt

    wh = Warehouse(spark, str(tmp_path / "wh"))
    create_table_from_ddl(wh, """
CREATE TABLE s (k String, v UInt64, cnt UInt64, updated_at DateTime)
ENGINE = SummingMergeTree(v, cnt) ORDER BY k""")
    wh.append("s", spark.createDataFrame(
        [("a", 1, 1, dt.datetime(2026, 1, 1)),
         ("a", 2, 1, dt.datetime(2026, 1, 2)),
         ("b", 5, 1, dt.datetime(2026, 1, 1))],
        wh.schema_for("s")), batch_id=0)
    assert sorted(
        (r.k, r.v, r.cnt) for r in wh.read_summed("s").collect()
    ) == [("a", 3, 2), ("b", 5, 1)]

    create_table_from_ddl(wh, """
CREATE TABLE c (k String, val UInt64, sign Int8, ver UInt64)
ENGINE = VersionedCollapsingMergeTree(sign, ver) ORDER BY (k, ver)""")
    wh.append("c", spark.createDataFrame(
        [("a", 10, 1, 1), ("a", 10, -1, 1), ("a", 20, 1, 2),
         ("b", 7, 1, 1), ("c", 9, 1, 1), ("c", 9, -1, 1)],
        wh.schema_for("c")), batch_id=0)
    assert sorted(
        (r.k, r.val) for r in wh.read_collapsed("c").collect()
    ) == [("a", 20), ("b", 7)]

    # undeclared table: bare reads refuse loudly instead of guessing
    wh.append("plain", spark.createDataFrame(
        [(1,)], "x long"), batch_id=0)
    with pytest.raises(ValueError, match="read_summed"):
        wh.read_summed("plain")
    with pytest.raises(ValueError, match="read_final"):
        wh.read_final("plain")


def test_ddl_index_and_projection_declarations_are_live(spark, tmp_path):
    """CREATE TABLE INDEX/PROJECTION clauses are no longer skipped: they
    persist as declarations, materialize as the live SkipIndex (minmax +
    tokenbf sidecars) and ProjectionSet (state folds + rollup rewrite),
    and round-trip through show_create_table."""
    import datetime as dt

    from dev_clickhouse_spark.plans.projection import Metric

    wh = Warehouse(spark, str(tmp_path / "a"))
    t = create_table_from_ddl(wh, """
CREATE TABLE ev (
  `event_id` String, `user_id` UInt64, `event_type` String,
  `value` Float64, `event_ts` DateTime,
  INDEX idx_uid user_id TYPE minmax GRANULARITY 4,
  INDEX idx_msg event_type TYPE tokenbf_v1(8192, 3, 0) GRANULARITY 4,
  PROJECTION p_daily (SELECT event_type, count(), sum(value), avg(value)
                      GROUP BY event_type)
)
ENGINE = MergeTree PARTITION BY toDate(event_ts)
ORDER BY (event_ts, event_id)
""")
    assert wh.declared_skip_indexes(t)["idx_msg"]["type"] == "tokenbf_v1"
    assert wh.declared_projections(t)["p_daily"]["measures"] == [
        ["count", None], ["sum", "value"], ["moments", "value"]]

    rows = [
        (f"e{i}", i % 50, "click" if i % 2 else "buy", float(i),
         dt.datetime(2026, 1, 1, 9, 0, 0))
        for i in range(1000)
    ]
    wh.append(t, spark.createDataFrame(
        rows, "event_id string, user_id long, event_type string, "
              "value double, event_ts timestamp"), batch_id=0)

    idx = wh.skip_index_for(t)
    assert idx.ensure() >= 1
    assert idx.read([("between", "user_id", 10, 19)]).count() == 200

    ps = wh.projection_set_for(t)
    ps.ensure()
    df, report = ps.answer(
        ["event_type"],
        [Metric("count", None, "n"), Metric("sum", "value", "total")],
        require_projection=True,
    )
    got = {r["event_type"]: (r["n"], float(r["total"])) for r in df.collect()}
    assert got["click"] == (500, float(sum(i for i in range(1000) if i % 2)))
    assert got["buy"] == (500, float(sum(i for i in range(1000) if not i % 2)))

    ddl = wh.show_create_table(t)
    assert "INDEX idx_uid user_id TYPE minmax" in ddl
    assert "PROJECTION p_daily" in ddl
    wh2 = Warehouse(spark, str(tmp_path / "b"))
    create_table_from_ddl(wh2, ddl)
    assert wh2.declared_skip_indexes(t) == wh.declared_skip_indexes(t)
    assert wh2.declared_projections(t) == wh.declared_projections(t)


def test_ddl_unsupported_projection_rejected(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="PROJECTION"):
        create_table_from_ddl(wh, """
CREATE TABLE t (`k` UInt64, `v` Float64,
  PROJECTION p (SELECT k, quantile(0.9)(v) GROUP BY k)
) ENGINE = MergeTree ORDER BY k
""")


def test_rollup_ttl_round_trips(spark, tmp_path):
    """``TTL … GROUP BY … SET …`` (the downsampling rollup form) parses
    from CH DDL and round-trips through show_create_table — previously
    the GROUP BY/SET tail was silently dropped on re-parse."""
    wh = Warehouse(spark, str(tmp_path / "a"))
    create_table_from_ddl(wh, """
CREATE TABLE metrics (
  `event_type` String, `event_ts` DateTime, `value` Float64, `n` UInt64
)
ENGINE = MergeTree PARTITION BY toDate(event_ts)
ORDER BY (event_ts, event_type)
TTL event_ts + INTERVAL 90 DAY
GROUP BY event_type, event_date SET value = avg(value), n = sum(n)
""")
    ttl = wh.table_ttl("metrics")
    assert ttl["group_by"] == ["event_type", "event_date"]
    assert ttl["aggregates"] == {"value": "avg(value)", "n": "sum(n)"}
    assert "where" not in ttl

    wh2 = Warehouse(spark, str(tmp_path / "b"))
    create_table_from_ddl(wh2, wh.show_create_table("metrics"))
    assert wh2.table_ttl("metrics") == ttl


def test_declared_projection_maintained_by_maintenance_tick(spark, tmp_path):
    """A PROJECTION declared in CREATE TABLE is folded by the runner's
    maintenance cadence (the CH merge-time projection update): after
    appends + maintenance_tick, answer() serves from projection state
    without touching the base table scan."""
    import datetime as dt

    from dev_clickhouse_spark.plans.projection import Metric
    from dev_clickhouse_spark.plans.runner import PipelineRunner

    runner = PipelineRunner(spark, str(tmp_path / "wh"), max_active_tasks=2)
    wh = runner.wh
    create_table_from_ddl(wh, """
CREATE TABLE ev (
  `event_id` String, `event_type` String, `value` Float64,
  `event_ts` DateTime,
  PROJECTION p_type (SELECT event_type, count(), sum(value)
                     GROUP BY event_type)
)
ENGINE = MergeTree PARTITION BY toDate(event_ts)
ORDER BY (event_ts, event_id)
""")
    for b in range(3):
        wh.append("ev", spark.createDataFrame(
            [(f"e{b}-{i}", "click" if i % 2 else "buy", float(i),
              dt.datetime(2026, 1, 1, 9 + b))
             for i in range(100)],
            "event_id string, event_type string, value double, "
            "event_ts timestamp"), batch_id=b)
    runner.maintenance_tick(tables=["ev"], gc_min_age_sec=0.0)

    ps = wh.projection_set_for("ev")
    df, report = ps.answer(
        ["event_type"],
        [Metric("count", None, "n"), Metric("sum", "value", "total")],
        require_projection=True,       # would raise if not folded/served
    )
    got = {r["event_type"]: r["n"] for r in df.collect()}
    assert got == {"click": 150, "buy": 150}


def test_modify_order_by(spark, tmp_path):
    """ALTER TABLE … MODIFY ORDER BY: append-only key extension (the CH
    constraint — existing parts stay sorted by the old prefix), persisted
    and visible to show_create/FINAL defaults; prefix changes and unknown
    columns refused loudly."""
    import datetime as dt

    wh = Warehouse(spark, str(tmp_path / "wh"))
    create_table_from_ddl(wh, """
CREATE TABLE t (`k` UInt64, `sub` String, `updated_at` DateTime)
ENGINE = ReplacingMergeTree(updated_at) ORDER BY k""")
    wh.append("t", spark.createDataFrame(
        [(1, "a", dt.datetime(2026, 1, 1))], wh.schema_for("t")),
        batch_id=0)

    wh.modify_order_by("t", ["k", "sub"])
    assert wh._sort_key("t") == ["k", "sub"]
    assert "ORDER BY (k, sub)" in wh.show_create_table("t")
    # FINAL now collapses on the extended key
    assert wh.read_final("t").count() == 1

    with pytest.raises(ValueError, match="extend the existing key"):
        wh.modify_order_by("t", ["sub", "k"])
    with pytest.raises(ValueError, match="unknown columns"):
        wh.modify_order_by("t", ["k", "sub", "nope"])
