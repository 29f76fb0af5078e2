"""Bronze extraction: raw JSON security events → typed rows (SURVEY.md S2/P2/P4).

Re-expresses the reference's three streaming materialized views
(clickhouse/init/02_kafka_ingest.sql.tmpl:13-262) as Column expression layers
over a one-column ``raw`` DataFrame — schema-on-read with per-field fallback
chains, all inside whole-stage codegen (no Python UDFs).

Hot-path design: each document is parsed ONCE via ``from_json`` with a schema
covering every field any stream reads; all fallback chains are struct-field
accesses on the parsed value.  (The naive ``get_json_object``-per-field
translation of the reference re-parses the document 30-70× per row — at
ingest-bound 100 TB scale that is the difference.)  ``from_json`` semantics
match the ClickHouse functions where it matters: JSON numbers/bools coerce to
their text for String fields (JSON_VALUE), objects/arrays under a String
field yield raw JSON text (JSONExtractRaw), mistyped fields null out
individually (…OrNull), malformed documents null the whole struct and fall
out of every route (kafka_skip_broken_messages).

Timestamps are parsed to UTC instants.  The reference pins wall clocks to
Asia/Jakarta via column timezones; here Jakarta wall-clock is applied where
the reference applies ``toTimeZone`` — in the gold builders — keeping bronze
timezone-neutral.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ch_compat import parse_ts_best_effort
from ..functions.ip import ip_canonical


def _st(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, dtype=None) -> T.StructField:
    return T.StructField(name, dtype or T.StringType())


_ARR_S = T.ArrayType(T.StringType())

#: One schema covering every JSON path any of the three extractors reads
#: (02_kafka_ingest.sql.tmpl).  String-typed leaves + try_cast keep the
#: lenient ...OrNull semantics for numerics that arrive as strings.
RAW_EVENT_SCHEMA = _st(
    _f("@timestamp"),
    _f("node"),
    _f("message"),
    _f("tags", _ARR_S),
    _f("totDataBytes"),
    _f("protocol", _ARR_S),
    _f("event", _st(
        _f("hash"), _f("provider"), _f("module"), _f("dataset"), _f("kind"),
        _f("severity"), _f("start"), _f("end"), _f("ingested"), _f("original"),
        _f("id", _ARR_S), _f("category", _ARR_S), _f("severity_tags", _ARR_S),
    )),
    _f("suricata", _st(
        _f("timestamp"), _f("flow_id"),
        _f("alert", _st(_f("severity"), _f("signature"), _f("action"))),
        _f("http", _st(_f("url"))),
    )),
    _f("zeek", _st(
        _f("uid"), _f("ts"),
        _f("conn", _st(
            _f("orig_bytes"), _f("orig_ip_bytes"), _f("resp_bytes"),
            _f("resp_ip_bytes"), _f("orig_pkts"), _f("resp_pkts"),
            _f("conn_state"), _f("conn_state_description"), _f("duration"),
            _f("history"), _f("vlan"),
        )),
    )),
    _f("agent", _st(_f("name"), _f("ip"))),
    _f("host", _st(_f("name"), _f("ip"))),
    _f("rule", _st(
        _f("name"), _f("id"), _f("level"), _f("category", _ARR_S),
        _f("ruleset"),  # String ← raw JSON text of the node (JSONExtractRaw)
    )),
    _f("source", _st(
        _f("ip"), _f("port"), _f("bytes"), _f("packets"), _f("mac", _ARR_S),
        _f("geo", _st(
            _f("location", _st(_f("lat"), _f("lon"))),
            _f("latitude"), _f("longitude"), _f("country_name"),
            _f("country_iso_code"), _f("country_code2"), _f("country_code3"),
            _f("city_name"),
        )),
    )),
    _f("destination", _st(
        _f("ip"), _f("port"), _f("bytes"), _f("packets"), _f("mac", _ARR_S),
        _f("geo", _st(
            _f("location", _st(_f("lat"), _f("lon"))),
            _f("latitude"), _f("longitude"), _f("country_name"),
            _f("country_iso_code"), _f("country_code2"), _f("country_code3"),
            _f("city_name"),
        )),
    )),
    _f("network", _st(
        _f("application"), _f("transport", _ARR_S), _f("protocol", _ARR_S),
        _f("bytes"), _f("packets"), _f("type"), _f("direction"),
        _f("community_id"), _f("vlan", _st(_f("id", _ARR_S))),
    )),
    _f("client", _st(_f("bytes"), _f("packets"))),
    _f("server", _st(_f("bytes"), _f("packets"))),
)

_J = "__j"

# Extractor Column lists are static expression trees, but BUILDING them
# costs ~4.6 s of driver-side py4j traffic per call (r13 profile;
# ip_canonical alone is ~0.6 s/call) — and the batch path builds them per
# micro-batch.  Cached per process via functions.colcache, which also
# evicts entries from stopped SparkContexts (r14, ADVICE: the old local
# cache kept dead-gateway Column handles forever).
from ..functions.colcache import cached_cols as _shared_cached_cols


def _cached_cols(name: str, build) -> list:
    return _shared_cached_cols(("json_events", name), build)


def with_parsed(df: DataFrame) -> DataFrame:
    """Attach the single-parse struct column (idempotent)."""
    if _J in df.columns:
        return df
    return df.withColumn(_J, F.from_json(F.col("raw"), RAW_EVENT_SCHEMA))


def _get(path: str) -> Column:
    """Struct-field access by dotted path (getField — safe for '@timestamp')."""
    c: Column = F.col(_J)
    for part in path.split("."):
        if part.endswith("]"):  # e.g. 'mac[0]'
            name, idx = part[:-1].split("[")
            c = c.getField(name).getItem(int(idx))
        else:
            c = c.getField(part)
    return c


def _s(path: str) -> Column:
    """String field with the reference's nullIf(x,'') guard around JSON_VALUE."""
    return F.nullif(_get(path), F.lit(""))


def _ts_iso(path: str) -> Column:
    """parseDateTime64BestEffortOrNull over a JSON string field."""
    return parse_ts_best_effort(_s(path))


def _ts_millis(path: str) -> Column:
    """fromUnixTimestamp64Milli(toInt64OrNull(...)) — epoch-millis field."""
    return F.timestamp_millis(_s(path).try_cast("long"))


def _i32(path: str) -> Column:
    return _s(path).try_cast("int")


def _i64(path: str) -> Column:
    return _s(path).try_cast("long")


def _f64(path: str) -> Column:
    return _s(path).try_cast("double")


# ---------------------------------------------------------------------------
# Routing predicates (reference :83-84, :128-129, :261-262)
# ---------------------------------------------------------------------------

def route_suricata(df: DataFrame) -> Column:
    return _get("suricata").isNotNull() & _s("event.hash").isNotNull()


def route_wazuh(df: DataFrame) -> Column:
    return (_s("event.provider") == "wazuh") & _s("event.hash").isNotNull()


def route_zeek(df: DataFrame) -> Column:
    return _get("zeek").isNotNull() & _s("event.hash").isNotNull()


# ---------------------------------------------------------------------------
# Shared fallback chains
# ---------------------------------------------------------------------------

def _sensor_name() -> Column:
    # coalesce(agent.name, host.name, node) — reference :29-33
    return F.coalesce(_s("agent.name"), _s("host.name"), _s("node"))


def _protocol() -> Column:
    # coalesce over 4 paths — reference :46-51
    return F.coalesce(
        _s("network.application"),
        _s("network.transport[0]"),
        _s("network.protocol[0]"),
        _s("protocol[0]"),
    )


def _tags(*fallback_paths: str) -> Column:
    """tags with the reference's ifNull(..., []) fallback cascade."""
    return F.coalesce(
        _get("tags"),
        *[_get(p) for p in fallback_paths],
        F.array().cast("array<string>"),
    )


# ---------------------------------------------------------------------------
# Extractors — one per stream
# ---------------------------------------------------------------------------

def extract_suricata(df: DataFrame) -> DataFrame:
    """Suricata MV (reference 02_kafka_ingest.sql.tmpl:13-84)."""
    df = with_parsed(df)
    cols = _cached_cols("suricata", lambda: [
        _s("event.hash").alias("event_id"),
        F.coalesce(_ts_iso("@timestamp"), _ts_iso("suricata.timestamp")).alias(
            "event_ts"
        ),
        F.coalesce(_s("event.provider"), _s("event.module")).alias("sensor_type"),
        _sensor_name().alias("sensor_name"),
        F.coalesce(_s("event.dataset"), _s("event.kind")).alias("event_type"),
        F.coalesce(_s("suricata.alert.severity"), _s("event.severity")).alias(
            "severity"
        ),
        ip_canonical(_s("source.ip")).alias("src_ip"),
        ip_canonical(_s("destination.ip")).alias("dest_ip"),
        _i32("source.port").alias("src_port"),
        _i32("destination.port").alias("dest_port"),
        _protocol().alias("protocol"),
        F.coalesce(
            _i64("totDataBytes"), _i64("network.bytes"),
            _i64("client.bytes"), _i64("server.bytes"),
        ).alias("bytes"),
        F.coalesce(
            _i64("network.packets"), _i64("client.packets"), _i64("server.packets"),
        ).alias("packets"),
        _s("suricata.flow_id").alias("flow_id"),
        F.coalesce(_s("rule.name"), _s("suricata.alert.signature")).alias("signature"),
        _i32("rule.id").alias("signature_id"),
        _s("rule.category[0]").alias("category"),
        _s("suricata.alert.action").alias("alert_action"),
        _s("suricata.http.url").alias("http_url"),
        _tags("event.severity_tags").alias("tags"),
        F.coalesce(_s("message"), _s("event.original"), _s("rule.name")).alias(
            "message"
        ),
        F.col("raw").alias("raw_data"),
    ])
    return df.filter(route_suricata(df)).select(*cols)


def extract_wazuh(df: DataFrame) -> DataFrame:
    """Wazuh MV (reference 02_kafka_ingest.sql.tmpl:86-129)."""
    df = with_parsed(df)
    cols = _cached_cols("wazuh", lambda: [
        _s("event.hash").alias("event_id"),
        F.coalesce(
            _ts_iso("@timestamp"),
            _ts_iso("event.ingested"),
            _ts_millis("event.start"),
            _ts_millis("event.end"),
        ).alias("event_ts"),
        _ts_iso("event.ingested").alias("event_ingested_ts"),
        _ts_millis("event.start").alias("event_start_ts"),
        _ts_millis("event.end").alias("event_end_ts"),
        _s("event.dataset").alias("event_dataset"),
        _s("event.kind").alias("event_kind"),
        _s("event.module").alias("event_module"),
        _s("event.provider").alias("event_provider"),
        _s("agent.name").alias("agent_name"),
        ip_canonical(_s("agent.ip")).alias("agent_ip"),
        _s("host.name").alias("host_name"),
        ip_canonical(_s("host.ip")).alias("host_ip"),
        _s("rule.id").alias("rule_id"),
        _i32("rule.level").alias("rule_level"),
        _s("rule.name").alias("rule_name"),
        # JSONExtractRaw(rule.ruleset): String-typed struct field yields the
        # node's raw JSON text (:123)
        _s("rule.ruleset").alias("rule_ruleset"),
        _tags().alias("tags"),
        F.coalesce(_s("message"), _s("rule.name")).alias("message"),
        F.col("raw").alias("raw_data"),
    ])
    return df.filter(route_wazuh(df)).select(*cols)


def extract_zeek(df: DataFrame) -> DataFrame:
    """Zeek MV (reference 02_kafka_ingest.sql.tmpl:131-262) — the widest
    projection; zeek.conn numerics often arrive as strings → try_cast."""
    df = with_parsed(df)
    geo = lambda *paths: F.coalesce(*[_s(p) for p in paths])  # noqa: E731
    cols = _cached_cols("zeek", lambda: [
        _s("event.hash").alias("event_id"),
        F.coalesce(
            _ts_iso("@timestamp"),
            _ts_iso("zeek.ts"),
            _ts_iso("event.ingested"),
            _ts_millis("event.start"),
        ).alias("event_ts"),
        _ts_iso("event.ingested").alias("event_ingested_ts"),
        _ts_millis("event.start").alias("event_start_ts"),
        _ts_millis("event.end").alias("event_end_ts"),
        _s("event.dataset").alias("event_dataset"),
        _s("event.kind").alias("event_kind"),
        _s("event.module").alias("event_module"),
        _s("event.provider").alias("event_provider"),
        F.coalesce(_s("zeek.uid"), _s("event.id[0]")).alias("zeek_uid"),
        _sensor_name().alias("sensor_name"),
        ip_canonical(_s("source.ip")).alias("src_ip"),
        ip_canonical(_s("destination.ip")).alias("dest_ip"),
        _i32("source.port").alias("src_port"),
        _i32("destination.port").alias("dest_port"),
        geo(
            "source.geo.location.lat", "source.geo.latitude",
            "destination.geo.location.lat", "destination.geo.latitude",
        ).try_cast("double").alias("geo_latitude"),
        geo(
            "source.geo.location.lon", "source.geo.longitude",
            "destination.geo.location.lon", "destination.geo.longitude",
        ).try_cast("double").alias("geo_longitude"),
        geo(
            "source.geo.country_name", "source.geo.country_iso_code",
            "source.geo.country_code2", "source.geo.country_code3",
            "destination.geo.country_name", "destination.geo.country_iso_code",
            "destination.geo.country_code2", "destination.geo.country_code3",
        ).alias("geo_country"),
        geo("source.geo.city_name", "destination.geo.city_name").alias(
            "geo_city_name"
        ),
        geo("source.mac[0]", "destination.mac[0]").alias("mac_address"),
        _protocol().alias("protocol"),
        _s("network.application").alias("application"),
        _s("network.type").alias("network_type"),
        _s("network.direction").alias("direction"),
        _s("network.community_id").alias("community_id"),
        F.coalesce(
            _i64("totDataBytes"), _i64("network.bytes"),
            _i64("source.bytes"), _i64("destination.bytes"),
        ).alias("bytes"),
        F.coalesce(
            _i64("network.packets"), _i64("source.packets"),
            _i64("destination.packets"),
        ).alias("packets"),
        F.coalesce(
            _i64("zeek.conn.orig_bytes"), _i64("zeek.conn.orig_ip_bytes")
        ).alias("orig_bytes"),
        F.coalesce(
            _i64("zeek.conn.resp_bytes"), _i64("zeek.conn.resp_ip_bytes")
        ).alias("resp_bytes"),
        _i64("zeek.conn.orig_pkts").alias("orig_pkts"),
        _i64("zeek.conn.resp_pkts").alias("resp_pkts"),
        _s("zeek.conn.conn_state").alias("conn_state"),
        _s("zeek.conn.conn_state_description").alias("conn_state_description"),
        _f64("zeek.conn.duration").alias("duration"),
        _s("zeek.conn.history").alias("history"),
        F.coalesce(_s("zeek.conn.vlan"), _s("network.vlan.id[0]")).alias("vlan_id"),
        _tags("event.category", "event.severity_tags").alias("tags"),
        F.coalesce(
            _s("message"), _s("event.original"),
            _s("zeek.conn.conn_state_description"),
        ).alias("message"),
        F.col("raw").alias("raw_data"),
    ])
    return df.filter(route_zeek(df)).select(*cols)


def extract_all(df: DataFrame) -> dict[str, DataFrame]:
    """One raw stream → the three typed bronze projections (the reference's
    MV fan-out).  Rows matching no route (or with empty event.hash — the
    reference's required-field guard) are dropped, mirroring
    kafka_skip_broken_messages tolerance (ST2)."""
    df = with_parsed(df)
    return {
        "suricata_events_raw": extract_suricata(df),
        "wazuh_events_raw": extract_wazuh(df),
        "zeek_events_raw": extract_zeek(df),
    }
