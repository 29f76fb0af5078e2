"""Bronze extraction: raw JSON security events → typed rows (SURVEY.md S2/P2/P4).

Re-expresses the reference's three streaming materialized views
(clickhouse/init/02_kafka_ingest.sql.tmpl:13-262) as pure Column expression
layers over a one-column ``raw`` DataFrame — schema-on-read with per-field
fallback chains, all inside whole-stage codegen (``get_json_object`` /
``from_json`` / ``coalesce``; no Python UDFs).

Timestamps are parsed to UTC instants (TimestampType).  The reference pins
wall clocks to Asia/Jakarta via column timezones; here Jakarta wall-clock is
applied where the reference applies ``toTimeZone`` — in the gold builders
(gold/dims.py, gold/facts.py) — keeping bronze timezone-neutral.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ch_compat import json_array_string, parse_ts_best_effort


def _jv(path: str) -> Column:
    """JSON_VALUE / JSONExtractString equivalent (empty-string → NULL, matching
    the reference's nullIf(... , '') guards around JSON_VALUE)."""
    return F.nullif(F.get_json_object("raw", path), F.lit(""))


def _ts_iso(path: str) -> Column:
    """parseDateTime64BestEffortOrNull over a JSON string field."""
    return parse_ts_best_effort(_jv(path))


def _ts_millis(path: str) -> Column:
    """fromUnixTimestamp64Milli(toInt64OrNull(...)) — epoch-millis field
    (reference 02_kafka_ingest.sql.tmpl:95-96)."""
    return F.timestamp_millis(_jv(path).try_cast("long"))


def _i32(path: str) -> Column:
    return _jv(path).try_cast("int")


def _i64(path: str) -> Column:
    return _jv(path).try_cast("long")


def _f64(path: str) -> Column:
    return _jv(path).try_cast("double")


# ---------------------------------------------------------------------------
# Routing predicates (reference :83-84, :128-129, :261-262)
# ---------------------------------------------------------------------------

def route_suricata(df: DataFrame) -> Column:
    return F.get_json_object("raw", "$.suricata").isNotNull() & _jv(
        "$.event.hash"
    ).isNotNull()


def route_wazuh(df: DataFrame) -> Column:
    return (_jv("$.event.provider") == "wazuh") & _jv("$.event.hash").isNotNull()


def route_zeek(df: DataFrame) -> Column:
    return F.get_json_object("raw", "$.zeek").isNotNull() & _jv(
        "$.event.hash"
    ).isNotNull()


# ---------------------------------------------------------------------------
# Shared fallback chains
# ---------------------------------------------------------------------------

def _sensor_name() -> Column:
    # coalesce(agent.name, host.name, node) — reference :29-33
    return F.coalesce(_jv("$.agent.name"), _jv("$.host.name"), _jv("$.node"))


def _protocol() -> Column:
    # coalesce over 4 paths — reference :46-51
    return F.coalesce(
        _jv("$.network.application"),
        _jv("$.network.transport[0]"),
        _jv("$.network.protocol[0]"),
        _jv("$.protocol[0]"),
    )


def _tags(*fallback_paths: str) -> Column:
    """tags with the reference's ifNull(..., []) fallback cascade."""
    exprs = [
        F.from_json(F.get_json_object("raw", "$.tags"), "array<string>"),
        *[
            F.from_json(F.get_json_object("raw", p), "array<string>")
            for p in fallback_paths
        ],
    ]
    return F.coalesce(*exprs, F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# Extractors — one per stream
# ---------------------------------------------------------------------------

def extract_suricata(df: DataFrame) -> DataFrame:
    """Suricata MV (reference 02_kafka_ingest.sql.tmpl:13-84)."""
    return df.filter(route_suricata(df)).select(
        _jv("$.event.hash").alias("event_id"),
        F.coalesce(_ts_iso("$['@timestamp']"), _ts_iso("$.suricata.timestamp")).alias(
            "event_ts"
        ),
        F.coalesce(_jv("$.event.provider"), _jv("$.event.module")).alias("sensor_type"),
        _sensor_name().alias("sensor_name"),
        F.coalesce(_jv("$.event.dataset"), _jv("$.event.kind")).alias("event_type"),
        F.coalesce(_jv("$.suricata.alert.severity"), _jv("$.event.severity")).alias(
            "severity"
        ),
        _jv("$.source.ip").alias("src_ip"),
        _jv("$.destination.ip").alias("dest_ip"),
        _i32("$.source.port").alias("src_port"),
        _i32("$.destination.port").alias("dest_port"),
        _protocol().alias("protocol"),
        F.coalesce(
            _i64("$.totDataBytes"),
            _i64("$.network.bytes"),
            _i64("$.client.bytes"),
            _i64("$.server.bytes"),
        ).alias("bytes"),
        F.coalesce(
            _i64("$.network.packets"),
            _i64("$.client.packets"),
            _i64("$.server.packets"),
        ).alias("packets"),
        _jv("$.suricata.flow_id").alias("flow_id"),
        F.coalesce(_jv("$.rule.name"), _jv("$.suricata.alert.signature")).alias(
            "signature"
        ),
        _i32("$.rule.id").alias("signature_id"),
        _jv("$.rule.category[0]").alias("category"),
        _jv("$.suricata.alert.action").alias("alert_action"),
        _jv("$.suricata.http.url").alias("http_url"),
        _tags("$.event.severity_tags").alias("tags"),
        F.coalesce(_jv("$.message"), _jv("$.event.original"), _jv("$.rule.name")).alias(
            "message"
        ),
        F.col("raw").alias("raw_data"),
    )


def extract_wazuh(df: DataFrame) -> DataFrame:
    """Wazuh MV (reference 02_kafka_ingest.sql.tmpl:86-129)."""
    return df.filter(route_wazuh(df)).select(
        _jv("$.event.hash").alias("event_id"),
        F.coalesce(
            _ts_iso("$['@timestamp']"),
            _ts_iso("$.event.ingested"),
            _ts_millis("$.event.start"),
            _ts_millis("$.event.end"),
        ).alias("event_ts"),
        _ts_iso("$.event.ingested").alias("event_ingested_ts"),
        _ts_millis("$.event.start").alias("event_start_ts"),
        _ts_millis("$.event.end").alias("event_end_ts"),
        _jv("$.event.dataset").alias("event_dataset"),
        _jv("$.event.kind").alias("event_kind"),
        _jv("$.event.module").alias("event_module"),
        _jv("$.event.provider").alias("event_provider"),
        _jv("$.agent.name").alias("agent_name"),
        _jv("$.agent.ip").alias("agent_ip"),
        _jv("$.host.name").alias("host_name"),
        _jv("$.host.ip").alias("host_ip"),
        _jv("$.rule.id").alias("rule_id"),
        _i32("$.rule.level").alias("rule_level"),
        _jv("$.rule.name").alias("rule_name"),
        # JSONExtractRaw(rule.ruleset) — raw JSON text of the node (:123)
        F.get_json_object("raw", "$.rule.ruleset").alias("rule_ruleset"),
        _tags().alias("tags"),
        F.coalesce(_jv("$.message"), _jv("$.rule.name")).alias("message"),
        F.col("raw").alias("raw_data"),
    )


def extract_zeek(df: DataFrame) -> DataFrame:
    """Zeek MV (reference 02_kafka_ingest.sql.tmpl:131-262) — the widest
    projection; zeek.conn numerics often arrive as strings → try_cast."""
    geo = lambda *paths: F.coalesce(*[_jv(p) for p in paths])  # noqa: E731
    return df.filter(route_zeek(df)).select(
        _jv("$.event.hash").alias("event_id"),
        F.coalesce(
            _ts_iso("$['@timestamp']"),
            _ts_iso("$.zeek.ts"),
            _ts_iso("$.event.ingested"),
            _ts_millis("$.event.start"),
        ).alias("event_ts"),
        _ts_iso("$.event.ingested").alias("event_ingested_ts"),
        _ts_millis("$.event.start").alias("event_start_ts"),
        _ts_millis("$.event.end").alias("event_end_ts"),
        _jv("$.event.dataset").alias("event_dataset"),
        _jv("$.event.kind").alias("event_kind"),
        _jv("$.event.module").alias("event_module"),
        _jv("$.event.provider").alias("event_provider"),
        F.coalesce(_jv("$.zeek.uid"), _jv("$.event.id[0]")).alias("zeek_uid"),
        _sensor_name().alias("sensor_name"),
        _jv("$.source.ip").alias("src_ip"),
        _jv("$.destination.ip").alias("dest_ip"),
        _i32("$.source.port").alias("src_port"),
        _i32("$.destination.port").alias("dest_port"),
        geo(
            "$.source.geo.location.lat", "$.source.geo.latitude",
            "$.destination.geo.location.lat", "$.destination.geo.latitude",
        ).try_cast("double").alias("geo_latitude"),
        geo(
            "$.source.geo.location.lon", "$.source.geo.longitude",
            "$.destination.geo.location.lon", "$.destination.geo.longitude",
        ).try_cast("double").alias("geo_longitude"),
        geo(
            "$.source.geo.country_name", "$.source.geo.country_iso_code",
            "$.source.geo.country_code2", "$.source.geo.country_code3",
            "$.destination.geo.country_name", "$.destination.geo.country_iso_code",
            "$.destination.geo.country_code2", "$.destination.geo.country_code3",
        ).alias("geo_country"),
        geo("$.source.geo.city_name", "$.destination.geo.city_name").alias(
            "geo_city_name"
        ),
        geo("$.source.mac[0]", "$.destination.mac[0]").alias("mac_address"),
        _protocol().alias("protocol"),
        _jv("$.network.application").alias("application"),
        _jv("$.network.type").alias("network_type"),
        _jv("$.network.direction").alias("direction"),
        _jv("$.network.community_id").alias("community_id"),
        F.coalesce(
            _i64("$.totDataBytes"),
            _i64("$.network.bytes"),
            _i64("$.source.bytes"),
            _i64("$.destination.bytes"),
        ).alias("bytes"),
        F.coalesce(
            _i64("$.network.packets"),
            _i64("$.source.packets"),
            _i64("$.destination.packets"),
        ).alias("packets"),
        F.coalesce(
            _i64("$.zeek.conn.orig_bytes"), _i64("$.zeek.conn.orig_ip_bytes")
        ).alias("orig_bytes"),
        F.coalesce(
            _i64("$.zeek.conn.resp_bytes"), _i64("$.zeek.conn.resp_ip_bytes")
        ).alias("resp_bytes"),
        _i64("$.zeek.conn.orig_pkts").alias("orig_pkts"),
        _i64("$.zeek.conn.resp_pkts").alias("resp_pkts"),
        _jv("$.zeek.conn.conn_state").alias("conn_state"),
        _jv("$.zeek.conn.conn_state_description").alias("conn_state_description"),
        _f64("$.zeek.conn.duration").alias("duration"),
        _jv("$.zeek.conn.history").alias("history"),
        F.coalesce(_jv("$.zeek.conn.vlan"), _jv("$.network.vlan.id[0]")).alias(
            "vlan_id"
        ),
        _tags("$.event.category", "$.event.severity_tags").alias("tags"),
        F.coalesce(
            _jv("$.message"),
            _jv("$.event.original"),
            _jv("$.zeek.conn.conn_state_description"),
        ).alias("message"),
        F.col("raw").alias("raw_data"),
    )


def extract_all(df: DataFrame) -> dict[str, DataFrame]:
    """One raw stream → the three typed bronze projections (the reference's
    MV fan-out).  Rows matching no route (or with empty event.hash — the
    reference's required-field guard) are dropped, mirroring
    kafka_skip_broken_messages tolerance (ST2)."""
    return {
        "suricata_events_raw": extract_suricata(df),
        "wazuh_events_raw": extract_wazuh(df),
        "zeek_events_raw": extract_zeek(df),
    }
