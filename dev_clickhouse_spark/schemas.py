"""Declared schemas for the SIEM lakehouse tables (SURVEY.md §1).

Bronze mirrors reference clickhouse/init/01_bronze_tables.sql:1-98; gold
mirrors 03_gold_tables.sql:1-224.  ClickHouse→Spark type mapping per
SURVEY.md §1.2: DateTime64(3) → TimestampType (stored as UTC instants;
Jakarta wall-clock is applied where the reference applies toTimeZone),
IPv6 → canonical StringType, UInt64 hash keys → LongType (signed — only
equality is ever used), Array(String) → ArrayType(StringType).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType())


def _ts(name: str) -> T.StructField:
    return T.StructField(name, T.TimestampType())


def _i(name: str) -> T.StructField:
    return T.StructField(name, T.IntegerType())


def _l(name: str) -> T.StructField:
    return T.StructField(name, T.LongType())


def _d(name: str) -> T.StructField:
    return T.StructField(name, T.DoubleType())


def _arr(name: str) -> T.StructField:
    return T.StructField(name, T.ArrayType(T.StringType()))


# --- bronze (01_bronze_tables.sql) -----------------------------------------

BRONZE_SURICATA = T.StructType([
    _s("event_id"), _ts("event_ts"), _s("sensor_type"), _s("sensor_name"),
    _s("event_type"), _s("severity"), _s("src_ip"), _s("dest_ip"),
    _i("src_port"), _i("dest_port"), _s("protocol"), _l("bytes"), _l("packets"),
    _s("flow_id"), _s("signature"), _i("signature_id"), _s("category"),
    _s("alert_action"), _s("http_url"), _arr("tags"), _s("message"),
    _s("raw_data"),
])

BRONZE_WAZUH = T.StructType([
    _s("event_id"), _ts("event_ts"), _ts("event_ingested_ts"),
    _ts("event_start_ts"), _ts("event_end_ts"), _s("event_dataset"),
    _s("event_kind"), _s("event_module"), _s("event_provider"),
    _s("agent_name"), _s("agent_ip"), _s("host_name"), _s("host_ip"),
    _s("rule_id"), _i("rule_level"), _s("rule_name"), _s("rule_ruleset"),
    _arr("tags"), _s("message"), _s("raw_data"),
])

BRONZE_ZEEK = T.StructType([
    _s("event_id"), _ts("event_ts"), _ts("event_ingested_ts"),
    _ts("event_start_ts"), _ts("event_end_ts"), _s("event_dataset"),
    _s("event_kind"), _s("event_module"), _s("event_provider"),
    _s("zeek_uid"), _s("sensor_name"), _s("src_ip"), _s("dest_ip"),
    _i("src_port"), _i("dest_port"), _d("geo_latitude"), _d("geo_longitude"),
    _s("geo_country"), _s("geo_city_name"), _s("mac_address"), _s("protocol"),
    _s("application"), _s("network_type"), _s("direction"), _s("community_id"),
    _l("bytes"), _l("packets"), _l("orig_bytes"), _l("resp_bytes"),
    _l("orig_pkts"), _l("resp_pkts"), _s("conn_state"),
    _s("conn_state_description"), _d("duration"), _s("history"), _s("vlan_id"),
    _arr("tags"), _s("message"), _s("raw_data"),
])

BRONZE_SCHEMAS = {
    "suricata_events_raw": BRONZE_SURICATA,
    "wazuh_events_raw": BRONZE_WAZUH,
    "zeek_events_raw": BRONZE_ZEEK,
}

# --- gold (03_gold_tables.sql) ---------------------------------------------

DIM_DATE = T.StructType([
    _i("date_key"), T.StructField("date", T.DateType()), _i("year"),
    _i("quarter"), _i("month"), _i("day"), _i("week_of_year"),
    _i("day_of_week"), _ts("updated_at"),
])

DIM_TIME = T.StructType([
    _i("time_key"), _i("hour"), _i("minute"), _i("second"), _ts("updated_at"),
])

DIM_EVENT = T.StructType([
    _l("event_key"), _s("event_dataset"), _s("event_kind"), _s("event_module"),
    _s("event_provider"), _ts("updated_at"),
])

DIM_SENSOR = T.StructType([
    _l("sensor_key"), _s("sensor_type"), _s("sensor_name"), _ts("updated_at"),
])

DIM_SIGNATURE = T.StructType([
    _l("signature_key"), _i("signature_id"), _s("signature"), _s("category"),
    _s("alert_action"), _ts("updated_at"),
])

DIM_PROTOCOL = T.StructType([_l("protocol_key"), _s("protocol"), _ts("updated_at")])

DIM_TAG = T.StructType([_l("tag_key"), _s("tag_value"), _ts("updated_at")])

DIM_AGENT = T.StructType([
    _l("agent_key"), _s("agent_name"), _s("agent_ip"), _ts("effective_from"),
    _ts("effective_to"), _i("is_current"),
])

DIM_HOST = T.StructType([
    _l("host_key"), _s("host_name"), _s("host_ip"), _ts("effective_from"),
    _ts("effective_to"), _i("is_current"),
])

DIM_RULE = T.StructType([
    _l("rule_key"), _s("rule_id"), _i("rule_level"), _s("rule_name"),
    _s("rule_ruleset"), _ts("effective_from"), _ts("effective_to"),
    _i("is_current"),
])

FACT_WAZUH = T.StructType([
    _s("event_id"), _ts("event_ts"), _ts("event_ingested_ts"),
    _ts("event_start_ts"), _ts("event_end_ts"), _i("date_key"), _i("time_key"),
    _l("agent_key"), _l("host_key"), _l("rule_key"), _l("event_key"),
    _d("lag_seconds"), _d("duration_seconds"), _s("message"), _ts("updated_at"),
])

FACT_SURICATA = T.StructType([
    _s("event_id"), _ts("event_ts"), _i("date_key"), _i("time_key"),
    _l("sensor_key"), _l("signature_key"), _l("protocol_key"), _s("event_type"),
    _s("severity"), _s("src_ip"), _s("dest_ip"), _i("src_port"), _i("dest_port"),
    _l("bytes"), _l("packets"), _s("flow_id"), _s("http_url"), _s("message"),
    _ts("updated_at"),
])

FACT_ZEEK = T.StructType([
    _s("event_id"), _ts("event_ts"), _ts("event_ingested_ts"),
    _ts("event_start_ts"), _ts("event_end_ts"), _i("date_key"), _i("time_key"),
    _l("sensor_key"), _l("protocol_key"), _l("event_key"), _s("zeek_uid"),
    _s("src_ip"), _s("dest_ip"), _i("src_port"), _i("dest_port"),
    _d("geo_latitude"), _d("geo_longitude"), _s("geo_country"),
    _s("geo_city_name"), _s("mac_address"), _s("application"),
    _s("network_type"), _s("direction"), _s("community_id"), _l("bytes"),
    _l("packets"), _l("orig_bytes"), _l("resp_bytes"), _l("orig_pkts"),
    _l("resp_pkts"), _s("conn_state"), _s("conn_state_description"),
    _d("duration_seconds"), _s("history"), _s("vlan_id"), _s("message"),
    _ts("updated_at"),
])

BRIDGE_EVENT_TAG = T.StructType([
    _s("event_id"), _ts("event_ts"), _l("tag_key"), _ts("updated_at"),
])

GOLD_SCHEMAS = {
    "dim_date": DIM_DATE,
    "dim_time": DIM_TIME,
    "dim_event": DIM_EVENT,
    "dim_sensor": DIM_SENSOR,
    "dim_signature": DIM_SIGNATURE,
    "dim_protocol": DIM_PROTOCOL,
    "dim_tag": DIM_TAG,
    "dim_agent": DIM_AGENT,
    "dim_host": DIM_HOST,
    "dim_rule": DIM_RULE,
    "fact_wazuh_events": FACT_WAZUH,
    "fact_suricata_events": FACT_SURICATA,
    "fact_zeek_events": FACT_ZEEK,
    "bridge_wazuh_event_tag": BRIDGE_EVENT_TAG,
    "bridge_suricata_event_tag": BRIDGE_EVENT_TAG,
    "bridge_zeek_event_tag": BRIDGE_EVENT_TAG,
}


# -- training-corpus tables (streaming corpus builder, llm/dedup inline) ----

CORPUS_DOCUMENTS = T.StructType([
    _l("doc_id"), _s("text"), _s("lang"), _s("source"), _l("n_chars"),
])

CORPUS_BAND_INDEX = T.StructType([
    _l("doc_id"),
    T.StructField("band", T.IntegerType()),
    _s("band_hash"),
])

CORPUS_REJECTS = T.StructType([
    _l("doc_id"), _s("text"), _l("matched_doc_id"),
    T.StructField("jaccard", T.DoubleType()),
    _s("reject_kind"),  # 'corpus_near_dup' | 'batch_near_dup' | 'batch_exact'
])

CORPUS_SCHEMAS = {
    "corpus_documents": CORPUS_DOCUMENTS,
    "corpus_band_index": CORPUS_BAND_INDEX,
    "corpus_rejects": CORPUS_REJECTS,
}
