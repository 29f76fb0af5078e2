"""Extraction parity against the reference's own sample Kafka payloads
(read at test time from the read-only reference checkout; skipped when it is
absent so the repo stays standalone).

The suricata and zeek samples are wrapped in a Kafka-UI envelope
(``value.payload.<fields>``) while the MVs consume the bare payload
(FIXTURES.md §1) — the test unwraps exactly like the producer would.
"""

from __future__ import annotations

import json
import os

import pytest

from dev_clickhouse_spark.sources import extract_all

REF = "/root/reference/scripts"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _load(name: str) -> str:
    doc = json.load(open(os.path.join(REF, name)))
    if "value" in doc and isinstance(doc["value"], dict) and "payload" in doc["value"]:
        doc = doc["value"]["payload"]  # unwrap the Kafka-UI envelope
    return json.dumps(doc)


def test_reference_payloads_route_and_extract(spark):
    raws = [(_load(f"data-{n}.json"),) for n in ("suricata-1", "wazuh-2", "zeek-3")]
    df = spark.createDataFrame(raws, "raw string")
    out = {k: v.collect() for k, v in extract_all(df).items()}

    assert len(out["suricata_events_raw"]) == 1
    assert len(out["wazuh_events_raw"]) == 1
    assert len(out["zeek_events_raw"]) == 1

    s = out["suricata_events_raw"][0]
    assert s.event_id and s.event_ts is not None
    assert s.sensor_name is not None
    assert s.signature is not None or s.signature_id is not None
    assert isinstance(s.tags, list)

    w = out["wazuh_events_raw"][0]
    assert w.event_id and w.event_ts is not None
    assert w.event_provider == "wazuh"
    assert w.rule_id is not None and w.rule_level is not None
    # rule.ruleset arrives as raw JSON text of the array (JSONExtractRaw)
    assert w.rule_ruleset is None or w.rule_ruleset.startswith("[")

    z = out["zeek_events_raw"][0]
    assert z.event_id and z.event_ts is not None
    assert z.zeek_uid is not None
    # zeek conn numerics that arrive as strings must still be typed
    assert z.orig_pkts is None or isinstance(z.orig_pkts, int)
    assert z.duration is None or isinstance(z.duration, float)
