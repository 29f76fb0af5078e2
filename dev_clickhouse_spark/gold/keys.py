"""Surrogate-key derivations shared by dim builds and fact lookups.

The reference recomputes every hash key from natural columns on BOTH sides of
every join (e.g. dim_sensor.sql:17 vs fact_suricata_events.sql:57-67), so the
only correctness requirement is that canonicalization is identical everywhere
— these helpers are that single source of truth (SURVEY.md §2.8 hash note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.ch_compat import surrogate_key


def sensor_key(sensor_type: Column | str, sensor_name: Column | str) -> Column:
    """cityHash64(ifNull(sensor_type,''), ifNull(sensor_name,'')) —
    dim_sensor.sql:17."""
    return surrogate_key(sensor_type, sensor_name)


def signature_key(
    signature_id: Column | str,
    signature: Column | str,
    category: Column | str,
    alert_action: Column | str,
) -> Column:
    """cityHash64(ifNull(signature_id,-1), ifNull(signature,''), …) —
    dim_signature.sql:21-26.  The -1 numeric sentinel is preserved so a NULL id
    cannot collide with an empty-string id."""
    sid = F.coalesce(
        (F.col(signature_id) if isinstance(signature_id, str) else signature_id).cast(
            "string"
        ),
        F.lit("-1"),
    )
    return surrogate_key(sid, signature, category, alert_action)


def protocol_key(protocol: Column | str) -> Column:
    """cityHash64(ifNull(protocol,'')) — dim_protocol.sql:15."""
    return surrogate_key(protocol)


def event_key(
    event_dataset: Column | str,
    event_kind: Column | str,
    event_module: Column | str,
    event_provider: Column | str,
) -> Column:
    """cityHash64 over the 4 event descriptors — dim_event.sql:21-26."""
    return surrogate_key(event_dataset, event_kind, event_module, event_provider)


def tag_key(tag_value: Column | str) -> Column:
    """cityHash64(tag_value) — dim_tag.sql:15 (tag_value is guarded non-empty)."""
    return surrogate_key(tag_value)
