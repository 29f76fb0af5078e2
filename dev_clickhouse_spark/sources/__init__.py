from .json_events import (  # noqa: F401
    extract_all,
    extract_suricata,
    extract_wazuh,
    extract_zeek,
    route_suricata,
    route_wazuh,
    route_zeek,
)
