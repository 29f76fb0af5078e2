"""ClickHouse URL-function family over Spark's JVM-native ``parse_url``.

ClickHouse ships ~40 URL helpers (domain, topLevelDomain, path,
queryString, extractURLParameter, cutQueryString, …) that BI queries over
web/event data lean on.  Spark's ``parse_url`` expression is the same
capability (HOST/PATH/QUERY/REF parts + per-parameter extraction),
evaluated inside whole-stage codegen — these wrappers just pin the
ClickHouse names and edge-case conventions (empty string → NULL handling
differs between the engines; ClickHouse returns '' where Spark returns
NULL, and callers here get Spark's NULL-first discipline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def domain(url) -> Column:
    """ClickHouse ``domain(url)``: the hostname, no scheme/port/path."""
    return F.parse_url(_c(url), F.lit("HOST"))


def top_level_domain(url) -> Column:
    """ClickHouse ``topLevelDomain(url)``: the last dot-label of the host."""
    return F.regexp_extract(domain(url), r"\.([^.]+)$", 1)


def url_path(url) -> Column:
    """ClickHouse ``path(url)``: the path component, query excluded."""
    return F.parse_url(_c(url), F.lit("PATH"))


def query_string(url) -> Column:
    """ClickHouse ``queryString(url)`` (no leading '?')."""
    return F.parse_url(_c(url), F.lit("QUERY"))


def extract_url_parameter(url, name: str) -> Column:
    """ClickHouse ``extractURLParameter(url, name)``."""
    return F.parse_url(_c(url), F.lit("QUERY"), F.lit(name))


def cut_query_string(url) -> Column:
    """ClickHouse ``cutQueryString(url)``: the URL up to (excluding) '?'."""
    u = _c(url)
    return F.when(
        F.instr(u, "?") > 0, F.substring_index(u, "?", 1)
    ).otherwise(u)
