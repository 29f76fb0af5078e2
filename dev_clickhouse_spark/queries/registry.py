"""Query registry: named (Spark callable, DuckDB oracle SQL) pairs.

Every implemented operator from SURVEY.md §2 registers here; the driver
contract (__spark_entry__.queries / oracle_sql) is generated from this
registry.  Conventions that keep the driver's order-insensitive value-hash
stable between Spark and DuckDB:

- alias every computed column identically in both (driver sorts columns by
  name before hashing);
- round doubles (sums → 2dp, averages/ratios → 4-6dp) in BOTH engines;
- cast DuckDB integer aggregates to BIGINT (its sum() yields INT128);
- emit timestamps as formatted strings ('%Y-%m-%d %H:%M:%S.%f' ≡
  'yyyy-MM-dd HH:mm:ss.SSSSSS') or DATE — never raw timestamps;
- every LIMIT carries a full deterministic tie-break ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: list[str] | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query callable."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(
            fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags or []
        )
        return fn

    return deco
