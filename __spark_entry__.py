"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``dev_clickhouse_spark.queries`` (the registry maps
SURVEY.md §2 operator IDs to implementations + DuckDB oracles); this module
just adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star-join revenue rollup
    (five broadcast dims around the lineitem fact) — the reference's BI
    star-join shape (scripts/clickhouse_examples.sql:21-29) at its widest."""
    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import tune

    tune(spark)
    return REGISTRY["q5_nation_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dev_clickhouse_spark.queries import REGISTRY

    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    from dev_clickhouse_spark.queries import REGISTRY

    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
