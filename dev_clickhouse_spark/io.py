"""Batch IO for the driver test tables and generic sources/sinks.

The reference's scan surface (SURVEY.md §2.1): MergeTree partitioned tables
(S3) → partitioned parquet here; federated postgresql() scans (S6) → JDBC;
INSERT…SELECT sinks (S5) → ``write_partitioned``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

#: Columns stored as parquet TIMESTAMP(NANOS) in the driver test data; Spark
#: reads them as epoch-nano longs (spark.sql.legacy.parquet.nanosAsLong) and we
#: convert to TimestampType via integer division (no float round-trip — epoch
#: nanos exceed double's 2^53 integer range).
NANO_TS_COLUMNS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}

TEST_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table with timestamps normalized to TimestampType."""
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in NANO_TS_COLUMNS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the DuckDB oracle)."""
    for name in TEST_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Federated foreign scan — reference S6: the ``postgresql(...)`` table
    function used by backfill scripts (reference
    scripts/postgres_to_clickhouse_backfill.sql:47-54).  Parallel reads via
    range-partitioned JDBC when a numeric partition column is supplied.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — pre-shuffled storage for co-located joins.

    Two tables bucketed identically on their join key sort-merge-join with
    ZERO exchange (the big-fact ↔ big-fact case where neither side
    broadcasts); aggregations on the bucket key also skip their shuffle.
    This is the Spark equivalent of engine-side co-partitioning the reference
    gets from MergeTree ORDER BY locality.  Size ``num_buckets`` so one
    bucket ≈ one task's memory budget at the target scale.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] = "event_date",
    mode: str = "append",
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Partitioned parquet sink — reference S3: bronze/gold MergeTree tables
    ``PARTITION BY toDate(event_ts) ORDER BY (event_ts, event_id)``
    (reference clickhouse/init/01_bronze_tables.sql:25-27).

    Partition dirs give Catalyst partition pruning for windowed ELT; sorting
    within partitions gives parquet min/max row-group stats, approximating the
    MergeTree primary-key skip index (SURVEY.md §4).
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    df.write.mode(mode).partitionBy(*cols).parquet(path)
