"""SparkSession factory and runtime tuning.

The reference pins every timestamp to Asia/Jakarta (reference
clickhouse/init/01_bronze_tables.sql:3, README.md:74).  We keep the *session*
timezone UTC so that parquet test data and the DuckDB oracle agree on wall
clocks, and make Jakarta semantics explicit where the SIEM layer needs them
(see functions.ch_compat.JAKARTA_TZ).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Timezone every reference table is declared in (01_bronze_tables.sql:3).
JAKARTA_TZ = "Asia/Jakarta"

# Runtime-settable SQL confs applied to any session we are handed (the driver
# owns the session in verify runs — these are all runtime-safe).
_RUNTIME_CONF = {
    # Driver test parquet uses TIMESTAMP(NANOS) which Spark cannot map to a
    # timestamp type natively; read as epoch-nanos longs, converted in io.py.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock agreement with the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce post-shuffle partitions, skew-join split.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDFs / toPandas in the llm ops.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on this build — keep going; get_spark sets it at build.
            pass
    return spark


def get_spark(
    app_name: str = "dev-clickhouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned SparkSession.

    Defaults follow the driver environment: ``local[$SPARK_GRAFT_CPUS]``;
    on a real cluster master/memory come from spark-submit.

    Shuffle parallelism defaults to a 256-partition CEILING (never below
    the core count) with AQE coalescing sizing each post-shuffle stage to
    ~64 MB at runtime.  A bare core-count partition count keeps task waves
    minimal but makes per-task shuffle/sort state grow linearly with the
    data on a fixed box — round-8 scale rehearsals measured the heaviest
    dedup verify going spill-borderline at ×50 under it (bimodal 25 s/60 s
    run-to-run), while a count scaled with the data pays ~2× task-wave
    overhead at ×30.  The ceiling-plus-AQE form beat both at every factor
    (ngram ×50 28.3 s vs 60 s slow-mode; minhash ×30 10.9 s vs 21.3 s @96
    fixed) and is neutral at sf0.1, where AQE coalesces right back down to
    a handful of post-shuffle partitions.  This is the same sizing rule a
    real cluster follows: provision partitions for the data volume and let
    AQE shrink small stages, rather than pinning partitions to cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    default_parts = max(int(cpus), 256)
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or default_parts),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
