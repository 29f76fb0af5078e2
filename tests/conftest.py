from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from dev_clickhouse_spark.session import tune


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("dev-clickhouse-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    tune(s)
    yield s
    s.stop()
