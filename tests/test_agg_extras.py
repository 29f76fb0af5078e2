from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.io import load_table
from dev_clickhouse_spark.queries.agg_extras import approx_distinct_daily_users


def test_approx_distinct_within_error_bound(spark):
    sf = "/root/testdata/sf0.001"
    approx = {
        r.event_date: r.approx_users
        for r in approx_distinct_daily_users(spark, sf).collect()
    }
    exact = {
        r.event_date: r.users
        for r in load_table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for d, e in exact.items():
        assert abs(approx[d] - e) <= max(2, 0.1 * e), (d, approx[d], e)
