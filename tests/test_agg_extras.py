from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.io import load_table
from dev_clickhouse_spark.queries.agg_extras import approx_distinct_daily_users


def test_approx_distinct_within_error_bound(spark):
    sf = "/root/testdata/sf0.001"
    rows = {
        r.event_date: r for r in approx_distinct_daily_users(spark, sf).collect()
    }
    exact = {
        r.event_date: r.users
        for r in load_table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(rows) == set(exact)
    for d, e in exact.items():
        assert rows[d].exact_users == e
        # the in-plan HLL-vs-exact contract held on every day
        assert rows[d].within_rsd_bound == 1, (d, e)


def test_stats_moments_match_native_aggregates(spark):
    """The exact-decimal moment formulas must agree with Spark's native
    var_samp/stddev_samp/covar_samp/corr to floating tolerance."""
    from dev_clickhouse_spark.queries.agg_extras import stats_moments_by_returnflag

    sf = "/root/testdata/sf0.001"
    got = {r.l_returnflag: r for r in stats_moments_by_returnflag(spark, sf).collect()}
    native = {
        r.l_returnflag: r
        for r in load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.var_samp("l_quantity").alias("v"),
            F.stddev_samp("l_extendedprice").alias("s"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("c"),
            F.corr("l_quantity", "l_extendedprice").alias("r"),
        )
        .collect()
    }
    assert set(got) == set(native)
    for k, n in native.items():
        g = got[k]
        assert abs(g.var_qty - n.v) < 1e-3
        assert abs(g.std_price - n.s) < 1e-3
        assert abs(g.covar_qty_price - n.c) < 1e-3
        assert abs(g.corr_qty_price - n.r) < 1e-5


def test_histogram_degenerate_domain_single_bin(spark, tmp_path):
    """ADVICE r6: when every value is equal (hi == lo) the bin width is 0;
    the guard must collapse to ONE bin 0 with bin_lower == lo instead of
    NaN/null bins, and the DuckDB oracle must agree."""
    import datetime as dt

    import duckdb

    from dev_clickhouse_spark.queries import REGISTRY

    rows = [
        (i, dt.datetime(2026, 1, 1, 0, 0, i), i % 3, "view", 42.0, "{}")
        for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = REGISTRY["histogram_event_values"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].bin == 0 and got[0].bin_lower == 42.0 and got[0].n == 7

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    oracle = con.execute(REGISTRY["histogram_event_values"].oracle).fetchall()
    assert oracle == [(0, 42.0, 7)]


def test_misra_gries_hot_key_survives_small_capacity(spark):
    """Eviction mechanics under genuine skew: with capacity m=8 and 100
    distinct cold keys, the hot key (50% of the stream) must survive in
    every partition, its merged lower bound must never exceed the true
    count (MG underestimates), and the survivor set must respect the
    capacity bound per partition."""
    from dev_clickhouse_spark.queries.agg_extras import misra_gries_sketch

    n_cold, reps = 100, 6
    rows = [(999,) for _ in range(n_cold * reps)]  # hot: 600 occurrences
    rows += [(i, ) for i in range(n_cold) for _ in range(reps)]  # cold: 6 each
    df = spark.createDataFrame(rows, "user_id long").repartition(4)
    sketch = {r.user_id: r.lb for r in
              misra_gries_sketch(df, "user_id", m=8).collect()}
    assert 999 in sketch                      # freq 0.5 >> 1/(m+1)
    assert sketch[999] <= n_cold * reps       # lower bound, never over
    assert sketch[999] >= n_cold * reps - (n_cold * reps * 2) // 9
    assert len(sketch) <= 8 * 4               # capacity x partitions
