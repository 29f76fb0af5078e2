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


def test_misra_gries_weighted_hot_key_survives(spark):
    """Weighted eviction mechanics under skew: with capacity m=8, a key
    carrying 50% of the total WEIGHT must survive even though it appears
    in only 1% of the rows (frequency-based MG would evict it); the merged
    lower bound never exceeds the true weight; survivors respect the
    capacity bound."""
    from dev_clickhouse_spark.queries.agg_extras import (
        misra_gries_weighted_sketch,
    )

    # hot: 8 rows x weight 1000 = 8000; cold: 100 keys x 8 rows x weight 10
    rows = [(999, 1000) for _ in range(8)]
    rows += [(i, 10) for i in range(100) for _ in range(8)]
    df = spark.createDataFrame(rows, "user_id long, w long").repartition(4)
    sketch = {
        r.user_id: r.lb
        for r in misra_gries_weighted_sketch(df, "user_id", "w", m=8).collect()
    }
    true_hot = 8 * 1000
    assert 999 in sketch
    assert sketch[999] <= true_hot            # lower bound, never over
    assert sketch[999] >= true_hot - (true_hot + 8000) // 9  # W/(m+1) slack
    assert len(sketch) <= 8 * 4               # capacity x partitions
    # zero/negative weights are ignored, not counted
    df2 = spark.createDataFrame(
        [(1, 0), (1, -5), (1, 7)], "user_id long, w long"
    ).coalesce(1)
    s2 = {
        r.user_id: r.lb
        for r in misra_gries_weighted_sketch(df2, "user_id", "w", m=8).collect()
    }
    assert s2 == {1: 7}


def test_group_array_ordering_cap_and_uniq(spark, tmp_path):
    """groupArray parity: the sequence is time-ordered regardless of input
    order, the groupArray(10) prefix caps at 10, and groupUniqArray is the
    sorted distinct set."""
    import datetime as dt

    types = ["view", "click", "buy", "view", "view", "click",
             "scroll", "buy", "view", "click", "scroll", "exit"]
    rows = [
        (i, dt.datetime(2026, 1, 1, 0, 0, i), 7, types[i], 1.0, "{}")
        for i in range(12)
    ]
    rows.reverse()  # insertion order is the REVERSE of time order
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    df.repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    from dev_clickhouse_spark.queries.agg_extras import group_array_user_events

    got = group_array_user_events(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.event_seq == ",".join(types)
    assert r.first10_seq == ",".join(types[:10])
    assert r.uniq_types == "buy,click,exit,scroll,view"
    assert r.n_events == 12


def test_bit_agg_and_uniq_up_to_values(spark, tmp_path):
    """groupBitAnd/Or/Xor spot values and the uniqUpTo(5) cap + overflow."""
    import datetime as dt

    rows = [
        # type "a": event_ids 1,2,4 over 7 distinct users -> overflow
        (1, dt.datetime(2026, 1, 1), 1, "a", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 1), 2, "a", 1.0, "{}"),
        (4, dt.datetime(2026, 1, 1), 3, "a", 1.0, "{}"),
        (8, dt.datetime(2026, 1, 1), 4, "a", 1.0, "{}"),
        (16, dt.datetime(2026, 1, 1), 5, "a", 1.0, "{}"),
        (32, dt.datetime(2026, 1, 1), 6, "a", 1.0, "{}"),
        (64, dt.datetime(2026, 1, 1), 7, "a", 1.0, "{}"),
        # type "b": event_ids 5,6 over 2 distinct users -> no overflow
        (5, dt.datetime(2026, 1, 1), 1, "b", 1.0, "{}"),
        (6, dt.datetime(2026, 1, 1), 2, "b", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from dev_clickhouse_spark.queries.agg_extras import (
        bit_agg_by_event_type,
        uniq_up_to_users,
    )

    bits = {r.event_type: r for r in bit_agg_by_event_type(spark, str(tmp_path)).collect()}
    assert (bits["a"].band, bits["a"].bor, bits["a"].bxor) == (0, 127, 127)
    assert (bits["b"].band, bits["b"].bor, bits["b"].bxor) == (4, 7, 3)

    uniq = {r.event_type: r for r in uniq_up_to_users(spark, str(tmp_path)).collect()}
    assert (uniq["a"].uniq_up_to_5, uniq["a"].overflowed) == (6, 1)
    assert (uniq["b"].uniq_up_to_5, uniq["b"].overflowed) == (2, 0)


def test_grouping_sets_flags_hand_case(spark, tmp_path):
    """grouping() must tell an aggregation-produced NULL apart from a
    natural NULL: a row whose c_mktsegment IS NULL in the data appears in
    the (segment) set with g_seg=0, while the () grand-total row has all
    three flags = 1."""
    import datetime as dt

    from dev_clickhouse_spark.queries.agg_extras import grouping_sets_with_ids

    orders = spark.createDataFrame(
        [(1, 1, dt.date(1995, 3, 1), "1-URGENT", 10.0),
         (2, 1, dt.date(1995, 7, 1), "2-HIGH", 20.0),
         (3, 2, dt.date(1996, 1, 1), "1-URGENT", 30.0)],
        "o_orderkey long, o_custkey long, o_orderdate date, "
        "o_orderpriority string, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, None)],
        "c_custkey long, c_mktsegment string",
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    rows = grouping_sets_with_ids(spark, str(tmp_path)).collect()
    # grand total: all flags 1, counts every joined row
    total = [r for r in rows if (r.g_year, r.g_prio, r.g_seg) == (1, 1, 1)]
    assert len(total) == 1 and total[0].cnt == 3

    # (year, priority) set: g_year=g_prio=0, g_seg=1
    yp = {(r.year, r.o_orderpriority): r.cnt for r in rows
          if (r.g_year, r.g_prio, r.g_seg) == (0, 0, 1)}
    assert yp == {(1995, "1-URGENT"): 1, (1995, "2-HIGH"): 1,
                  (1996, "1-URGENT"): 1}

    # (segment) set: the NULL segment is a NATURAL null (g_seg=0), distinct
    # from any aggregation null — this is the disambiguation the flags buy
    seg = {r.c_mktsegment: r.cnt for r in rows
           if (r.g_year, r.g_prio, r.g_seg) == (1, 1, 0)}
    assert seg == {"BUILDING": 2, None: 1}
    assert len(rows) == 1 + 3 + 2
