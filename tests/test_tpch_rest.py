"""Semantic checks for the TPC-H completion pack (tpch_rest.py).

The oracle gate proves Spark≡DuckDB; these tests pin the *semantics* the
SQL is supposed to have, via independent brute-force recomputation on
sf0.001, so an oracle bug that mirrored a mistake on both sides would
still be caught.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dev_clickhouse_spark.io import load_table
from dev_clickhouse_spark.queries.tpch_rest import (
    q6_forecast_revenue,
    q11_balance_concentration,
    q13_order_count_distribution,
    q21_sole_late_supplier,
    q22_dormant_customers,
)

SF = "/root/testdata/sf0.001"


def test_q6_matches_python_brute_force(spark):
    rows = load_table(spark, SF, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    ).collect()
    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1)
    expect = sum(
        r.l_extendedprice * r.l_discount
        for r in rows
        if lo <= r.l_shipdate < hi
        and 0.05 <= r.l_discount <= 0.07
        and r.l_quantity < 24
    )
    got = q6_forecast_revenue(spark, SF).collect()[0].revenue_delta
    assert abs(got - expect) < 0.02


def test_q11_groups_exceed_threshold(spark):
    supp = load_table(spark, SF, "supplier")
    total = supp.agg(F.sum("s_acctbal")).collect()[0][0]
    out = q11_balance_concentration(spark, SF).collect()
    assert out, "threshold should keep at least one nation"
    for r in out:
        assert r.nation_balance > total * 0.041 - 0.01


def test_q13_histogram_accounts_for_every_customer(spark):
    n_cust = load_table(spark, SF, "customer").count()
    hist = q13_order_count_distribution(spark, SF).collect()
    assert sum(r.custdist for r in hist) == n_cust
    # the ON-clause filter must keep zero-order customers only if they exist;
    # every count bucket is non-negative and custdist positive by construction
    assert all(r.c_count >= 0 and r.custdist > 0 for r in hist)


def test_q21_supplier_is_sole_late_one(spark):
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    late = (
        li.join(orders.filter(F.col("o_orderstatus") == "F"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey").distinct().collect()
    )
    all_pairs = li.select("l_orderkey", "l_suppkey").distinct().collect()
    by_order: dict[int, set[int]] = {}
    for r in all_pairs:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    late_by_order: dict[int, set[int]] = {}
    for r in late:
        late_by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    expect: dict[int, int] = {}
    for ok, late_supps in late_by_order.items():
        for s in late_supps:
            if len(by_order[ok]) > 1 and late_supps == {s}:
                expect[s] = expect.get(s, 0) + 1
    supp_name = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, SF, "supplier").collect()
    }
    want = {}
    for s, n in expect.items():
        want[supp_name[s]] = n
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.s_name, r.numwait) for r in q21_sole_late_supplier(spark, SF).collect()]
    assert got == top


def test_q22_customers_have_no_recent_orders(spark):
    out = {r.c_nationkey: r.numcust for r in q22_dormant_customers(spark, SF).collect()}
    cust = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    )
    recent = {
        r.o_custkey
        for r in orders.filter(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        ).select("o_custkey").collect()
    }
    expect: dict[int, int] = {}
    for r in cust.collect():
        if r.c_acctbal > avg_bal and r.c_custkey not in recent:
            expect[r.c_nationkey] = expect.get(r.c_nationkey, 0) + 1
    assert out == expect
