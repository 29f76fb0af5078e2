"""Remaining TPC-H query shapes (q6, q8-q11, q13, q16, q17, q19-q22).

The driver's tables are a simplified TPC-H (no partsupp, no
commit/receipt dates, no phone/container/comment columns), so each query
keeps the *operator shape* that makes the original interesting — the
disjunctive pushdown of q19, the double-correlated EXISTS/NOT-EXISTS of
q21, the left-outer histogram-of-histogram of q13 — re-keyed onto the
columns that exist.  Together with q1/q3/q5/q7/q12/q14/q15/q18 (analytics.py)
and the q2/q4 shapes (correlated_min_price_part, order_priority_check) this
completes the classic BI suite the reference's warehouse serves
(scripts/superset_sql_examples.sql:1-29 runs exactly these join/agg shapes).

Scale notes: every query here is a fact-side shuffle on its natural key
with true dims (nation/region/supplier/part — bounded at any sf) broadcast
and fact-scaling tables (orders/customer/lineitem) left to AQE.  Scalar
subqueries materialize to one row and broadcast; correlated predicates
become aggregate-then-join on the correlation key (one extra shuffle, no
per-row subquery execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


def _r(expr: str, scale: int) -> str:
    m = 10 ** scale
    return f"floor(({expr}) * {m} + 0.5) / {m}"


# ---------------------------------------------------------------------------
# q6: pure filter + scalar aggregate — the pushdown showcase
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {_r('sum(l_extendedprice * l_discount)', 2)} AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=["A6", "P1", "pushdown"],
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6: no join, no group key — all three predicates reach the
    parquet scan (PushedFilters) and the aggregate is a two-level partial;
    the whole query is one map stage plus a single-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue_delta"))
    )


# ---------------------------------------------------------------------------
# q8: market share — 6-table star, conditional aggregate by year
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       {_r('''sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
              / sum(volume)''', 6)} AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) GROUP BY o_year
""",
    tags=["J5", "A8", "conditional-agg"],
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8: one nation's revenue share inside one region's customer
    base, per year.  The customer-side region restriction broadcasts down
    to a semi-filter before the fact shuffle (nation/region are bounded);
    the supplier-side lookup scales with SF, so AQE picks its strategy —
    auto-broadcast while supplier is small, shuffled join at corpus scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp = load_table(spark, sf_dir, "supplier")

    asia_nations = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cust_nk"))
    )
    supp_nation = (
        supp.join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cust_nk"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"),
                vol.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(rnd(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                  .otherwise(F.lit(0.0))) / F.sum("volume"), 6).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# q9: product-type profit by nation × year — LIKE filter on the part dim
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    oracle=f"""
SELECT nation, o_year,
       {_r('CAST(sum(volume) AS DOUBLE)', 2)} AS profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST({_r('l_extendedprice * (1 - l_discount)', 4)} AS DECIMAL(18,4)) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) GROUP BY nation, o_year
""",
    tags=["J5", "A2", "like-pushdown"],
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 (sans partsupp cost side): the part LIKE filter keeps a
    constant ~1/8 fraction of a table that grows with SF, so the
    semi-reduction of lineitem before the orders shuffle is left to AQE
    (auto-broadcast when it fits, shuffled join beyond).

    The per-group sum rides DECIMAL(18,4): a plain double sum is
    order-dependent in its last ulp and this query's 1997 group lands
    exactly on a .xx5 rounding boundary, so each row's volume is rounded
    to 4dp (floor-form, deterministic on identical doubles) and summed
    exactly; only the final 2dp round happens in double space."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = supp.join(F.broadcast(nation),
                            F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        li.join(part.filter(F.col("p_name").like("%widget%")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("int").alias("o_year"),
                rnd(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                .cast("decimal(18,4)").alias("volume"))
        .groupBy("nation", "o_year")
        .agg(rnd(F.sum("volume").cast("double"), 2).alias("profit"))
    )


# ---------------------------------------------------------------------------
# q10: returned-item report — quarter window, top-20 customers by lost revenue
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       {_r("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
       {_r('c_acctbal', 2)} AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=["J5", "O1", "A2"],
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10: which customers returned the most revenue last quarter.
    Both fact filters (quarter on orders, returnflag on lineitem) are
    scan-level; the star closes with a broadcast nation and a
    TakeOrderedAndProject top-20."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                rnd("c_acctbal", 2).alias("acctbal"), "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q11: concentration — group HAVING vs a global scalar subquery
# ---------------------------------------------------------------------------

@register(
    "q11_balance_concentration",
    oracle=f"""
SELECT n_name, {_r('sum(s_acctbal)', 2)} AS nation_balance
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) * 0.041 FROM supplier)
""",
    tags=["A6", "J7", "scalar-subquery", "having"],
)
def q11_balance_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape (partsupp value → supplier balance): per-group sum
    filtered against a fraction of the global sum.  The global scalar is a
    1-row broadcast, so the HAVING costs no second shuffle."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("bal"))
    )
    total = supp.agg((F.sum("s_acctbal") * F.lit(0.041)).alias("threshold"))
    return (
        per_nation.join(F.broadcast(total), F.col("bal") > F.col("threshold"))
        .select("n_name", rnd("bal", 2).alias("nation_balance"))
    )


# ---------------------------------------------------------------------------
# q13: customer order-count distribution — outer join with an ON-clause filter
# ---------------------------------------------------------------------------

@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
""",
    tags=["J-outer", "A1", "histogram"],
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: histogram of per-customer order counts.  The priority
    predicate lives in the JOIN condition (not WHERE) so zero-order
    customers survive with count 0 — the left-outer + count(col) NULL
    semantics the original exercises via NOT LIKE on o_comment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"), "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q16: supplier variety per part attribute — count-distinct + NOT IN
# ---------------------------------------------------------------------------

@register(
    "q16_supplier_part_variety",
    oracle="""
SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    tags=["A3", "J1", "not-in"],
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 (lineitem stands in for partsupp): how many distinct
    suppliers serve each surviving (brand, type, size) bucket, excluding a
    NOT-IN supplier denylist.  NOT IN over a non-null key compiles to a
    left-anti join (AQE broadcasts the denylist while it fits);
    count(DISTINCT) expands to the standard two-shuffle
    expand-then-count plan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    keep_part = part.filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        li.join(keep_part, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17: small-quantity revenue — correlated average per part
# ---------------------------------------------------------------------------

@register(
    "q17_small_quantity_revenue",
    oracle=f"""
SELECT {_r('sum(l_extendedprice) / 7.0', 2)} AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
    tags=["J7", "A2", "correlated-agg"],
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17: lines whose quantity is under 20% of their part's average.
    The correlated subquery decorrelates to aggregate-once-join-back —
    one extra shuffle on l_partkey instead of a per-row re-scan.  Exact
    double parity holds because l_quantity is integer-valued, so sum and
    count (hence avg) are exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand = part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    narrowed = li.join(brand, F.col("l_partkey") == F.col("p_partkey"))
    thresholds = (
        li.join(brand.withColumnRenamed("p_partkey", "tp"),
                F.col("l_partkey") == F.col("tp"))
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        narrowed.join(thresholds,
                      F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(rnd(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q19: disjunctive multi-attribute predicates — OR-of-ANDs pushdown
# ---------------------------------------------------------------------------

@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT {_r('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    tags=["P-disjunctive", "A6"],
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19: three AND-arms OR'd together across both join sides.
    Catalyst distributes the common-side conjuncts: the part side prunes to
    brands 2/3/4 before broadcast, the lineitem side keeps only
    quantity 1-30, and the residual OR evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b) & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm("Brand#2", 5, 1, 11) | arm("Brand#3", 10, 10, 20)
                | arm("Brand#4", 15, 20, 30))
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q20: dominant suppliers of a part family — nested IN over derived aggregates
# ---------------------------------------------------------------------------

@register(
    "q20_dominant_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
), part_total AS (
  SELECT l_partkey AS pt_partkey, sum(qty) AS total
  FROM shipped GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM shipped
  JOIN part_total ON l_partkey = pt_partkey
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%' AND qty > 0.3 * total
)
""",
    tags=["J6", "A2", "nested-in"],
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape (availqty → shipped share): suppliers who moved more
    than 30% of a red part's 1997 volume.  Both derived aggregates reuse
    ONE shuffle on l_partkey (the per-(supp,part) rollup re-aggregates to
    the part total without a second exchange of the base table); the final
    IN is a semi-join against the small winner set."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").alias("total")
    )
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    dominant = (
        shipped.join(totals, F.col("l_partkey") == F.col("pt_partkey"))
        .join(red, F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") > F.lit(0.3) * F.col("total"))
        .select("l_suppkey")
    )
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# q21: the sole late supplier — EXISTS + NOT EXISTS self-joins
# ---------------------------------------------------------------------------

@register(
    "q21_sole_late_supplier",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  GROUP BY l_orderkey, l_suppkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=["J6", "J1", "exists-not-exists"],
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (commit-date lateness → shipped >90d after order):
    in finished multi-supplier orders, find the supplier who was the ONLY
    late one.  EXISTS compiles to a left-semi and NOT EXISTS to a
    left-anti self-join — both equi on l_orderkey with the <> residual, so
    each is one co-partitioned shuffle, not a cartesian."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(F.col("l_orderkey").alias("o2_key"),
                       F.col("l_suppkey").alias("o2_supp"))
    late_others = late.select(F.col("l_orderkey").alias("o3_key"),
                              F.col("l_suppkey").alias("o3_supp"))
    return (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("o2_supp")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("o3_supp")),
            "left_anti",
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q22: dormant rich customers — global-avg filter + anti-join
# ---------------------------------------------------------------------------

@register(
    "q22_dormant_customers",
    oracle=f"""
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       {_r('sum(c_acctbal)', 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
""",
    tags=["J1", "J7", "scalar-subquery"],
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape (phone country code → nationkey): customers richer
    than the positive-balance average with no order since 2000 (every
    customer has *some* order in this dataset, so dormancy is recency-
    scoped).  The average is a 1-row broadcast; the NOT EXISTS is a
    left-anti on c_custkey whose build side is just the filtered orders
    key column (column-pruned, partition-prunable scan)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"), "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             rnd(F.sum("c_acctbal"), 2).alias("totacctbal"))
    )
