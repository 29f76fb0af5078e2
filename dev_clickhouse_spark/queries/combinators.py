"""ClickHouse combinator / matrix-aggregate / positional-join parity.

Fourth round-8 parity tranche: ``theilsU`` (asymmetric uncertainty
coefficient), ``corrMatrix``, the ``-Resample`` combinator
(``sumResample``), and ``PASTE JOIN`` (positional join, pinned to a
deterministic rank alignment).

Scale shapes: theilsU and corrMatrix are closed forms over one
map-side-combined aggregate (contingency counts / DECIMAL power sums);
sumResample is a (group, bucket) aggregate folded into a fixed-width
array — never wide-row state; the paste join is two rank windows over
top-k subsets + one equi-join on rank (ClickHouse's own PASTE JOIN is
block-position dependent and therefore nondeterministic on a cluster —
the rank alignment is the reproducible semantics you'd actually deploy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


@register(
    "theils_u_type_bucket",
    oracle="""
WITH cells AS (
  SELECT event_type AS x,
         CAST(floor(coalesce("value", 0) / 25) AS BIGINT) AS y,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
hx AS (
  SELECT ln(sum(cx)) - sum(cx * ln(cx)) / sum(cx) AS h_x
  FROM (SELECT x, sum(c) AS cx FROM cells GROUP BY x)
),
hy AS (
  SELECT ln(sum(cy)) - sum(cy * ln(cy)) / sum(cy) AS h_y
  FROM (SELECT y, sum(c) AS cy FROM cells GROUP BY y)
),
hxy AS (
  SELECT ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h_xy FROM cells
)
SELECT floor((h_x - (h_xy - h_y)) / h_x * 1000000 + 0.5) / 1000000
         AS u_x_given_y,
       floor((h_y - (h_xy - h_x)) / h_y * 1000000 + 0.5) / 1000000
         AS u_y_given_x
FROM hx, hy, hxy
""",
    tags=["clickhouse-parity", "theils-u"],
)
def theils_u_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``theilsU(x, y)`` parity (both directions): the
    asymmetric uncertainty coefficient U(X|Y) = (H(X) − H(X|Y))/H(X)
    between event type and a 25-unit value bucket, using the identity
    H(X|Y) = H(X,Y) − H(Y) so everything derives from ONE contingency
    aggregate (|types|×|buckets| cells) — the same scale shape as
    ``cramers_v_type_bucket``.  Both engines evaluate the identical
    entropy identity −Σ(c/n)ln(c/n) = ln(Σc) − Σc·ln(c)/Σc (natural
    log), so the doubles agree term-for-term; the cell grid is tiny at
    any table size."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) / 25)
        .cast("long").alias("y"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))

    def _entropy(df, alias):
        # H = ln(Σc) − Σ c·ln(c) / Σc over the rows of df["ck"]
        return df.agg(
            F.sum("ck").alias("n"),
            F.sum(F.col("ck") * F.log("ck")).alias("slc"),
        ).select(
            (F.log("n") - F.col("slc") / F.col("n")).alias(alias)
        )

    hx = _entropy(
        cells.groupBy("x").agg(F.sum("c").alias("ck")), "h_x"
    )
    hy = _entropy(
        cells.groupBy("y").agg(F.sum("c").alias("ck")), "h_y"
    )
    hxy = _entropy(cells.select(F.col("c").alias("ck")), "h_xy")
    joined = hx.crossJoin(hy).crossJoin(hxy)
    h_x, h_y, h_xy = F.col("h_x"), F.col("h_y"), F.col("h_xy")
    return joined.select(
        rnd((h_x - (h_xy - h_y)) / h_x, 6).alias("u_x_given_y"),
        rnd((h_y - (h_xy - h_x)) / h_y, 6).alias("u_y_given_x"),
    )


@register(
    "corr_matrix_lineitem",
    oracle="""
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sq,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sp,
         CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS sd,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
                * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sqq,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS spp,
         CAST(sum(CAST(l_discount AS DECIMAL(12,4))
                * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS sdd,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sqp,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
                * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS sqd,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS spd
  FROM lineitem
)
SELECT col_a, col_b,
       floor(cov / sqrt(va * vb) * 1000000 + 0.5) / 1000000 AS corr
FROM (
  SELECT 'quantity' AS col_a, 'extendedprice' AS col_b,
         n * sqp - sq * sp AS cov,
         n * sqq - sq * sq AS va, n * spp - sp * sp AS vb FROM s
  UNION ALL
  SELECT 'quantity', 'discount',
         n * sqd - sq * sd, n * sqq - sq * sq, n * sdd - sd * sd FROM s
  UNION ALL
  SELECT 'extendedprice', 'discount',
         n * spd - sp * sd, n * spp - sp * sp, n * sdd - sd * sd FROM s
)
""",
    tags=["clickhouse-parity", "corr-matrix"],
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``corrMatrix(x1, x2, x3)`` parity: the pairwise Pearson
    correlations of (l_quantity, l_extendedprice, l_discount) emitted as
    (col_a, col_b, corr) rows.  ONE map-side-combined aggregate collects
    every power sum (n, Σxᵢ, Σxᵢ², Σxᵢxⱼ — exact DECIMAL, order-
    independent); the 3×3 matrix is a 3-row closed form over that single
    row.  This is the whole trick for a 100 TB correlation matrix: k
    columns need k(k+1)/2 sums in one pass, never k² shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,4)")
    p = F.col("l_extendedprice").cast("decimal(19,4)")
    d = F.col("l_discount").cast("decimal(12,4)")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p * p).cast("double").alias("spp"),
        F.sum(d * d).cast("double").alias("sdd"),
        F.sum(q * p).cast("double").alias("sqp"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(p * d).cast("double").alias("spd"),
    )
    n = F.col("n")

    def pair(name_a, name_b, sab, sa, sb, saa, sbb):
        return F.struct(
            F.lit(name_a).alias("col_a"),
            F.lit(name_b).alias("col_b"),
            rnd(
                (n * F.col(sab) - F.col(sa) * F.col(sb))
                / F.sqrt(
                    (n * F.col(saa) - F.col(sa) * F.col(sa))
                    * (n * F.col(sbb) - F.col(sb) * F.col(sb))
                ), 6,
            ).alias("corr"),
        )

    # one scan: the three matrix cells explode out of the single sums row
    return s.select(
        F.explode(
            F.array(
                pair("quantity", "extendedprice",
                     "sqp", "sq", "sp", "sqq", "spp"),
                pair("quantity", "discount",
                     "sqd", "sq", "sd", "sqq", "sdd"),
                pair("extendedprice", "discount",
                     "spd", "sp", "sd", "spp", "sdd"),
            )
        ).alias("cell")
    ).select("cell.col_a", "cell.col_b", "cell.corr")


#: sumResample bucket spec over l_quantity: [1,11), [11,21), ... [41,51)
_RESAMPLE_START, _RESAMPLE_STEP, _RESAMPLE_N = 1, 10, 5


@register(
    "sum_resample_price_by_quantity",
    oracle="""
WITH b AS (
  SELECT l_returnflag,
         CAST(floor((l_quantity - 1) / 10) AS BIGINT) AS bucket,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) * 100 AS BIGINT)
           AS cents
  FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 51
  GROUP BY 1, 2
),
grid AS (
  SELECT f.l_returnflag, g.bucket, coalesce(b.cents, 0) AS cents
  FROM (SELECT DISTINCT l_returnflag FROM b) f
  CROSS JOIN (SELECT unnest(range(0, 5)) AS bucket) g
  LEFT JOIN b ON b.l_returnflag = f.l_returnflag AND b.bucket = g.bucket
)
SELECT l_returnflag,
       string_agg(CAST(cents AS VARCHAR), ',' ORDER BY bucket)
         AS sums_per_bucket
FROM grid GROUP BY l_returnflag
""",
    tags=["clickhouse-parity", "resample-combinator"],
)
def sum_resample_price_by_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``sumResample(1, 51, 10)(l_extendedprice, l_quantity)``
    parity: per return flag, a fixed 5-slot array of revenue-cents sums
    bucketed by quantity range (out-of-range rows dropped, empty buckets
    ZERO — the combinator's contract).  Spark side: one (flag, bucket)
    aggregate, then the array assembled from a bucket→sum map via
    ``transform(sequence(...))`` — per-group state is the k-slot array,
    never a wide row, and the heavy aggregate is map-side combined."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= _RESAMPLE_START)
        & (F.col("l_quantity") < _RESAMPLE_START
           + _RESAMPLE_STEP * _RESAMPLE_N)
    )
    b = li.groupBy(
        "l_returnflag",
        F.floor((F.col("l_quantity") - _RESAMPLE_START) / _RESAMPLE_STEP)
        .cast("long").alias("bucket"),
    ).agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(19,4)")) * 100)
        .cast("bigint").alias("cents")
    )
    per_flag = b.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "cents"))
        ).alias("m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(_RESAMPLE_N - 1)),
        lambda i: F.coalesce(
            F.element_at("m", i.cast("long")), F.lit(0).cast("long")
        ),
    )
    # serialized with array_join: the driver's comparator hashes scalar
    # cells, and an array-typed pandas cell is unhashable in its canon sort
    return per_flag.select(
        "l_returnflag",
        F.array_join(
            F.transform(arr, lambda e: e.cast("string")), ","
        ).alias("sums_per_bucket"),
    )


@register(
    "paste_join_price_ranks",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
),
p AS (
  SELECT p_partkey, p_retailprice,
         row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
SELECT o.rn AS rank, o.o_orderkey, p.p_partkey,
       CAST(CAST(o.o_totalprice AS DECIMAL(19,4)) * 100 AS BIGINT)
         AS order_cents,
       CAST(CAST(p.p_retailprice AS DECIMAL(19,4)) * 100 AS BIGINT)
         AS part_cents
FROM o JOIN p ON o.rn = p.rn
WHERE o.rn <= 100
""",
    tags=["clickhouse-parity", "paste-join"],
)
def paste_join_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``PASTE JOIN`` parity with pinned deterministic
    semantics: positionally pair the top-100 orders by total price with
    the top-100 parts by retail price (rank k ↔ rank k).  Stock PASTE
    JOIN glues blocks by arrival position — irreproducible on any
    distributed engine — so the rank alignment (row_number over a total
    order with a unique tie-break, equi-join on rank) is the semantics a
    production pipeline would actually pin.  Each side is a distributed
    top-k (orderBy().limit() plans as TakeOrderedAndProject — NOT a
    global row_number window, which would single-partition the sort);
    only the 100 surviving rows see a rank window, and the 100-row sides
    broadcast-join on rank."""
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    wo = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wp = Window.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    o = (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .withColumn("rn", F.row_number().over(wo))
    )
    p = (
        part.select("p_partkey", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(100)
        .withColumn("rn", F.row_number().over(wp))
    )
    return o.join(F.broadcast(p), "rn").select(
        F.col("rn").alias("rank"),
        "o_orderkey", "p_partkey",
        (F.col("o_totalprice").cast("decimal(19,4)") * 100)
        .cast("bigint").alias("order_cents"),
        (F.col("p_retailprice").cast("decimal(19,4)") * 100)
        .cast("bigint").alias("part_cents"),
    )
