"""Fourth statistical parity tranche (round 8): ``arrayAUC``,
``categoricalInformationValue`` and the ``contingency`` coefficient —
the ML-evaluation corner of stock ClickHouse's aggregate surface
(dev-clickhouse serves stock ClickHouse SQL; reference
clickhouse/init/01_schema.sql is ordinary MergeTree, so all of these run
against its tables).

Scale design notes (100 TB):

- ``arrayAUC`` never materializes arrays or ranks raw rows (ClickHouse's
  own signature collects two arrays per group — a wide-row trap at any
  real cardinality).  AUC ≡ Mann-Whitney U / (P·N), so the same
  aggregate-first discipline as ``mann_whitney_quantity_by_flag``
  applies: scores quantized to integer cents, ONE data-sized group-by to
  per-score (pos, neg) counts, then a cumulative window over the score
  GRID.  U is a multiple of ½ from integer counts — order-free, so the
  cross-engine gate can't be broken by summation order.
- ``categoricalInformationValue`` is one contingency aggregate (category
  × binary label) + grid-sized WOE/IV arithmetic; ln() over identical
  count ratios in both engines, 6dp rounding absorbing libm ulp noise
  (the ``theils_u_type_bucket`` precedent).
- ``contingency`` shares cramersV's χ² machinery: data-sized count
  group-by, grid-sized margins, C = sqrt(χ²/(χ²+n)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


@register(
    "array_auc_purchase_value",
    oracle="""
WITH scored AS (
  SELECT CAST(floor("value" * 100 + 0.5) AS BIGINT) AS sc,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
  FROM events WHERE "value" IS NOT NULL
),
grid AS (
  SELECT sc, CAST(sum(lab) AS BIGINT) AS pos,
         CAST(count(*) - sum(lab) AS BIGINT) AS neg
  FROM scored GROUP BY sc
),
cum AS (
  SELECT pos, neg,
         COALESCE(sum(neg) OVER (ORDER BY sc
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS neg_below
  FROM grid
),
tot AS (
  SELECT sum(pos * (2 * neg_below + neg)) AS u2,
         sum(pos) AS p, sum(neg) AS n
  FROM cum
)
SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
       floor(u2 / (2.0 * p * n) * 1000000 + 0.5) / 1000000 AS auc
FROM tot
""",
    tags=["clickhouse-parity", "ml-metrics"],
)
def array_auc_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayAUC(scores, labels)`` parity: ROC AUC of `value`
    as a predictor of event_type='purchase', via the midrank identity
    AUC = U/(P·N) with U = Σ_s pos(s)·(neg_below(s) + neg(s)/2).  2U is
    an exact integer (`u2`), so the only division happens once, on
    identical integers in both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    scored = ev.select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("sc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("lab"),
    )
    grid = scored.groupBy("sc").agg(
        F.sum("lab").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("lab")).cast("long").alias("neg"),
    )
    w = Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.select(
        "pos", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"),
    )
    tot = cum.groupBy().agg(
        F.sum(
            F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))
        ).alias("u2"),
        F.sum("pos").alias("p"),
        F.sum("neg").alias("n"),
    )
    return tot.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_neg"),
        rnd(F.col("u2") / (2.0 * F.col("p") * F.col("n")), 6).alias("auc"),
    )


@register(
    "categorical_iv_segment_balance",
    oracle="""
WITH lab AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS good
  FROM customer
),
cell AS (
  SELECT seg, CAST(sum(good) AS BIGINT) AS g,
         CAST(count(*) - sum(good) AS BIGINT) AS b
  FROM lab GROUP BY seg
),
tot AS (SELECT sum(g) AS gt, sum(b) AS bt FROM cell)
SELECT seg,
       floor((g * 1.0 / gt - b * 1.0 / bt)
             * ln((g * 1.0 / gt) / (b * 1.0 / bt)) * 1000000 + 0.5)
         / 1000000 AS iv_term
FROM cell, tot
WHERE g > 0 AND b > 0
ORDER BY seg
""",
    tags=["clickhouse-parity", "ml-metrics"],
)
def categorical_iv_segment_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``categoricalInformationValue`` parity: per-category
    WOE·(p_good − p_bad) information-value terms for c_mktsegment
    against the sign of c_acctbal (IV = Σ terms; per-category terms are
    the more useful BI row AND make the gate sharper than one scalar).
    Categories where either class is empty are excluded in BOTH engines
    (the ln is undefined there — CH emits ±inf, which no gate can
    hash)."""
    cust = load_table(spark, sf_dir, "customer")
    cell = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.sum(
            F.when(F.col("c_acctbal") >= 0, 1).otherwise(0)
        ).cast("long").alias("g"),
        F.sum(
            F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
        ).cast("long").alias("b"),
    )
    tot = cell.groupBy().agg(
        F.sum("g").alias("gt"), F.sum("b").alias("bt")
    )
    pg = F.col("g") * 1.0 / F.col("gt")
    pb = F.col("b") * 1.0 / F.col("bt")
    return (
        cell.crossJoin(F.broadcast(tot))
        .filter((F.col("g") > 0) & (F.col("b") > 0))
        .select(
            "seg",
            rnd((pg - pb) * F.log(pg / pb), 6).alias("iv_term"),
        )
        .orderBy("seg")
    )


@register(
    "contingency_coeff_priority_status",
    oracle="""
WITH obs AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b,
         CAST(count(*) AS DOUBLE) AS o
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
margins AS (
  SELECT sum(o) OVER (PARTITION BY a) AS row_tot,
         sum(o) OVER (PARTITION BY b) AS col_tot,
         sum(o) OVER () AS n, o
  FROM obs
),
chi AS (
  SELECT max(n) AS n,
         sum((o - row_tot * col_tot / n) * (o - row_tot * col_tot / n)
             / (row_tot * col_tot / n)) AS chi2
  FROM margins
)
SELECT floor(chi2 * 1000000 + 0.5) / 1000000 AS chi2,
       floor(sqrt(chi2 / (chi2 + n)) * 1000000 + 0.5) / 1000000
         AS contingency_c
FROM chi
""",
    tags=["clickhouse-parity", "ml-metrics"],
)
def contingency_coeff_priority_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``contingency(a, b)`` parity — Pearson's contingency
    coefficient C = √(χ²/(χ²+n)) between order priority and status;
    completes the association trio next to ``cramers_v_type_bucket`` and
    ``theils_u_type_bucket``.  Same shape: ONE data-sized contingency
    aggregate, margins/χ² over the 5×3 grid."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    m = obs.select(
        "o",
        F.sum("o").over(Window.partitionBy("a")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("b")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi = m.groupBy().agg(
        F.max("n").alias("n"),
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
    )
    return chi.select(
        rnd(F.col("chi2"), 6).alias("chi2"),
        rnd(F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))), 6).alias(
            "contingency_c"
        ),
    )


@register(
    "anova_price_by_returnflag",
    oracle="""
WITH g AS (
  SELECT l_returnflag AS grp,
         CAST(count(*) AS BIGINT) AS n_g,
         sum(l_extendedprice) AS s_g,
         sum(l_extendedprice * l_extendedprice) AS ss_g
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT sum(n_g) AS n, sum(s_g) AS s, sum(ss_g) AS ss,
         count(*) AS k
  FROM g
),
parts AS (
  SELECT CAST(t.k AS BIGINT) AS k, CAST(t.n AS BIGINT) AS n,
         sum(g.s_g * g.s_g / g.n_g) - t.s * t.s / t.n AS ssb,
         t.ss - sum(g.s_g * g.s_g / g.n_g) AS ssw
  FROM g, tot t GROUP BY t.k, t.n, t.s, t.ss
)
SELECT CAST(k - 1 AS BIGINT) AS df_between,
       CAST(n - k AS BIGINT) AS df_within,
       floor((ssb / (k - 1)) / (ssw / (n - k)) * 1000000 + 0.5) / 1000000
         AS f_stat
FROM parts
""",
    tags=["clickhouse-parity", "stats-tests"],
)
def anova_price_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``analysisOfVariance(x, group_id)`` parity (one-way
    ANOVA): F-statistic of l_extendedprice across the l_returnflag
    groups, from the sufficient statistics (count, sum, sum-of-squares)
    — ONE data-sized group-by, grid-sized arithmetic after.  SSB =
    Σ s_g²/n_g − s²/n and SSW = ss − Σ s_g²/n_g are computed from the
    same double sums in both engines; 6dp rounding absorbs summation-
    order ulp noise (the variance-identity condition number is benign
    here — prices are all-positive and far from cancellation).  The
    p-value needs an F-distribution CDF neither engine exposes in SQL,
    so the gate pins (F, df1, df2) — the p-value's full input."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("l_extendedprice").alias("s_g"),
        F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("ss_g"),
    )
    tot = g.groupBy().agg(
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("between_raw"),
    )
    ssb = F.col("between_raw") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("ss") - F.col("between_raw")
    return tot.select(
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n") - F.col("k")).cast("long").alias("df_within"),
        rnd(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 6
        ).alias("f_stat"),
    )
