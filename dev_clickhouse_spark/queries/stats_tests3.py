"""Third statistical/sketch parity tranche (round 8): ``studentTTest``,
``rankCorr`` and a theta-sketch-style distinct intersection (the set
operation ClickHouse serves with ``uniqTheta``'s Intersect combinator and
that an HLL state — Spark's ``hll_sketch_agg``, used by
``rollup_state_distinct_users`` — fundamentally cannot answer, HLL being
union-only).

Reference surface: stock ClickHouse aggregate functions over the same
served tables (dev-clickhouse exposes stock ClickHouse SQL; see reference
clickhouse/init/01_schema.sql for the serving layer these would run on).

Scale design notes (100 TB):

- ``studentTTest`` is a closed form over exact DECIMAL power sums — one
  map-side-combined aggregate, identical discipline to ``welchTTest``
  (stats_parity.py).
- ``rankCorr`` (Spearman) never ranks raw rows: both measures are
  quantized (l_quantity is already a 50-value grid, discount becomes
  integer cents), the joint distribution is aggregated to ≤550 cells in
  one shuffle, midranks come from the two tiny marginals, and all moment
  sums are exact integers/DECIMALs — order-free, so the cross-engine gate
  cannot be broken by float summation order.  For a continuous measure
  you'd quantize first (same note as the Mann-Whitney/KS queries).
- The KMV sketch keeps k minimum hash values per group: the only
  full-data passes are a distinct (one map-side-combined shuffle) and an
  exact per-group count; the rank-k selection runs on a pre-filtered
  ``h < 4k/n`` tail (expected 4k rows per group, P(truncation loses a
  needed hash) ≤ exp(−k) by Chernoff — and the cap is mirrored exactly in
  the oracle, so even that branch is bit-identical).  States are k-value
  arrays: mergeable, constant-size, and — unlike HLL — intersectable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register

#: KMV sketch size: estimator relative error ~ 1/sqrt(k-2) ≈ 6.3%.
KMV_K = 256

#: safety factor for the pre-filter cap θ_cap = KMV_CAP_SAFETY·k/n — the
#: k-th smallest of n uniform hashes concentrates at k/n; expected rows
#: under the cap is SAFETY·k, and P(fewer than k) ≤ exp(−k·(S−1)²/(2S²)).
KMV_CAP_SAFETY = 4


@register(
    "student_ttest_price_by_flag",
    oracle="""
WITH s AS (
  SELECT l_returnflag AS flag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxx
  FROM lineitem WHERE l_returnflag IN ('A', 'N')
  GROUP BY l_returnflag
),
ab AS (
  SELECT max(CASE WHEN flag = 'A' THEN n END) AS n1,
         max(CASE WHEN flag = 'A' THEN sx END) AS sx1,
         max(CASE WHEN flag = 'A' THEN sxx END) AS sxx1,
         max(CASE WHEN flag = 'N' THEN n END) AS n2,
         max(CASE WHEN flag = 'N' THEN sx END) AS sx2,
         max(CASE WHEN flag = 'N' THEN sxx END) AS sxx2
  FROM s
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(n1 + n2 - 2 AS BIGINT) AS df,
       floor((sx1 / n1 - sx2 / n2)
             / sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
                    / (n1 + n2 - 2) * (1 / n1 + 1 / n2))
             * 1000000 + 0.5) / 1000000 AS student_t
FROM ab
""",
    tags=["clickhouse-parity", "hypothesis-test"],
)
def student_ttest_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``studentTTest(x, g)`` parity: the pooled-variance
    two-sample t statistic and its degrees of freedom comparing
    ``l_extendedprice`` between return flags A and N.  Complements
    ``welch_ttest_price_by_flag`` (stats_parity.py): Student pools the
    two sample variances under the equal-variance assumption, df is the
    exact integer n1+n2−2.  (The p-value needs the incomplete beta —
    not in either engine's SQL surface — so the gate pins t and df,
    which determine it.)  Power sums are exact DECIMALs (one
    map-side-combined aggregate over the data); only the final t division
    is floating, rounded floor-form 6dp in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return student_ttest(
        li.select(
            F.col("l_extendedprice").cast("decimal(19,4)").alias("x"),
            F.col("l_returnflag").alias("g"),
        ),
        "x", "g", "A", "N",
    )


def student_ttest(
    df: DataFrame, value_col: str, group_col: str, a_label, b_label
) -> DataFrame:
    """Pooled-variance two-sample t over exact power sums; value_col must
    already be an exact (DECIMAL/integer) type so only the final division
    floats.  Returns one row (n1, n2, df, student_t)."""
    xp = F.col(value_col)
    s = (
        df.filter(F.col(group_col).isin(a_label, b_label))
        .groupBy(F.col(group_col).alias("flag"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(xp).cast("double").alias("sx"),
            F.sum(xp * xp).cast("double").alias("sxx"),
        )
    )
    ab = s.groupBy().agg(
        *[
            F.max(F.when(F.col("flag") == fl, F.col(c))).alias(f"{c}{i}")
            for i, fl in ((1, a_label), (2, b_label))
            for c in ("n", "sx", "sxx")
        ]
    )
    n1, sx1, sxx1, n2, sx2, sxx2 = (
        F.col(c) for c in ("n1", "sx1", "sxx1", "n2", "sx2", "sxx2")
    )
    pooled = ((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2)) / (
        n1 + n2 - 2
    )
    t = (sx1 / n1 - sx2 / n2) / F.sqrt(pooled * (1 / n1 + 1 / n2))
    return ab.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        (n1 + n2 - 2).cast("bigint").alias("df"),
        rnd(t, 6).alias("student_t"),
    )


@register(
    "rank_corr_quantity_discount",
    oracle="""
WITH cells AS (
  SELECT CAST(l_quantity AS INTEGER) AS x,
         CAST(floor(l_discount * 100 + 0.5) AS INTEGER) AS y,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
mx AS (
  SELECT x, sum(w) AS cx,
         coalesce(sum(sum(w)) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS px
  FROM cells GROUP BY x
),
my AS (
  SELECT y, sum(w) AS cy,
         coalesce(sum(sum(w)) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS py
  FROM cells GROUP BY y
),
j AS (
  SELECT w, 2 * px + cx + 1 AS rx2, 2 * py + cy + 1 AS ry2
  FROM cells JOIN mx USING (x) JOIN my USING (y)
),
m AS (
  SELECT CAST(sum(w) AS DOUBLE) AS n,
         CAST(sum(CAST(w * rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(sum(CAST(w * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(sum(CAST(w * rx2 * rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(w * ry2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         CAST(sum(CAST(w * rx2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       floor((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
             * 1000000 + 0.5) / 1000000 AS rank_corr
FROM m
""",
    tags=["clickhouse-parity", "rank-test"],
)
def rank_corr_quantity_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``rankCorr(x, y)`` parity: Spearman's ρ between
    ``l_quantity`` and ``l_discount`` (integer cents) with exact midrank
    tie handling — Pearson correlation of the per-row midranks, which is
    the definition ClickHouse implements.

    Aggregate-first: one shuffle reduces the data to the ≤550-cell joint
    (x, y) count table; midranks come from cumulative counts over the
    50-cell x marginal and 11-cell y marginal (rank(v) = #smaller +
    (#equal+1)/2), broadcast-joined back to the cells.  To keep the gate
    order-free, ranks are carried as DOUBLED integers (2·rank = 2·#smaller
    + #equal + 1) and every moment is an exact integer summed as
    DECIMAL(38,0); the factor 2 cancels in the correlation, so ρ needs no
    un-doubling.  Only the final ratio is floating, rounded floor-form 6dp
    in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return rank_corr(
        li.select(
            F.col("l_quantity").cast("int").alias("x"),
            F.floor(F.col("l_discount") * 100 + 0.5).cast("int").alias("y"),
        ),
        "x", "y",
    )


def rank_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman ρ with exact midranks, aggregate-first over the joint
    (x, y) cell table; x/y must be integer-quantized.  Returns one row
    (n, rank_corr)."""
    cells = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).alias("w"))
    wprev_x = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    wprev_y = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    mx = cells.groupBy("x").agg(F.sum("w").alias("cx")).select(
        "x", "cx",
        F.coalesce(F.sum("cx").over(wprev_x), F.lit(0)).alias("px"),
    )
    my = cells.groupBy("y").agg(F.sum("w").alias("cy")).select(
        "y", "cy",
        F.coalesce(F.sum("cy").over(wprev_y), F.lit(0)).alias("py"),
    )
    j = cells.join(F.broadcast(mx), "x").join(F.broadcast(my), "y").select(
        "w",
        (2 * F.col("px") + F.col("cx") + 1).alias("rx2"),
        (2 * F.col("py") + F.col("cy") + 1).alias("ry2"),
    )
    w, rx2, ry2 = F.col("w"), F.col("rx2"), F.col("ry2")
    m = j.groupBy().agg(
        F.sum(w).cast("double").alias("n"),
        F.sum((w * rx2).cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum((w * ry2).cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((w * rx2 * rx2).cast("decimal(38,0)")).cast("double")
        .alias("sxx"),
        F.sum((w * ry2 * ry2).cast("decimal(38,0)")).cast("double")
        .alias("syy"),
        F.sum((w * rx2 * ry2).cast("decimal(38,0)")).cast("double")
        .alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    rho = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.select(
        n.cast("bigint").alias("n"), rnd(rho, 6).alias("rank_corr")
    )


def _kmv_sketches(
    df: DataFrame, group_col: str, h_col: str, k: int
) -> DataFrame:
    """k-minimum-values sketch per group over a normalized-hash column in
    (0, 1]: returns (group, h, rn, n_distinct, theta) rows — the k
    smallest distinct hashes, the group's exact distinct count, and
    θ = k-th smallest (or 1.0 when the group is smaller than k, i.e. the
    sketch is exact).

    The full-data passes are a distinct and an exact per-group count (both
    one map-side-combined shuffle); the rank-k window runs only on the
    ``h < SAFETY·k/n`` tail — expected SAFETY·k rows per group, so the
    per-group sort state is constant regardless of data size.  The cap is
    exact-count-derived (not an estimate) so an oracle mirroring it is
    bit-identical even in the never-observed truncation branch."""
    dis = df.select(group_col, h_col).distinct()
    counts = dis.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_distinct")
    ).withColumn(
        "h_cap",
        F.least(
            F.lit(1.0),
            F.lit(float(KMV_CAP_SAFETY * k)) / F.col("n_distinct"),
        ),
    )
    tail = dis.join(F.broadcast(counts), group_col).filter(
        (F.col(h_col) < F.col("h_cap")) | (F.col("n_distinct") < k)
    )
    wrk = Window.partitionBy(group_col).orderBy(h_col)
    sk = tail.withColumn("rn", F.row_number().over(wrk)).filter(
        F.col("rn") <= k
    )
    wg = Window.partitionBy(group_col)
    return sk.withColumn(
        "theta",
        F.when(
            F.max("rn").over(wg) == k, F.max(F.col(h_col)).over(wg)
        ).otherwise(F.lit(1.0)),
    )


@register(
    "uniq_theta_intersect_user_days",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT event_type AS g,
         (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 12))::BIGINT
               AS DOUBLE) + 1) / 281474976710656.0 AS h
  FROM events WHERE event_type IN ('click', 'purchase')
),
counts AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_distinct,
         least(1.0, {KMV_CAP_SAFETY * KMV_K}.0 / count(*)) AS h_cap
  FROM ud GROUP BY g
),
sk AS (
  SELECT g, h, rn, n_distinct FROM (
    SELECT ud.g, h, n_distinct,
           row_number() OVER (PARTITION BY ud.g ORDER BY h) AS rn
    FROM ud JOIN counts ON ud.g = counts.g
    WHERE h < h_cap OR n_distinct < {KMV_K})
  WHERE rn <= {KMV_K}
),
th AS (
  SELECT g, max(n_distinct) AS n_distinct,
         CASE WHEN max(rn) = {KMV_K} THEN max(h) ELSE 1.0 END AS theta
  FROM sk GROUP BY g
),
theta2 AS (
  SELECT least(min(theta), 1.0) AS theta FROM th
),
inter AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common
  FROM sk a JOIN sk b ON a.h = b.h AND a.g = 'click' AND b.g = 'purchase'
  JOIN theta2 ON a.h < theta2.theta
),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS n_exact_both FROM (
    SELECT h FROM ud WHERE g = 'click'
    INTERSECT SELECT h FROM ud WHERE g = 'purchase')
)
SELECT CAST({KMV_K} AS BIGINT) AS k,
       max(CASE WHEN g = 'click' THEN n_distinct END) AS n_exact_click,
       max(CASE WHEN g = 'purchase' THEN n_distinct END) AS n_exact_purchase,
       max(n_exact_both) AS n_exact_both,
       floor(max(CASE WHEN g = 'click' THEN
           CASE WHEN n_distinct < {KMV_K} THEN CAST(n_distinct AS DOUBLE)
                ELSE ({KMV_K} - 1) / th.theta END END) * 100 + 0.5) / 100
         AS kmv_click,
       floor(max(CASE WHEN g = 'purchase' THEN
           CASE WHEN n_distinct < {KMV_K} THEN CAST(n_distinct AS DOUBLE)
                ELSE ({KMV_K} - 1) / th.theta END END) * 100 + 0.5) / 100
         AS kmv_purchase,
       floor(max(n_common / theta2.theta) * 100 + 0.5) / 100 AS kmv_both
FROM th, theta2, inter, ex
""",
    tags=["clickhouse-parity", "sketch", "llm-ops"],
)
def uniq_theta_intersect_user_days(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theta/KMV-sketch distinct INTERSECTION — the set operation
    ClickHouse answers with ``uniqThetaIntersect`` and that the HLL states
    in ``rollup_state_distinct_users`` cannot (HLL merges are union-only).
    Counts distinct (user, day) pairs for the click and purchase event
    types and estimates their overlap from two k=256 minimum-hash
    sketches: θ = min(θ_click, θ_purchase), estimate = |{h in both
    sketches, h < θ}| / θ; per-set estimates are the KMV (k−1)/θ_k (exact
    when the set is smaller than k).  Exact twins for all three counts sit
    in the same row, making the sketch error directly visible to the gate.

    Hashes are the repo's cross-engine md5 recipe (48-bit prefix,
    normalized to (0,1]); at 100 TB only the k-value states move between
    nodes — constant-size, mergeable AND intersectable, the
    AggregatingMergeTree-analog answer to "daily active overlap between
    any two segments" that a raw DISTINCT would re-shuffle terabytes
    for."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    key = F.concat_ws(
        ":",
        F.col("user_id").cast("string"),
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd"),
    )
    h = (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("double") + 1
    ) / F.lit(float(1 << 48))
    ud = ev.select(F.col("event_type").alias("g"), h.alias("h"))
    sk = _kmv_sketches(ud, "g", "h", KMV_K).cache()

    th = sk.groupBy("g").agg(
        F.max("n_distinct").alias("n_distinct"),
        F.when(F.max("rn") == KMV_K, F.max("h"))
        .otherwise(F.lit(1.0)).alias("theta"),
    )
    theta2 = th.groupBy().agg(
        F.least(F.min("theta"), F.lit(1.0)).alias("theta")
    )
    a = sk.filter(F.col("g") == "click").select(F.col("h").alias("ha"))
    b = sk.filter(F.col("g") == "purchase").select(F.col("h").alias("hb"))
    inter = (
        a.join(b, F.col("ha") == F.col("hb"))
        .join(F.broadcast(theta2), F.col("ha") < F.col("theta"))
        .groupBy().agg(F.count(F.lit(1)).alias("n_common"))
    )
    dis = ud.distinct()
    ex = (
        dis.filter(F.col("g") == "click").select("h")
        .intersect(dis.filter(F.col("g") == "purchase").select("h"))
        .groupBy().agg(F.count(F.lit(1)).alias("n_exact_both"))
    )

    est = F.when(
        F.col("n_distinct") < KMV_K, F.col("n_distinct").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) / F.col("theta"))
    per_g = th.groupBy().agg(
        F.max(F.when(F.col("g") == "click", F.col("n_distinct")))
        .alias("n_exact_click"),
        F.max(F.when(F.col("g") == "purchase", F.col("n_distinct")))
        .alias("n_exact_purchase"),
        F.max(F.when(F.col("g") == "click", est)).alias("est_click"),
        F.max(F.when(F.col("g") == "purchase", est)).alias("est_purchase"),
    )
    return (
        per_g.crossJoin(F.broadcast(theta2))
        .crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(ex))
        .select(
            F.lit(KMV_K).cast("bigint").alias("k"),
            F.col("n_exact_click").cast("bigint").alias("n_exact_click"),
            F.col("n_exact_purchase").cast("bigint")
            .alias("n_exact_purchase"),
            F.col("n_exact_both").cast("bigint").alias("n_exact_both"),
            rnd(F.col("est_click"), 2).alias("kmv_click"),
            rnd(F.col("est_purchase"), 2).alias("kmv_purchase"),
            rnd(F.col("n_common") / F.col("theta"), 2).alias("kmv_both"),
        )
    )
