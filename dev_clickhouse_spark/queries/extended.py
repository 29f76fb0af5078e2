"""Extended operator queries: MERGE upsert (J8), current-flag SCD2 join (J11),
embedding-cosine near-dup pairs (dedup family completion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..operators.dedupe import replacing_dedupe
from ..operators.merge import merge_upsert
from .registry import register


@register(
    "merge_upsert_daily_counts",
    oracle="""
WITH t AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(count(*) AS BIGINT) AS cnt, 'initial' AS batch
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1
), s AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(count(*) * 2 AS BIGINT) AS cnt, 'merged' AS batch
  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00' GROUP BY 1
)
SELECT coalesce(t.order_date, s.order_date) AS order_date,
       coalesce(s.cnt, t.cnt)               AS cnt,
       coalesce(s.batch, t.batch)           AS batch
FROM t FULL JOIN s ON t.order_date = s.order_date
""",
    tags=["J8"],
)
def merge_upsert_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT — the legacy
    PG fact maintenance (06_dynamic_dag_metadata.sql:1447-1537) as a
    read-modify-write full-outer merge (operators/merge.merge_upsert).
    Source counts are doubled so matched-row updates are visible."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate").alias("order_date")
    target = (
        orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("cnt"), F.lit("initial").alias("batch"))
    )
    source = (
        orders.filter(F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
        .groupBy(day)
        .agg((F.count(F.lit(1)) * 2).alias("cnt"), F.lit("merged").alias("batch"))
    )
    return merge_upsert(target, source, keys=["order_date"])


@register(
    "current_flag_version_join",
    oracle="""
WITH v AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), cur AS (
  SELECT user_id, event_type AS cur_type, true AS is_current FROM v WHERE rn = 1
)
SELECT e.event_id,
       CAST(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS matches_current
FROM events e
LEFT JOIN cur c
  ON c.user_id = e.user_id AND c.is_current
 AND c.cur_type IS NOT DISTINCT FROM e.event_type
""",
    tags=["J11", "P5"],
)
def current_flag_version_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-flag dimension join — the legacy SCD2 'current' lookup with a
    boolean flag and null-safe attribute predicate inside the join condition
    (reference 06_dynamic_dag_metadata.sql:1471-1478)."""
    ev = load_table(spark, sf_dir, "events")
    cur = replacing_dedupe(ev, ["user_id"], version_col="ts", tiebreak=["event_id"]).select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_type").alias("cur_type"),
        F.lit(True).alias("is_current"),
    )
    joined = ev.join(
        cur,
        (F.col("c_user_id") == F.col("user_id"))
        & F.col("is_current")
        & F.col("cur_type").eqNullSafe(F.col("event_type")),
        "left",
    )
    return joined.select(
        "event_id",
        F.when(F.col("c_user_id").isNotNull(), 1).otherwise(0).cast("int").alias(
            "matches_current"
        ),
    )


@register(
    "dedup_embedding_cosine_pairs",
    oracle="""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             * 10000 + 0.5) / 10000 AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
""",
    tags=["llm-dedup", "llm-similarity"],
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4) — semantic dedup
    over the embedding column, via banded hyperplane-LSH blocking + exact
    cosine verify on candidates only (llm/similarity.cosine_threshold_pairs).
    The band equi-join replaces the O(n²) broadcast nested-loop self-join;
    recall vs the brute force is asserted in tests/test_bucketing_ivf.py."""
    from ..llm.similarity import cosine_threshold_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return cosine_threshold_pairs(emb, threshold=0.4, dim=dim)


def cosine_pairs_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs comparator for the LSH-blocked query above — test-only
    recall baseline, not registered (O(n²) does not survive corpus scale)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda a: F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))  # noqa: E731
    a, b = emb.alias("a"), emb.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (norm(F.col("a.e")) * norm(F.col("b.e")))
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= 0.4)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            rnd(cos, 4).alias("cosine"),
        )
    )


@register(
    "salted_join_segment_revenue",
    oracle="""
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(sum(e.value) * 100 + 0.5) / 100 AS total_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment
""",
    tags=["skew", "join"],
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event revenue by customer segment THROUGH the salt fan-out join
    (operators/skew.salted_join): the salt is routing-only and dropped, so
    the result is row-identical to the plain join — which is exactly what
    the oracle replays, making the skew tooling's correctness part of the
    driver gate rather than a pytest-only property.  At 100 TB this is the
    shape for a hot-key fact ⋈ mid-size dim that can't broadcast: each hot
    key fans across salt_buckets reducers instead of melting one."""
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("value")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment")
    )
    joined = salted_join(ev, cust, on="user_id", salt_buckets=8)
    return joined.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum("value"), 2).alias("total_value"),
    )
