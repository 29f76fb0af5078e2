"""Dataset assembly operators for training-data pipelines: deterministic
hash splits, stratified sampling, context-window packing, embedding
statistics.

These are the operations that turn a cleaned corpus into a training set, and
they must be DETERMINISTIC at 100 TB — re-running the pipeline on the same
snapshot must yield the same split/sample/packing, with no RNG state and no
dependence on partitioning or row order.  Everything keys off md5(key) so
the DuckDB oracle replays decisions bit-for-bit:

- **hash_split** — train/val/test assignment from a hash bucket of the
  stable key: map-only, reshuffle-proof, join-free.
- **stratified_sample** — top-N per group ordered by the key hash: one
  shuffle on the group column; at scale the window never materializes more
  than a partition's rows.
- **pack_context_windows** — sequential first-fit packing of documents into
  fixed token budgets per source: prefix-sum over a per-source window (one
  shuffle), the standard pretraining-batch assembly shape.
- **embedding_centroids** — per-label element-wise mean via posexplode +
  exact DECIMAL sums, so the two engines agree bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..queries.registry import register

#: split fractions in basis points over the 32-bit key-hash space
SPLIT_BPS: dict[str, int] = {"train": 8000, "val": 1000, "test": 1000}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_bucket(key: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of the key's string
    form — the split/sample primitive both engines replay exactly
    (first 8 hex chars → 32-bit int → mod)."""
    h = F.conv(F.substring(F.md5(_col(key).cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % buckets).cast("int")


def hash_split(
    df: DataFrame, key: Column | str, splits: dict[str, int] | None = None
) -> DataFrame:
    """Attach a ``split`` column (train/val/test by default).  Assignment
    depends only on the key value: stable under reruns, repartitioning, and
    incremental appends — a new document never moves an old one between
    splits (the property random() splits lack)."""
    splits = splits or SPLIT_BPS
    b = hash_bucket(key)
    expr = None
    lo = 0
    for name, width in splits.items():
        cond = (b >= lo) & (b < lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn("split", expr.otherwise(F.lit("train")))


def stratified_sample(
    df: DataFrame, group_col: str, n_per_group: int, key: Column | str
) -> DataFrame:
    """Deterministic N-per-group sample: rank group members by md5(key) (a
    uniform but fixed order) and keep the first N.  One shuffle on the group
    column; equivalent SQL is a plain row_number window."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(_col(key).cast("string")), _col(key)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
    )


def importance_resample(
    df: DataFrame,
    weight: Column | str,
    key: Column | str,
    buckets: int = 1_000_000,
) -> DataFrame:
    """DSIR-style deterministic importance resampling: attach ``keep`` =
    (u(key) < weight), where ``weight`` ∈ [0, 1] is the per-row sampling
    probability (an importance weight normalized by its max) and u is the
    md5-bucket uniform of the key — the Bernoulli coin depends only on
    the key, so the sample is reproducible, append-stable (new rows never
    flip old coins), and exactly replayable in SQL.  Map-only: at 100 TB
    this is one whole-stage-codegen pass with zero shuffle, versus the
    global sort a top-k-by-weight selection would need."""
    u = (
        hash_bucket(key, buckets).cast("double") / F.lit(float(buckets))
    )
    return df.withColumn("keep", u < _col(weight))


def _hashed_ngram_feats(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) per hashed word uni+bigram occurrence — the DSIR
    feature space (Xie et al. 2023 hash n-grams into a fixed bucket
    count so the two bag models stay bounded regardless of corpus
    size).  Map-only: lower → split → zip-with bigrams → explode →
    md5 bucket, all JVM expressions."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.concat(toks, bigrams)).alias("f"),
    ).select("__id", hash_bucket(F.col("f"), n_buckets).alias("b"))


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit hashed-n-gram bag
    models on a TARGET sample (p) and the RAW corpus (q), then weight
    every document by its log likelihood ratio
    ``log w(x) = Σ_features log p(b) − log q(b)`` with add-one smoothing
    over the bucket space.  Returns (id, n_features, log_weight);
    compose with :func:`importance_resample` (normalize
    ``exp(log_w − max)`` into the keep-probability) to resample the
    corpus toward the target domain.

    Scale shape: both bag models are BOUNDED by ``n_buckets`` rows
    regardless of corpus size, so the ratio table broadcasts; the only
    data-sized work is the feature explode (map-only) and two map-side-
    combinable aggregations (bucket counts, per-doc sum) — linear in
    corpus tokens, zero driver-side state."""
    fd = _hashed_ngram_feats(docs, text_col, id_col, n_buckets)
    ft = _hashed_ngram_feats(target, text_col, id_col, n_buckets)
    q = fd.groupBy("b").agg(F.count(F.lit(1)).alias("cq"))
    p = ft.groupBy("b").agg(F.count(F.lit(1)).alias("cp"))
    nq = fd.agg(F.count(F.lit(1)).alias("nq"))
    np_ = ft.agg(F.count(F.lit(1)).alias("np"))
    ratio = (
        q.join(F.broadcast(p), "b", "left")
        .crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(np_))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("cp"), F.lit(0)) + 1.0)
                    / (F.col("np") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("cq") + 1.0)
                    / (F.col("nq") + F.lit(float(n_buckets)))
                )
            ).alias("lr"),
        )
    )
    return (
        fd.join(F.broadcast(ratio), "b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("lr").alias("log_weight"),
        )
        .withColumnRenamed("__id", id_col)
    )


_DSIR_TARGET = ("src0", "src1", "src2", "src3")


@register(
    "dsir_importance_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS ts FROM documents
),
feats AS (
  SELECT doc_id, source, unnest(ts) AS f FROM toks
  UNION ALL
  SELECT doc_id, source, ts[i] || ' ' || ts[i + 1] AS f
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(ts) - 1)) AS i)
),
fb AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS b
  FROM feats
),
q AS (SELECT b, count(*) AS cq FROM fb GROUP BY b),
p AS (SELECT b, count(*) AS cp FROM fb
      WHERE source IN {_DSIR_TARGET} GROUP BY b),
nq AS (SELECT count(*) AS nq FROM fb),
np AS (SELECT count(*) AS np FROM fb WHERE source IN {_DSIR_TARGET}),
lr AS (
  SELECT q.b,
         ln((COALESCE(p.cp, 0) + 1.0) / (np.np + 4096.0))
       - ln((q.cq + 1.0) / (nq.nq + 4096.0)) AS lr
  FROM q LEFT JOIN p ON q.b = p.b CROSS JOIN nq CROSS JOIN np
),
w AS (
  SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_features,
         sum(lr.lr) AS lw
  FROM fb JOIN lr ON fb.b = lr.b GROUP BY fb.doc_id
),
mx AS (SELECT max(lw) AS mx FROM w)
SELECT doc_id, n_features,
       floor(lw * 10000 + 0.5) / 10000 AS log_weight,
       floor(exp(lw - mx) * 10000 + 0.5) / 10000 AS w_norm,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 1000000) / 1000000.0
         < floor(exp(lw - mx) * 10000 + 0.5) / 10000 AS keep
FROM w CROSS JOIN mx
""",
    tags=["llm-sampling", "dsir"],
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full DSIR pipeline on the documents table: hashed uni+bigram bag
    models fit on a target sample (sources src0-src3 stand in for the
    curated target domain) vs the raw corpus, per-document log
    likelihood-ratio weights, max-normalized keep probability, and the
    deterministic md5-coin resample — every stage replayed exactly by
    the oracle.  The keep coin compares against the ROUNDED normalized
    weight so the decision is identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*_DSIR_TARGET))
    w = dsir_log_weights(docs, target)
    mx = w.agg(F.max("log_weight").alias("mx"))
    scored = w.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "n_features",
        rnd(F.col("log_weight"), 4).alias("log_weight"),
        rnd(F.exp(F.col("log_weight") - F.col("mx")), 4).alias("w_norm"),
    )
    u = hash_bucket(F.col("doc_id"), 1_000_000).cast("double") / 1e6
    return scored.withColumn("keep", u < F.col("w_norm"))


def pack_context_windows(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_tokens: Column | None = None,
) -> DataFrame:
    """Sequential first-fit packing: within each group (ordered by id), a
    document goes into window ``floor(tokens_before / budget)``.  The
    prefix-sum is one window aggregation over the group shuffle — documents
    longer than the budget occupy their own windows.  Returns
    (group, id, n_tokens, tokens_before, window_id)."""
    toks = n_tokens if n_tokens is not None else F.size(F.split("text", " "))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        F.col(group_col),
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
    ).select(
        group_col,
        id_col,
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("tokens_before"),
    ).withColumn(
        "window_id", F.floor(F.col("tokens_before") / budget_tokens).cast("int")
    )


def l2_normalize(vec: Column | str) -> Column:
    """Unit-normalize an array<float/double> JVM-side; zero vectors pass
    through unchanged (no NaNs)."""
    v = _col(vec)
    sumsq = F.aggregate(
        v, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return F.transform(F.array(F.sqrt(sumsq)), lambda nrm: F.when(
        nrm > 0, F.transform(v, lambda x: x.cast("double") / nrm)
    ).otherwise(F.transform(v, lambda x: x.cast("double"))))[0]


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

@register(
    "sample_hash_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bk
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN bk < {SPLIT_BPS['train']} THEN 'train'
            WHEN bk < {SPLIT_BPS['train'] + SPLIT_BPS['val']} THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
    tags=["llm-sample"],
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment for every document — the
    split decision each engine derives independently from md5(doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select("doc_id", "source", "split")


@register(
    "sample_clause_events_agg",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled,
       floor(sum("value") * 100 + 0.5) / 100 AS sum_value
FROM events
WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
      % 10000 < 1000
GROUP BY event_type
""",
    tags=["clickhouse-parity", "sample"],
)
def sample_clause_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``SAMPLE 0.1`` parity: a DETERMINISTIC 10% of the table
    selected by primary-key hash bucket, aggregated — the interactive-BI
    move for sub-second answers over a huge fact table.

    ClickHouse samples by ``intHash32(key) < 0.1 * 2^32`` over the
    declared sampling key; here the same contract is ``hash_bucket
    (event_id) < 1000`` of 10000 (md5-based so the oracle replays the
    exact row set).  The properties that make SAMPLE useful hold: stable
    under reruns and repartitioning, nested samples are subsets
    (``SAMPLE 0.05``'s buckets < 500 ⊂ this row set), and the filter is a
    map-side predicate evaluated at scan time — no shuffle is spent on
    rows outside the sample.  At 100 TB with data CLUSTERED by the hash
    bucket (ClickHouse's SAMPLE BY does exactly this), the predicate
    becomes file-level pruning; on unclustered parquet it is still a
    full-scan-cheap projection filter."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(hash_bucket("event_id") < 1000)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "sample_stratified_per_source",
    oracle="""
SELECT source, doc_id, CAST(rn AS INTEGER) AS sample_rank
FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 5
""",
    tags=["llm-sample"],
)
def sample_stratified_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five deterministic representatives per source — stratified sampling
    by hash order, the balanced-subset primitive."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "source", 5, "doc_id").select(
        "source", "doc_id", F.col("sample_rank").cast("int").alias("sample_rank")
    )


@register(
    "pack_context_windows",
    oracle="""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT source, doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
  FROM t
)
SELECT source, doc_id, n_tokens, tokens_before,
       CAST(floor(tokens_before / 2048.0) AS INTEGER) AS window_id
FROM p
""",
    tags=["llm-sample"],
)
def pack_context_windows_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack every document into 2048-token context windows per source —
    sequential first-fit via a per-source prefix sum."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_context_windows(docs, budget_tokens=2048)


@register(
    "domain_mix_weights",
    oracle="""
WITH t AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS n_tokens
  FROM t GROUP BY source
)
SELECT source, n_docs, n_tokens,
       floor(CAST(n_tokens AS DOUBLE) / (sum(n_tokens) OVER ())
             * 1000000 + 0.5) / 1000000 AS token_share,
       floor(CAST(sum(n_tokens) OVER () AS DOUBLE)
             / (count(*) OVER ()) / n_tokens * 1000000 + 0.5) / 1000000
         AS uniform_weight
FROM s
""",
    tags=["llm-sample"],
)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planning: per-source token share and the sampling weight
    that flattens the mix to uniform (weight = target_share / actual_share —
    multiply each source's sampling probability by it to hit the target).
    The heavy part is one partial-agg shuffle on ``source``; the share/weight
    window runs over the handful of per-source rows, so the op costs the
    same as a plain count at 100 TB.  The uniform target is the degenerate
    config — production passes any target vector against the same shares."""
    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.select(
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    k = F.count(F.lit(1)).over(w)
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        rnd(F.col("n_tokens").cast("double") / total, 6).alias("token_share"),
        rnd(total.cast("double") / k / F.col("n_tokens"), 6).alias(
            "uniform_weight"
        ),
    )


N_EXPORT_SHARDS = 16


@register(
    "training_export_shards",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {N_EXPORT_SHARDS} AS INTEGER) AS shard_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
)
SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(min(n) AS BIGINT) AS min_tokens,
       CAST(max(n) AS BIGINT) AS max_tokens
FROM t GROUP BY shard_id
""",
    tags=["llm-sample"],
)
def training_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard plan for training export: every document maps to
    ``md5(doc_id) mod {N_EXPORT_SHARDS}`` — a map-only assignment that is
    stable under reruns/repartitioning AND a uniform pseudo-random global
    shuffle (adjacent doc ids scatter across shards, the property
    sequential range-sharding lacks and trainers need).  The per-shard stats
    are the balance check an export job asserts before writing; at 100 TB
    the write itself is ``df.repartition(N, shard_id).write`` — same single
    shuffle as this aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            hash_bucket("doc_id", N_EXPORT_SHARDS).alias("shard_id"),
            F.size(F.split("text", " ")).cast("long").alias("n"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


@register(
    "embedding_centroids",
    oracle="""
WITH e AS (
  SELECT label, u.pos AS pos, CAST(u.x AS DECIMAL(20, 8)) AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos) u
)
SELECT label, CAST(pos AS INTEGER) AS pos,
       CAST(count(*) AS BIGINT) AS n,
       floor(CAST(sum(x) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
         AS centroid
FROM e GROUP BY label, pos
""",
    tags=["llm-sample", "llm-similarity"],
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label element-wise centroid of the embedding vectors.  Sums run in
    DECIMAL so they are exact and order-independent — both engines divide the
    SAME numerator and round identically (float summation order would
    otherwise let partial aggregation drift the last ulp)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),  # 1-based like the SQL
        F.col("x").cast("decimal(20,8)").alias("x"),
    )
    return e.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.sum("x").cast("double") / F.count(F.lit(1)), 6).alias("centroid"),
    )


@register(
    "importance_resample_by_quality",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks,
         length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id, lang,
         floor(len(list_filter(toks, x -> x IN ('the','a','of','and')))::DOUBLE
               / len(toks) * 10000 + 0.5) / 10000 AS sw,
         floor((1 - len(list_distinct(toks))::DOUBLE / len(toks))
               * 10000 + 0.5) / 10000 AS rep,
         floor(least(n_chars / 400.0, 1.0) * 10000 + 0.5) / 10000 AS ls
  FROM t
), s AS (
  SELECT doc_id, lang,
         0.5 + (-1.5 + 4.0 * sw + -6.0 * rep + 2.5 * ls)
           / (2 * (1 + abs(-1.5 + 4.0 * sw + -6.0 * rep + 2.5 * ls)))
           AS score,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 / 1000000.0 AS u
  FROM m
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN u < score THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       floor(CAST(sum(CASE WHEN u < score
                      THEN CAST(score AS DECIMAL(19,6)) END) AS DOUBLE)
             / sum(CASE WHEN u < score THEN 1 ELSE 0 END)
             * 10000 + 0.5) / 10000 AS mean_kept_score
FROM s GROUP BY lang
""",
    tags=["llm-sampling", "importance-resample"],
)
def importance_resample_by_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR-shaped corpus resampling driven by the pinned-weight quality
    model (llm/text.py::quality_score_col): each document keeps with
    probability = its quality score, decided by the md5-bucket uniform of
    doc_id — so the kept corpus up-weights quality exactly and the whole
    selection replays bit-for-bit in the oracle.  The aggregate (docs,
    kept, mean kept score per lang) flips on any scoring or coin
    drift."""
    from .text import quality_score_col

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", quality_score_col("text").alias("score")
    )
    kept = importance_resample(scored, "score", "doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        rnd(
            F.sum(
                F.when(F.col("keep"), F.col("score"))
                .cast("decimal(19,6)")
            ).cast("double")
            / F.sum(F.col("keep").cast("long")),
            4,
        ).alias("mean_kept_score"),
    )


@register(
    "sample_offset_events_agg",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled,
       floor(sum("value") * 100 + 0.5) / 100 AS sum_value
FROM events
WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
      % 10000 >= 5000
  AND ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
      % 10000 < 6000
GROUP BY event_type
""",
    tags=["clickhouse-parity", "sample"],
)
def sample_offset_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``SAMPLE 0.1 OFFSET 0.5`` parity: the same
    deterministic 10% band, shifted to start at the 50% point of the
    hash space — the clause that lets k parallel consumers each read a
    DISJOINT sample (``OFFSET i/k``) with no coordination, because the
    bands tile the keyspace.  Same map-side predicate discipline as
    ``sample_clause_events_agg``; this band is disjoint from that row's
    ``[0, 0.1)`` band by construction."""
    ev = load_table(spark, sf_dir, "events")
    b = hash_bucket("event_id")
    return (
        ev.filter((b >= 5000) & (b < 6000))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
    )
