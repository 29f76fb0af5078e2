"""Semantic clustering over the embedding corpus (k-means, Lloyd's).

Training-data pipelines cluster document embeddings to stratify corpora,
balance domain mixes, and run *semantic* dedup (SemDeDup, Abbas et al.
2023: dedup within k-means clusters instead of all-pairs).  This module
is the engine half: deterministic Lloyd iterations expressed as
DataFrame ops, small enough state driver-side to stay honest at 100 TB.

Scale shape per round (N vectors, k clusters, d dims):

- assignment: ONE broadcast of the k×d centroid table against the corpus
  (`crossJoin(broadcast(...))` → JVM-side ``zip_with``/``aggregate``
  distance fold → ``min(struct(d, cl))`` per vector).  No shuffle of the
  embedding column itself beyond its initial partitioning; the k-factor
  row blowup never leaves the map side because the min-by folds it
  partially per partition.
- update: ``posexplode`` of the assigned vectors → groupBy (cluster,
  pos) mean — a k·d-sized aggregate, collected to the driver (512 rows
  at k=8, d=64) exactly like every production k-means broadcasts its
  centroids between rounds.

Determinism contract (the cross-engine gate needs bit-equal results):
components are quantized to integer micro-units BEFORE any arithmetic,
distances are exact BIGINT sums, argmin ties break on the lower cluster
id, and centroid updates round half-up on an exact integer-by-integer
division — so both engines walk identical centroid sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..queries.registry import register

K_CLUSTERS = 8
N_ROUNDS = 2
QUANT = 1_000_000

#: per-block byte budget for the semantic-dedup pair GEMM — bounds one
#: task's dot-product block at ~O(block_rows · |cluster|) instead of
#: |cluster|² (tests shrink it to force the multi-block path)
_GEMM_BLOCK_BYTES = 64 * 1024 * 1024


def _quantize(col):
    return F.transform(
        col,
        lambda v: F.floor(v.cast("double") * QUANT + F.lit(0.5)).cast("long"),
    )


def _assign(df: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, q) × centroids → (vec_id, q, cl, d).

    r14 (guide §4.2): exact int64 numpy assignment via ``mapInPandas`` —
    MAP-ONLY, where the old shape paid a crossJoin row blowup, an
    interpreted ``zip_with``/``aggregate`` distance fold per (vector,
    centroid), and a groupBy exchange that shuffled the q column every
    round.  Distances use the GEMM identity Σ(a-b)² = |a|² + |b|² - 2a·b
    — algebraically identical in exact integer arithmetic, and numpy
    int64 ops are exact, so the assignment (and the oracle-pinned
    centroid walk) is bit-identical.  ``np.argmin`` takes the FIRST
    minimum; centroid rows are sorted by cl, preserving the lower-cl
    tie-break.  The k×d centroid table ships in the task closure (it is
    already driver-side between rounds)."""
    import numpy as np

    rows = sorted(cent.collect(), key=lambda r: r["cl"])
    cls_arr_src = [int(r["cl"]) for r in rows]
    C = np.stack([np.asarray(r["cq"], dtype=np.int64) for r in rows])
    dims = C.shape[1]
    cmax = int(np.abs(C).max(initial=0))
    c2 = np.einsum("ij,ij->i", C, C)
    out_schema = "vec_id long, q array<long>, cl int, d long"

    def fn(batches):
        import numpy as np
        import pandas as pd

        cls_arr = np.asarray(cls_arr_src, dtype=np.int32)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack([np.asarray(x, dtype=np.int64) for x in pdf["q"]])
            m = max(int(np.abs(Q).max(initial=0)), cmax, 1)
            if 4 * m * m * dims >= (1 << 63):
                raise ValueError(
                    "quantized components too large for exact int64 "
                    f"distances (max |q|={m}, d={dims})"
                )
            d2 = (
                np.einsum("ij,ij->i", Q, Q)[:, None]
                + c2[None, :]
                - 2 * (Q @ C.T)
            )
            best = np.argmin(d2, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "q": pdf["q"],
                "cl": cls_arr[best],
                "d": d2[np.arange(len(best)), best],
            })

    return df.mapInPandas(fn, out_schema)


def kmeans_rounds(
    spark: SparkSession, df: DataFrame, k: int, n_rounds: int,
    keep_vec: bool = False,
) -> DataFrame:
    """Run ``n_rounds`` deterministic Lloyd rounds over (vec_id, q:
    array<long>); seed centroids are the k lowest vec_ids.  Returns the
    final assignment (vec_id, cl, d) — with the quantized vector kept as
    ``q`` when ``keep_vec`` (consumers that need components again avoid
    an N×N re-join against the source; at corpus scale that join is a
    full shuffle of the embedding column)."""
    seed_rows = (
        df.orderBy("vec_id").limit(k)
        .select("vec_id", "q").collect()
    )
    cent = spark.createDataFrame(
        [(i, list(r["q"])) for i, r in enumerate(seed_rows)],
        "cl int, cq array<long>",
    )
    assigned = None
    for rnd_no in range(n_rounds):
        assigned = _assign(df, cent).localCheckpoint()
        if rnd_no == n_rounds - 1:
            break
        upd = (
            assigned.select("cl", F.posexplode("q").alias("pos", "v"))
            .groupBy("cl", "pos")
            .agg(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
            )
            # round-half-up mean floor(s/c + 1/2) = floor((2s+c)/(2c)) in
            # PURE long arithmetic (pmod-corrected truncating div), so the
            # cross-engine bit-equality contract holds even when a
            # cluster's component sum exceeds 2^53 (double would round)
            .select(
                "cl", "pos",
                F.expr(
                    "(2*s + c - pmod(2*s + c, 2*c)) div (2*c)"
                ).cast("long").alias("cq"),
            )
        )
        # k·d rows — the canonical driver-side centroid exchange
        rows = upd.collect()
        by_cl: dict[int, dict[int, int]] = {}
        for r in rows:
            by_cl.setdefault(r["cl"], {})[r["pos"]] = r["cq"]
        cent = spark.createDataFrame(
            [
                (cl, [pos_map[p] for p in sorted(pos_map)])
                for cl, pos_map in sorted(by_cl.items())
            ],
            "cl int, cq array<long>",
        )
    if keep_vec:
        return assigned.select("vec_id", "cl", "d", "q")
    return assigned.select("vec_id", "cl", "d")


@register(
    "semantic_cluster_kmeans",
    oracle=f"""
WITH comp AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
),
seed AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id
        LIMIT {K_CLUSTERS})
),
cent0 AS (
  SELECT s.cl, c.pos, c.q AS cq
  FROM seed s JOIN comp c ON c.vec_id = s.vec_id
),
dist1 AS (
  SELECT c.vec_id, k.cl, sum((c.q - k.cq) * (c.q - k.cq)) AS d
  FROM comp c JOIN cent0 k ON k.pos = c.pos
  GROUP BY 1, 2
),
asg1 AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
    FROM dist1
  ) WHERE rn = 1
),
cent1 AS (
  SELECT a.cl, c.pos,
         CAST((2*sum(c.q) + count(*)
               - (((2*sum(c.q) + count(*)) % (2*count(*)) + 2*count(*))
                  % (2*count(*)))) // (2*count(*)) AS BIGINT) AS cq
  FROM asg1 a JOIN comp c ON c.vec_id = a.vec_id
  GROUP BY 1, 2
),
dist2 AS (
  SELECT c.vec_id, k.cl, sum((c.q - k.cq) * (c.q - k.cq)) AS d
  FROM comp c JOIN cent1 k ON k.pos = c.pos
  GROUP BY 1, 2
),
asg2 AS (
  SELECT vec_id, cl, d FROM (
    SELECT vec_id, cl, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
    FROM dist2
  ) WHERE rn = 1
)
SELECT CAST(cl AS INT) AS cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(vec_id) AS BIGINT) AS sum_vec_ids,
       CAST(sum(d) AS BIGINT) AS inertia_q
FROM asg2 GROUP BY cl ORDER BY cluster
""",
    tags=["llm-similarity", "iterative", "semantic-dedup"],
)
def semantic_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style corpus clustering: 2 deterministic Lloyd rounds,
    k=8, seeds = the 8 lowest vec_ids, micro-unit-quantized distances.
    The oracle replays the identical centroid walk positionally in SQL;
    every intermediate is an exact integer, so the value hash pins the
    full trajectory, not just the final histogram."""
    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.select("vec_id", _quantize(F.col("embedding")).alias("q"))
    asg = kmeans_rounds(spark, df, K_CLUSTERS, N_ROUNDS)
    return (
        asg.groupBy(F.col("cl").cast("int").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("vec_id").cast("long").alias("sum_vec_ids"),
            F.sum("d").cast("long").alias("inertia_q"),
        )
        .orderBy("cluster")
    )


def _cluster_dups(pdf):
    """Within-cluster dup scoring over one cluster's pandas frame.

    r13 (guide §4.2): moved from a self-join on cl into a numpy GEMM per
    cluster (applyInPandas).  The join shape pushed the dup predicate into
    the SortMergeJoin CONDITION, where the interpreted zip_with/aggregate
    dot product was evaluated three times per candidate pair on k=8 join
    keys (8 busy tasks) — the bench's single slowest stage.  Dot products
    are an int64 matrix product (exact: the guard below refuses inputs
    whose dot could exceed int64), the ≥-threshold test is
    float-prefiltered with a wide safety margin and then EXACT-verified
    in arbitrary-precision integer arithmetic, so the pair set is
    bit-identical to the oracle's 25·dot² ≥ 4·|a|²·|b|² predicate.

    r14 (VERDICT r13 #5): the GEMM is ROW-BLOCKED — the full q @ q.T held
    |cluster|²·8 bytes (plus triu/lhs/rhs temps ~4-5×) in one task, an
    OOM cliff for a skewed giant cluster where the old join streamed.
    Blocks bound per-task memory at ~O(block·|cluster|) while every
    upper-triangle pair is still scored exactly once with identical
    arithmetic, so the pair set is unchanged (unit-tested against the
    single-block path with a forced multi-block budget)."""
    import numpy as np
    import pandas as pd

    cl = int(pdf["cl"].iloc[0])
    v = pdf["vec_id"].to_numpy()
    if len(v) < 2:
        return pd.DataFrame(
            [(cl, 0, 0)], columns=["cl", "n_dup_pairs", "n_removed"]
        )
    order = np.argsort(v)  # va < vb ⇔ upper triangle after the sort
    q = np.stack(
        [np.asarray(x, dtype=np.int64) for x in pdf["q"].iloc[order]]
    )
    m = int(np.abs(q).max(initial=0))
    if m and m * m * q.shape[1] >= (1 << 63):
        raise ValueError(
            "quantized components too large for exact int64 dot "
            f"products (max |q|={m}, d={q.shape[1]})"
        )
    n = len(v)
    n2 = np.einsum("ij,ij->i", q, q)
    blk = max(1, int(_GEMM_BLOCK_BYTES // (8 * max(n, 1))))
    n_pairs = 0
    removed = np.zeros(n, dtype=bool)
    jj_all = np.arange(n)
    for s in range(0, n, blk):
        e = min(s + blk, n)
        dot = q[s:e] @ q.T  # (e-s) × n
        # upper triangle only: global row gi pairs with columns j > gi
        ii, jj = np.nonzero(jj_all[None, :] > np.arange(s, e)[:, None])
        d = dot[ii, jj]
        gi = ii + s
        lhs = 25.0 * (d.astype(np.float64) ** 2)
        rhs = 4.0 * n2[gi].astype(np.float64) * n2[jj].astype(np.float64)
        # float64 keeps ~1e-16 relative error; the 1e-9 margin makes the
        # prefilter sound (no false negatives), exact check settles the rest
        cand = (d >= 0) & (lhs >= rhs * (1.0 - 1e-9))
        ok = np.zeros(len(d), dtype=bool)
        for idx in np.nonzero(cand)[0]:
            dd = int(d[idx])
            ok[idx] = 25 * dd * dd >= 4 * int(n2[gi[idx]]) * int(n2[jj[idx]])
        n_pairs += int(ok.sum())
        removed[jj[ok]] = True
    return pd.DataFrame(
        [(cl, n_pairs, int(removed.sum()))],
        columns=["cl", "n_dup_pairs", "n_removed"],
    )


@register(
    "semantic_dedup_within_clusters",
    oracle=f"""
WITH comp AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
),
seed AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cl
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id
        LIMIT {K_CLUSTERS})
),
cent0 AS (
  SELECT s.cl, c.pos, c.q AS cq
  FROM seed s JOIN comp c ON c.vec_id = s.vec_id
),
dist1 AS (
  SELECT c.vec_id, k.cl, sum((c.q - k.cq) * (c.q - k.cq)) AS d
  FROM comp c JOIN cent0 k ON k.pos = c.pos
  GROUP BY 1, 2
),
asg1 AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
    FROM dist1
  ) WHERE rn = 1
),
cent1 AS (
  SELECT a.cl, c.pos,
         CAST((2*sum(c.q) + count(*)
               - (((2*sum(c.q) + count(*)) % (2*count(*)) + 2*count(*))
                  % (2*count(*)))) // (2*count(*)) AS BIGINT) AS cq
  FROM asg1 a JOIN comp c ON c.vec_id = a.vec_id
  GROUP BY 1, 2
),
dist2 AS (
  SELECT c.vec_id, k.cl, sum((c.q - k.cq) * (c.q - k.cq)) AS d
  FROM comp c JOIN cent1 k ON k.pos = c.pos
  GROUP BY 1, 2
),
asg2 AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
    FROM dist2
  ) WHERE rn = 1
),
norms AS (
  SELECT vec_id, sum(q * q) AS n2 FROM comp GROUP BY 1
),
pairs AS (
  SELECT a.cl, a.vec_id AS va, b.vec_id AS vb,
         (SELECT sum(ca.q * cb.q)
          FROM comp ca JOIN comp cb
            ON cb.pos = ca.pos AND cb.vec_id = b.vec_id
          WHERE ca.vec_id = a.vec_id) AS dot
  FROM asg2 a JOIN asg2 b ON b.cl = a.cl AND a.vec_id < b.vec_id
),
dups AS (
  SELECT p.cl, p.va, p.vb
  FROM pairs p
  JOIN norms na ON na.vec_id = p.va
  JOIN norms nb ON nb.vec_id = p.vb
  WHERE p.dot >= 0 AND 25 * p.dot * p.dot >= 4 * na.n2 * nb.n2
)
SELECT CAST(m.cl AS INT) AS cluster,
       CAST(count(DISTINCT m.vec_id) AS BIGINT) AS n_members,
       CAST(coalesce(d.n_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(coalesce(d.n_removed, 0) AS BIGINT) AS n_removed
FROM asg2 m
LEFT JOIN (
  SELECT cl, count(*) AS n_pairs, count(DISTINCT vb) AS n_removed
  FROM dups GROUP BY cl
) d ON d.cl = m.cl
GROUP BY m.cl, d.n_pairs, d.n_removed
ORDER BY cluster
""",
    tags=["llm-dedup", "llm-similarity", "iterative", "semantic-dedup"],
)
def semantic_dedup_within_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): near-dup detection scoped to k-means
    clusters — the sub-quadratic trade that makes embedding dedup
    feasible at corpus scale (pairs are scored only within a cluster, so
    cost is Σ|cluster|² instead of N²; recall is whatever the clustering
    captures, and the exact block-GEMM path measures that honestly).

    The cosine ≥ 0.4 predicate is evaluated in EXACT integer arithmetic
    on micro-unit components: dot ≥ 0 AND 25·dot² ≥ 4·|a|²·|b|²
    (0.4² = 4/25), decimal(38) on the Spark side and INT128 sums in
    DuckDB, so the pair SET is bit-identical across engines.  A member is
    'removed' when it is the higher vec_id of any in-cluster dup pair
    (keep-lowest-id, the same canonical rule as the MinHash keep list)."""
    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.select("vec_id", _quantize(F.col("embedding")).alias("q"))
    # keep_vec carries the quantized components through the fold so the
    # pair scoring needs no re-join against the source embeddings
    asg = kmeans_rounds(spark, df, K_CLUSTERS, N_ROUNDS, keep_vec=True)

    per_cl = (
        asg.select("cl", "vec_id", "q")
        .groupBy("cl")
        .applyInPandas(
            _cluster_dups, "cl int, n_dup_pairs long, n_removed long"
        )
    )
    members = asg.groupBy("cl").agg(
        F.countDistinct("vec_id").cast("long").alias("n_members")
    )
    return (
        members.join(per_cl, "cl", "left")
        .select(
            F.col("cl").cast("int").alias("cluster"),
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long")
            .alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).cast("long")
            .alias("n_removed"),
        )
        .orderBy("cluster")
    )
