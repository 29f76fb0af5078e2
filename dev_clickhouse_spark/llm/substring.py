"""Span-level (substring) deduplication over the ``documents`` table.

Doc-level dedup (exact / MinHash / SimHash / n-gram Jaccard — llm/dedup.py)
removes whole near-duplicate documents; the other half of the published
training-data recipe is SPAN-level dedup: find the repeated boilerplate
(license headers, navigation chrome, templated paragraphs) that recurs
across otherwise-distinct documents and cut just those spans (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better", which
uses suffix arrays on a single machine).

Spark-first translation with LINEAR shuffle — no suffix array, no
quadratic candidate set:

1. tokenize (the engine's single-space convention, llm/text.py) and emit
   every k-token gram with its position: one posting row per (doc, pos);
2. hash grams to 64-bit map-side (xxhash64 — the hashed-long shingle
   discipline from llm/dedup.py) and keep the DISTINCT hashes seen in
   >= min_docs distinct documents — one shuffle keyed by gram hash, with
   partial aggregation; heavy boilerplate grams collapse to ONE row each,
   so hot grams cannot skew the reduce side;
3. semi-join the postings back to that dup-hash set (equi-join, no
   fan-out: the dup set is one row per hash) to flag duplicated
   positions;
4. per document, merge flagged [pos, pos+k-1] intervals into maximal
   duplicated spans with a running-max window (gaps-and-islands) — all
   JVM-side window arithmetic, partitioned by doc.

Every duplicated span of length >= k is found exactly (a span shorter
than k is below the match threshold by definition); total shuffle is
O(total tokens) postings + O(distinct grams) aggregate rows, both linear
in corpus size, so the plan survives 100 TB where a suffix array does
not distribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..queries.registry import register


def gram_postings(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """One row per k-token gram occurrence: (doc_id, pos, gh).

    ``pos`` is 1-based token offset; ``gh`` the 64-bit gram hash.  Docs
    shorter than k tokens emit nothing (guarded — Spark's ``sequence``
    would otherwise count DOWN for an empty range)."""
    t = F.split(F.col(text_col), " ")
    n = F.size(t)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select("doc_id", t.alias("t"), idx.alias("idx"))
        .select("doc_id", "t", F.explode("idx").alias("pos"))
        .select(
            "doc_id",
            "pos",
            F.xxhash64(F.array_join(F.slice("t", F.col("pos"), k), " ")).alias(
                "gh"
            ),
        )
    )


def duplicated_gram_hashes(postings: DataFrame, min_docs: int = 2) -> DataFrame:
    """DISTINCT hashes of grams appearing in >= min_docs documents — the
    one shuffle of the pipeline, map-side combinable, one output row per
    duplicated gram no matter how many documents repeat it."""
    return (
        postings.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gh")
    )


def dup_spans(docs: DataFrame, k: int = 8, min_docs: int = 2) -> DataFrame:
    """Maximal duplicated token spans per document:
    (doc_id, span_start, span_end) with 1-based inclusive token offsets."""
    # r14 plan audit (guide §3.3): postings feed BOTH the duplicated-hash
    # aggregate and the flagged join, so Catalyst re-ran the full
    # tokenize+gram+hash pass twice per plan.  The lazy checkpoint
    # materializes the (doc_id, pos, gh) rows once — corpus-token-sized,
    # three narrow columns, the same deliberate trade as the r13 ngram
    # index checkpoint — and dies with the DataFrame (no cross-run reuse).
    postings = gram_postings(docs, k).localCheckpoint(eager=False)
    dup = duplicated_gram_hashes(postings, min_docs)
    flagged = postings.join(dup, "gh").select(
        "doc_id", "pos", (F.col("pos") + F.lit(k - 1)).alias("end")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    islands = flagged.withColumn(
        "island", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"), F.max("end").alias("span_end")
    ).drop("island")


def cut_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Apply span cuts: rebuild each document's text with every
    duplicated token range removed (all occurrences — the boilerplate-
    strip policy).  Rebuild is an anti-join of token positions against
    span intervals, re-joined in order: map-side explode + one window,
    no Python in the path.  Docs without spans pass through unchanged."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    # spans are maximal (non-overlapping), so exploding them to flagged
    # positions is duplicate-free and keeps the join strictly equi-keyed
    flag_pos = spans.select(
        "doc_id",
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    )
    kept = toks.join(flag_pos, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s.tok,
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_tokens"),
    )
    return rebuilt


@register(
    "dedup_substring_cut_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, u.i AS pos, array_to_string(t[u.i:u.i+7], ' ') AS g
  FROM toks, LATERAL unnest(range(1, len(t) - 6)) AS u(i)
  WHERE len(t) >= 8
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
),
flagged AS (
  SELECT DISTINCT tk.doc_id, tk.pos
  FROM (SELECT doc_id, u.i AS pos
        FROM toks, LATERAL unnest(range(1, len(t) + 1)) AS u(i)) tk
  JOIN (SELECT doc_id, pos AS s, pos + 7 AS e
        FROM grams JOIN dup USING (g)) f
    ON tk.doc_id = f.doc_id AND tk.pos BETWEEN f.s AND f.e
),
kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok
  FROM (SELECT doc_id, u.i AS pos, t[u.i] AS tok
        FROM toks, LATERAL unnest(range(1, len(t) + 1)) AS u(i)) tk
  ANTI JOIN flagged f ON tk.doc_id = f.doc_id AND tk.pos = f.pos
)
SELECT k.doc_id,
       CAST(count(*) AS BIGINT) AS kept_tokens,
       md5(string_agg(k.tok, ' ' ORDER BY k.pos)) AS clean_md5
FROM kept k
JOIN (SELECT DISTINCT doc_id FROM flagged) d ON k.doc_id = d.doc_id
GROUP BY k.doc_id
""",
    tags=["llm-dedup", "substring-dedup"],
)
def dedup_substring_cut_stats(spark, sf_dir: str) -> DataFrame:
    """The span CUT applied: for every document that had a duplicated
    span, the md5 of the rebuilt (span-stripped) text plus the kept
    token count (documents that are duplicated WHOLESALE keep zero
    tokens and drop out — whole-doc removal is doc-level dedup's job,
    llm/dedup.py).  An off-by-one in interval merging, a dropped or
    extra token at a span boundary, or misordered reassembly changes
    the md5 — the strongest end-to-end gate the cut path can have."""
    docs = load_table(spark, sf_dir, "documents")
    spans = dup_spans(docs, k=8, min_docs=2)
    affected = spans.select("doc_id").distinct()
    rebuilt = cut_spans(docs.join(affected, "doc_id"), spans)
    return rebuilt.select(
        "doc_id",
        "kept_tokens",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    )


@register(
    "dedup_substring_spans",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, u.i AS pos, array_to_string(t[u.i:u.i+7], ' ') AS g
  FROM toks, LATERAL unnest(range(1, len(t) - 6)) AS u(i)
  WHERE len(t) >= 8
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
),
flagged AS (
  SELECT doc_id, pos, pos + 7 AS e FROM grams JOIN dup USING (g)
),
islands AS (
  SELECT doc_id, pos, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS brk
  FROM flagged
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(e) AS e
  FROM (SELECT doc_id, pos, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM islands)
  GROUP BY doc_id, island
)
SELECT sp.doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(sp.e - sp.s + 1) AS BIGINT) AS dup_tokens,
       CAST(any_value(len(tk.t)) AS BIGINT) AS total_tokens,
       floor(sum(sp.e - sp.s + 1)::DOUBLE / any_value(len(tk.t))
             * 10000 + 0.5) / 10000 AS dup_ratio
FROM spans sp JOIN toks tk USING (doc_id)
GROUP BY sp.doc_id
""",
    tags=["llm-dedup", "substring-dedup"],
)
def dedup_substring_spans(spark, sf_dir: str) -> DataFrame:
    """Per-document summary of cross-document duplicated spans at k=8
    tokens: span count, duplicated-token total, and duplicated fraction.
    Spark matches grams by 64-bit hash (the production scale path); the
    oracle matches the gram STRINGS — agreement also certifies the
    hashed postings introduce no false merges on this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    spans = dup_spans(docs, k=8, min_docs=2)
    n_tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("total_tokens")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    return per_doc.join(n_tok, "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        rnd(
            F.col("dup_tokens").cast("double") / F.col("total_tokens"), 4
        ).alias("dup_ratio"),
    )
