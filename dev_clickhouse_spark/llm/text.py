"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything here is built-in column expressions (split / regexp_extract_all /
md5 / array functions) — JVM-side, whole-stage codegen, no Python in the hot
path.  At 100 TB these are embarrassingly parallel map-only scans.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..queries.registry import register

#: BPE-ish pre-tokenizer: letter runs, single digits, punctuation runs —
#: the shape GPT-style byte-pair pre-tokenization produces on ASCII text.
BPEISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]+"

#: Small stopword set used by the quality score (ratio features).
STOPWORDS = ("the", "a", "of", "and")


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpeish_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPEISH_PATTERN), 0))


def distinct_token_ratio(text: Column | str) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)) / F.size(t)


def stopword_ratio(text: Column | str) -> Column:
    t = tokens(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return hits / F.size(t)


def content_fingerprint(text: Column | str) -> Column:
    """Order-sensitive exact fingerprint: md5 of the raw text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def bag_fingerprint(text: Column | str) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token set —
    robust to token shuffling, the cheapest near-dup signal."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

@register(
    "text_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER)  AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+'))
            AS INTEGER)                               AS n_bpeish_tokens,
       CAST(length(text) AS INTEGER)                  AS n_chars,
       floor(len(list_distinct(string_split(text, ' ')))::DOUBLE
             / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS distinct_ratio
FROM documents
""",
    tags=["llm-text"],
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts, char length, vocabulary diversity."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("int").alias("n_tokens"),
        bpeish_token_count("text").cast("int").alias("n_bpeish_tokens"),
        F.length("text").cast("int").alias("n_chars"),
        rnd(distinct_token_ratio("text"), 4).alias("distinct_ratio"),
    )


@register(
    "text_quality_scores",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks, length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id, lang, n_chars,
         len(toks) AS n_tokens,
         len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS sw,
         len(list_distinct(toks)) AS dt
  FROM t
)
SELECT doc_id, lang,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       floor(sw::DOUBLE / n_tokens * 10000 + 0.5) / 10000       AS stopword_ratio,
       floor((1 - dt::DOUBLE / n_tokens) * 10000 + 0.5) / 10000 AS repetition,
       floor(least(n_chars / 400.0, 1.0) * 10000 + 0.5) / 10000 AS length_score
FROM m
""",
    tags=["llm-text"],
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: stopword ratio, repetition (1 − distinct
    ratio), saturating length score — the standard pretraining-filter trio."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        token_count("text").cast("int").alias("n_tokens"),
        rnd(stopword_ratio("text"), 4).alias("stopword_ratio"),
        rnd(1 - distinct_token_ratio("text"), 4).alias("repetition"),
        rnd(F.least(F.length("text") / 400.0, F.lit(1.0)), 4).alias("length_score"),
    )


def rolling_hash_fingerprints(
    docs: DataFrame, window: int = 16, keep: int = 8,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Winnowing-style document fingerprints from a Rabin-Karp rolling hash:
    polynomial hash (base 257, mod 2^61−1) over every ``window``-byte
    substring in O(n), keep the ``keep`` smallest values as the fingerprint
    set.  Two documents sharing fingerprints share long byte runs — the
    substring-level near-dup signal that token shingles miss.  Map-only
    Arrow stage (true rolling hashes aren't expressible as column
    expressions)."""
    MOD = (1 << 61) - 1
    BASE = 257

    def fingerprints(text: str) -> list[int]:
        data = (text or "").encode()
        if len(data) < window:
            return []
        h = 0
        pw = pow(BASE, window - 1, MOD)
        hashes = []
        for i, byte in enumerate(data):
            if i >= window:
                h = (h - data[i - window] * pw) % MOD
            h = (h * BASE + byte) % MOD
            if i >= window - 1:
                hashes.append(h)
        return sorted(set(hashes))[:keep]

    @F.pandas_udf("array<long>")
    def fp(texts: pd.Series) -> pd.Series:
        return texts.map(fingerprints)

    return docs.select(F.col(id_col), fp(F.col(text_col)).alias("fingerprints"))


@register("rolling_hash_fingerprints", tags=["llm-text", "llm-dedup"])  # rows-only
def rolling_hash_fingerprints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint sets per document (rows-only: the polynomial
    rolling hash is not SQL-expressible; determinism + near-dup sensitivity
    are covered in tests/test_llm.py)."""
    docs = load_table(spark, sf_dir, "documents")
    out = rolling_hash_fingerprints(docs)
    return out.select("doc_id", F.size("fingerprints").alias("n_fp"),
                      F.element_at("fingerprints", 1).alias("min_fp"))


#: language marker words for the n-gram/lexicon language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a"),
    "es": ("data", "row"),
    "de": ("key", "value"),
    "fr": ("query", "table"),
    "zh": ("spark", "column"),
}


@register(
    "lang_id_markers",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, lang,
         {', '.join(
             "len(list_filter(toks, x -> x IN ("
             + ', '.join(f"'{w}'" for w in ws)
             + f"))) AS c_{lang_code}"
             for lang_code, ws in LANG_MARKERS.items()
         )}
  FROM t
)
SELECT doc_id, lang,
       CASE greatest(c_en, c_es, c_de, c_fr, c_zh)
            WHEN c_en THEN 'en' WHEN c_es THEN 'es' WHEN c_de THEN 'de'
            WHEN c_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
FROM c
""",
    tags=["llm-text"],
)
def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID (the n-gram-heuristic shape: count
    language-discriminative tokens, take the argmax with a fixed tie order).
    On real corpora the markers are learned character n-grams; the pipeline
    shape — map-only scoring, no shuffle — is identical."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", tokens("text").alias("toks"))
    def marker_count(words: tuple[str, ...]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(F.col("toks"), lambda x: F.array_contains(arr, x)))

    counts = t.select(
        "doc_id",
        "lang",
        *[
            marker_count(ws).alias(f"c_{lang_code}")
            for lang_code, ws in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"c_{lc}") for lc in LANG_MARKERS])
    pred = F.when(F.col("c_en") == best, "en")
    for lc in ("es", "de", "fr"):
        pred = pred.when(F.col(f"c_{lc}") == best, lc)
    pred = pred.otherwise("zh")
    return counts.select("doc_id", "lang", pred.alias("predicted_lang"))


@register(
    "tfidf_top_keywords",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), df AS (
  SELECT token, count(*) AS doc_freq FROM tok GROUP BY token
), n AS (SELECT count(*) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, t.token,
         len(list_filter(string_split(d.text, ' '), x -> x = t.token)) AS freq
  FROM tok t JOIN documents d USING (doc_id)
), scored AS (
  SELECT tf.doc_id, tf.token,
         floor(tf.freq * (n.n_docs::DOUBLE / df.doc_freq) * 10000 + 0.5) / 10000
           AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token) AS rn
  FROM scored
)
SELECT doc_id, token, CAST(rn AS INTEGER) AS rank, score
FROM ranked WHERE rn <= 3
""",
    tags=["llm-text", "tfidf"],
)
def tfidf_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive keywords per document by TF·(N/df) weighting (the
    log-free tf-idf variant — pure arithmetic, so both engines score
    bit-identically).  Shapes: explode distinct tokens → corpus df counts
    (one shuffle) → per-doc term frequency (map-side) → broadcast df join →
    windowed top-k."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    df_counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = docs.count()
    tf = tok.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "token",
        F.size(F.filter(tokens("text"), lambda x: x == F.col("token"))).alias("freq"),
    )
    scored = tf.join(F.broadcast(df_counts), "token").select(
        "doc_id",
        "token",
        rnd(F.col("freq") * (F.lit(float(n_docs)) / F.col("doc_freq")), 4).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", F.col("rank").cast("int").alias("rank"), "score")
    )


@register(
    "doc_fingerprints",
    oracle="""
SELECT doc_id,
       md5(text) AS exact_fp,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS bag_fp
FROM documents
""",
    tags=["llm-text", "llm-dedup"],
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + order-insensitive document fingerprints (md5) — the join keys
    for exact and bag-of-words dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        content_fingerprint("text").alias("exact_fp"),
        bag_fingerprint("text").alias("bag_fp"),
    )
