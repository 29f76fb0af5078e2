"""Pretraining-corpus content signals: repetition metrics + PII redaction.

Two standard curation stages the reference's warehouse doesn't have but any
100 TB training-data pipeline runs early:

- **Repetition signals** (Gopher-style, Rae et al. 2021 §A1.1): fraction of
  words taken by the most frequent word, fraction of bigrams taken by the
  most frequent bigram, and duplicate-bigram fraction.  High values mark
  boilerplate / SEO-spam documents for the quality filter.
- **PII redaction**: regex scrubbing of emails, IPv4 literals, phone
  numbers, and long digit runs (card/account numbers) into typed
  placeholder tokens — the C4/Dolma-style pre-release hygiene pass.

Everything is JVM-side (`split`/`explode`/`regexp_*` — no Python UDFs):
the repetition aggregates are two partial-agg shuffles keyed on
(doc_id, token) then doc_id, and redaction is map-only, so both stages
scale linearly with corpus bytes.  Regex patterns are restricted to the
syntax subset Java regex and RE2 (DuckDB) interpret identically — no
backrefs, no lookaround — so the oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..queries.registry import register


def _r(expr: str, scale: int) -> str:
    m = 10 ** scale
    return f"floor(({expr}) * {m} + 0.5) / {m}"


# ---------------------------------------------------------------------------
# PII patterns — shared Java-regex/RE2 subset, replayed verbatim in DuckDB
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # order matters: emails before digit runs (addresses can embed digits),
    # IPv4 before phone (both are dotted/dashed digit groups)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "digit_run": (r"\b\d{13,19}\b", "<ID>"),
}


def pii_redact(col: Column | str) -> Column:
    """Redact all PII pattern classes into placeholder tokens (map-only)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """One ``n_<class>`` int column per PII pattern class."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(c, F.lit(pattern), 0))
        .cast("int").alias(f"n_{name}")
        for name, (pattern, _) in PII_PATTERNS.items()
    ]


@register(
    "pii_redaction_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_PATTERNS["email"][0]}')) AS INTEGER)     AS n_email,
       CAST(len(regexp_extract_all(text, '{PII_PATTERNS["ipv4"][0]}')) AS INTEGER)      AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{PII_PATTERNS["phone"][0]}')) AS INTEGER)     AS n_phone,
       CAST(len(regexp_extract_all(text, '{PII_PATTERNS["digit_run"][0]}')) AS INTEGER) AS n_digit_run,
       CAST(length(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{PII_PATTERNS["email"][0]}', '<EMAIL>', 'g'),
               '{PII_PATTERNS["ipv4"][0]}', '<IP>', 'g'),
             '{PII_PATTERNS["phone"][0]}', '<PHONE>', 'g'),
           '{PII_PATTERNS["digit_run"][0]}', '<ID>', 'g')
       ) AS INTEGER) AS redacted_len
FROM documents
""",
    tags=["llm-text", "pii"],
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII match counts + post-redaction length.  The driver
    corpus is synthetic word-soup (all zeros); tests/test_signals.py proves
    the match/replace behavior on PII-bearing fixtures and cross-checks the
    Java-regex/RE2 dialect parity DuckDB relies on."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        *pii_counts("text"),
        F.length(pii_redact("text")).cast("int").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------

_BIGRAMS = """
CASE WHEN size({w}) < 2 THEN CAST(array() AS array<string>)
     ELSE transform(sequence(1, size({w}) - 1),
                    i -> concat(element_at({w}, i), ' ', element_at({w}, i + 1)))
END
"""


def _token_stats(docs: DataFrame, tok_col: Column, out_prefix: str) -> DataFrame:
    """max-count / total-count / distinct-count per doc over an exploded
    token column — one (doc_id, token) shuffle with map-side combine, then
    a doc_id re-aggregate (AQE coalesces the tiny second stage)."""
    return (
        docs.select("doc_id", F.explode(tok_col).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias(f"{out_prefix}_max"),
            F.sum("c").alias(f"{out_prefix}_n"),
            F.count("*").alias(f"{out_prefix}_distinct"),
        )
    )


@register(
    "text_repetition_signals",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS tok FROM w)
  GROUP BY doc_id, tok
),
wstat AS (SELECT doc_id, max(c) AS mw, sum(c) AS nw FROM wc GROUP BY doc_id),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS tok
  FROM w
),
bc AS (SELECT doc_id, tok, count(*) AS c FROM bg GROUP BY doc_id, tok),
bstat AS (
  SELECT doc_id, max(c) AS mb, sum(c) AS nb, count(*) AS db FROM bc GROUP BY doc_id
)
SELECT w.doc_id AS doc_id,
       {_r('1.0 * wstat.mw / wstat.nw', 6)} AS top_word_frac,
       {_r('coalesce(1.0 * bstat.mb / bstat.nb, 0.0)', 6)} AS top_bigram_frac,
       {_r('coalesce(1.0 - 1.0 * bstat.db / bstat.nb, 0.0)', 6)} AS dup_bigram_frac
FROM w
JOIN wstat ON w.doc_id = wstat.doc_id
LEFT JOIN bstat ON w.doc_id = bstat.doc_id
""",
    tags=["llm-text", "gopher"],
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition trio per document: top-word fraction, top-bigram
    fraction, duplicate-bigram fraction.  All ratios divide exact integer
    counts, so the doubles agree bit-for-bit across engines before the
    final 6dp round."""
    # r14 plan audit: the split-token array feeds the word AND bigram stat
    # branches (2 scans of documents per plan).  A lazy checkpoint was
    # MEASURED as a wash at sf0.1 (same-session medians 2.8 vs 2.9 s) and
    # is a bad trade at scale — the split is cheap per row while the
    # materialized array outweighs the raw text — so the two-scan shape
    # is kept deliberately.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    wstat = _token_stats(docs, F.col("ws"), "w")
    bstat = _token_stats(
        docs, F.expr(_BIGRAMS.format(w="ws")), "b"
    ).withColumnRenamed("doc_id", "b_doc_id")
    return (
        wstat.join(bstat, F.col("doc_id") == F.col("b_doc_id"), "left")
        .select(
            "doc_id",
            rnd(F.lit(1.0) * F.col("w_max") / F.col("w_n"), 6)
            .alias("top_word_frac"),
            rnd(F.coalesce(F.lit(1.0) * F.col("b_max") / F.col("b_n"),
                           F.lit(0.0)), 6).alias("top_bigram_frac"),
            rnd(F.coalesce(F.lit(1.0) - F.lit(1.0) * F.col("b_distinct")
                           / F.col("b_n"), F.lit(0.0)), 6)
            .alias("dup_bigram_frac"),
        )
    )
