"""Dataset-curation operators: context chunking + benchmark decontamination.

Two more stages of the standard pretraining pipeline (beyond dedup/
quality/sampling, which live in sibling modules):

- ``chunk_documents`` — split each document into overlapping
  ``max_tokens``-token windows (the tokenize-and-chunk step before
  sequence packing).  Sliding-window math: chunk *i* covers tokens
  ``[i*step, i*step + max_tokens)`` with ``step = max_tokens − overlap``;
  the final chunk is allowed to run short so every token is covered
  exactly once by the non-overlap region.
- ``decontaminate_against_benchmark`` — flag training documents sharing
  any word 8-gram with a held-out benchmark corpus (the GPT-3/Llama-style
  test-set contamination sweep).  Shape: explode both sides to n-grams,
  inner-join on the gram, count hits per document, left-join the flags
  back so clean documents keep an explicit 0.

Both are pure JVM column operations (split / sequence / transform /
slice / explode — no Python UDFs).  At 100 TB the decontamination join
shuffles (gram, doc_id) pairs; the benchmark side is tiny (a benchmark
suite is MBs), so Catalyst broadcast-joins it and the sweep stays
map-side.  For very large benchmark sets, swap the gram string for
``xxhash64(gram)`` to shrink the shuffle — kept as strings here for
bit-identical oracle replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..queries.registry import register

CHUNK_MAX_TOKENS = 64
CHUNK_OVERLAP = 16
#: production contamination sweeps use 8-13 word grams (GPT-3 used 13,
#: Llama 2 uses token 8-grams); the synthetic driver corpus is random
#: word-soup where 8-grams never collide, so the default is 5 to keep a
#: live signal in the registry output — the operator takes n as a param.
DECON_NGRAM = 5
BENCHMARK_SOURCE = "src19"  # held-out slice of the driver corpus


def chunk_spans(docs: DataFrame, max_tokens: int = CHUNK_MAX_TOKENS,
                overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """One row per (doc_id, chunk_idx): token span + chunk text (map-only)."""
    step = max_tokens - overlap
    ws = F.split("text", " ")
    n = F.size(ws)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0),
        F.ceil((n - F.lit(max_tokens)) / F.lit(float(step))).cast("int"),
    )
    return (
        docs.select("doc_id", ws.alias("ws"), n_chunks.alias("k"))
        .select("doc_id", "ws",
                F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ",
                F.slice(F.col("ws"), F.col("chunk_idx") * step + 1, max_tokens),
            ).alias("chunk_text"),
        )
        .withColumn("n_chunk_tokens",
                    F.size(F.split("chunk_text", " ")).cast("int"))
    )


@register(
    "chunk_documents",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), spans AS (
  SELECT doc_id, ws,
         unnest(range(0, 1 + greatest(0,
             CAST(ceil((len(ws) - {CHUNK_MAX_TOKENS}) * 1.0
                       / {CHUNK_MAX_TOKENS - CHUNK_OVERLAP}) AS INTEGER)))) AS i
  FROM w
)
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_idx,
       array_to_string(
         ws[i * {CHUNK_MAX_TOKENS - CHUNK_OVERLAP} + 1
           : i * {CHUNK_MAX_TOKENS - CHUNK_OVERLAP} + {CHUNK_MAX_TOKENS}],
         ' ') AS chunk_text,
       CAST(len(ws[i * {CHUNK_MAX_TOKENS - CHUNK_OVERLAP} + 1
                  : i * {CHUNK_MAX_TOKENS - CHUNK_OVERLAP} + {CHUNK_MAX_TOKENS}])
            AS INTEGER) AS n_chunk_tokens
FROM spans
""",
    tags=["llm-text", "chunking"],
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping {64-token, 16-overlap} context chunks per document —
    1→N fan-out with zero shuffle (the explode happens inside the scan
    stage); chunk counts scale with corpus tokens, not document count."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_spans(docs)


def word_ngrams(docs: DataFrame, n: int = DECON_NGRAM,
                id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-grams per document (empty for docs under n words)."""
    grams = F.expr(
        f"""CASE WHEN size(split(text, ' ')) < {n}
                 THEN CAST(array() AS array<string>)
                 ELSE transform(sequence(1, size(split(text, ' ')) - {n - 1}),
                                i -> concat_ws(' ', slice(split(text, ' '), i, {n})))
            END"""
    )
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("gram"))
        .distinct()
    )


@register(
    "decontaminate_against_benchmark",
    oracle=f"""
WITH grams AS (
  SELECT doc_id, source, unnest(list_distinct(
           list_transform(range(1, len(string_split(text, ' ')) - {DECON_NGRAM - 2}),
                          i -> array_to_string(
                                 (string_split(text, ' '))[i : i + {DECON_NGRAM - 1}],
                                 ' ')))) AS gram
  FROM documents
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE source = '{BENCHMARK_SOURCE}'
), hits AS (
  SELECT g.doc_id, count(*) AS n
  FROM grams g JOIN bench b ON g.gram = b.gram
  WHERE g.source <> '{BENCHMARK_SOURCE}'
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(hits.n, 0) AS BIGINT) AS n_contaminated_grams,
       CAST(CASE WHEN hits.n IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS is_contaminated
FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
WHERE d.source <> '{BENCHMARK_SOURCE}'
""",
    tags=["llm-dedup", "decontamination"],
)
def decontaminate_against_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training document: how many of its distinct word n-grams appear
    anywhere in the benchmark slice ({BENCHMARK_SOURCE}), plus the drop
    flag.  The benchmark gram set is small → broadcast; training grams
    never shuffle, so the sweep is one map-side semi-count."""
    docs = load_table(spark, sf_dir, "documents")
    bench_grams = (
        word_ngrams(docs.filter(F.col("source") == BENCHMARK_SOURCE))
        .select("gram").distinct()
    )
    train = docs.filter(F.col("source") != BENCHMARK_SOURCE)
    hits = (
        word_ngrams(train)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .withColumnRenamed("doc_id", "h_doc_id")
    )
    return (
        train.join(hits, F.col("doc_id") == F.col("h_doc_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).alias("n_contaminated_grams"),
            F.when(F.col("n").isNotNull(), 1).otherwise(0)
            .cast("int").alias("is_contaminated"),
        )
    )


#: ordered curation gates: (stage name, SQL boolean the doc must pass).
#: Both engines evaluate the SAME expressions; each stage's survivor count
#: is the conjunction of all gates up to it — the funnel a curation run
#: reports before committing a filter config.
FUNNEL_GATES: list[tuple[str, str]] = [
    ("min_chars_100", "n_chars >= 100"),
    ("min_tokens_20", "n_tokens >= 20"),
    ("mean_word_len_2_14",
     "(CAST(n_chars AS DOUBLE) / n_tokens) >= 2.0 "
     "AND (CAST(n_chars AS DOUBLE) / n_tokens) <= 14.0"),
    ("ascii_ratio_50", "ascii_ratio >= 0.5"),
]


def _funnel_oracle() -> str:
    conds, selects = [], [
        "CAST(0 AS INTEGER) AS stage", "'total' AS gate",
        "CAST(count(*) AS BIGINT) AS n_surviving",
    ]
    stages = ["SELECT " + ", ".join(selects) + " FROM t"]
    for i, (name, cond) in enumerate(FUNNEL_GATES, start=1):
        conds.append(f"({cond})")
        stages.append(
            f"SELECT CAST({i} AS INTEGER) AS stage, '{name}' AS gate, "
            "CAST(count(*) AS BIGINT) AS n_surviving FROM t WHERE "
            + " AND ".join(conds)
        )
    return (
        """
WITH t AS (
  SELECT n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_replace(text, '[^ -~]', '', 'g')) AS DOUBLE)
           / n_chars AS ascii_ratio
  FROM documents WHERE n_chars > 0
)
"""
        + "\nUNION ALL\n".join(stages)
    )


@register("curation_filter_funnel", oracle=_funnel_oracle(), tags=["llm-quality"])
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts through the chained curation gates (length → token
    count → mean word length → ASCII ratio) — the funnel report that tells
    a curation run which filter is doing the cutting BEFORE committing it.
    One scan computes every per-doc signal JVM-side; the funnel itself is a
    single aggregation of conjunction flags (no per-stage rescans), so the
    cost at 100 TB is one pass + a rows=stages result."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    t = docs.select(
        F.col("n_chars"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (
            F.length(F.regexp_replace("text", "[^ -~]", "")).cast("double")
            / F.col("n_chars")
        ).alias("ascii_ratio"),
    )
    flags, acc = [], None
    for name, cond in FUNNEL_GATES:
        c = F.expr(cond)
        acc = c if acc is None else (acc & c)
        flags.append(F.sum(acc.cast("long")).alias(name))
    agg = t.agg(F.count(F.lit(1)).alias("total"), *flags)
    names = ["total"] + [n for n, _ in FUNNEL_GATES]
    stacked = agg.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).cast("int").alias("stage"),
                    F.lit(n).alias("gate"),
                    F.col(n).cast("long").alias("n_surviving"),
                )
                for i, n in enumerate(names)
            ])
        ).alias("s")
    )
    return stacked.select("s.stage", "s.gate", "s.n_surviving")
