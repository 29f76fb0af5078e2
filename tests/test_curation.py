"""Curation-pack tests: chunking invariants (full coverage, overlap
consistency, reconstruction) and decontamination on planted overlaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.llm.curation import (
    CHUNK_MAX_TOKENS,
    CHUNK_OVERLAP,
    chunk_documents,
    chunk_spans,
    decontaminate_against_benchmark,
)

SF = "/root/testdata/sf0.001"
STEP = CHUNK_MAX_TOKENS - CHUNK_OVERLAP


def test_chunks_cover_and_reconstruct(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    originals = {r.doc_id: r.text for r in docs.collect()}
    chunks: dict[int, list] = {}
    for r in chunk_documents(spark, SF).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    assert set(chunks) == set(originals)
    for doc_id, rows in chunks.items():
        rows.sort(key=lambda r: r.chunk_idx)
        words = originals[doc_id].split(" ")
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        # every chunk is exactly the declared token span of the original
        for r in rows:
            start = r.chunk_idx * STEP
            expect = words[start:start + CHUNK_MAX_TOKENS]
            assert r.chunk_text.split(" ") == expect
            assert r.n_chunk_tokens == len(expect)
        # stitching non-overlap prefixes + final chunk reconstructs the doc
        rebuilt = []
        for r in rows[:-1]:
            rebuilt.extend(r.chunk_text.split(" ")[:STEP])
        rebuilt.extend(rows[-1].chunk_text.split(" "))
        assert rebuilt == words
        # all chunks but the last are exactly max_tokens long
        assert all(r.n_chunk_tokens == CHUNK_MAX_TOKENS for r in rows[:-1])


def test_short_doc_yields_single_chunk(spark, tmp_path):
    spark.createDataFrame(
        [(1, "just five words right here", "en", "src0", 26)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = chunk_documents(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].chunk_idx == 0
    assert rows[0].chunk_text == "just five words right here"
    assert rows[0].n_chunk_tokens == 5


def test_decontamination_flags_planted_overlap(spark, tmp_path):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        # shares the 5-gram 'beta gamma delta epsilon zeta' with the benchmark
        (1, "x beta gamma delta epsilon zeta y", "en", "src0", 0),
        # same words, different order: no shared 5-gram
        (2, "zeta epsilon delta gamma beta alpha", "en", "src0", 0),
        # too short for any 5-gram
        (3, "alpha beta", "en", "src0", 0),
        # benchmark member itself must NOT appear in the output
        (4, bench_text, "en", "src19", 0),
        # contains TWO distinct shared 5-grams
        (5, "alpha beta gamma delta epsilon zeta tail", "en", "src0", 0),
    ]
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           decontaminate_against_benchmark(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].n_contaminated_grams, out[1].is_contaminated) == (1, 1)
    assert (out[2].n_contaminated_grams, out[2].is_contaminated) == (0, 0)
    assert (out[3].n_contaminated_grams, out[3].is_contaminated) == (0, 0)
    # shares 'alpha beta gamma delta epsilon' AND 'beta gamma delta epsilon zeta'
    assert (out[5].n_contaminated_grams, out[5].is_contaminated) == (2, 1)


def test_chunk_spans_respects_custom_params(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g h i j")], ["doc_id", "text"])
    rows = sorted(
        chunk_spans(docs, max_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_text for r in rows] == [
        "a b c d", "c d e f", "e f g h", "g h i j",
    ]


def test_curation_filter_funnel_is_monotonic(spark):
    from dev_clickhouse_spark.llm.curation import curation_filter_funnel

    rows = curation_filter_funnel(spark, "/root/testdata/sf0.001").orderBy(
        "stage"
    ).collect()
    assert rows[0].gate == "total" and rows[0].n_surviving > 0
    counts = [r.n_surviving for r in rows]
    # each chained gate can only shrink the survivor set
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert len(rows) == 5
