"""Span-level substring dedup on a hand-built corpus where every
expected span is known exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.llm.substring import cut_spans, dup_spans

BOILER = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_found_with_exact_offsets(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + BOILER + " gamma delta"),
            (2, "one two three " + BOILER + " four"),
            (3, "nothing shared here at all in this document body text"),
        ],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_spans(docs, k=8, min_docs=2).collect()
    }
    # doc 1: boilerplate occupies tokens 3..12; doc 2: tokens 4..13
    assert spans == {(1, 3, 12), (2, 4, 13)}


def test_overlapping_grams_merge_to_one_maximal_span(spark):
    shared = " ".join(f"w{i}" for i in range(20))  # 20 shared tokens
    docs = _docs(
        spark,
        [(1, "x " + shared + " y"), (2, "p q r " + shared)],
    )
    got = dup_spans(docs, k=8, min_docs=2).collect()
    by_doc = {r.doc_id: (r.span_start, r.span_end) for r in got}
    assert len(got) == 2  # ONE merged span per doc, not 13 gram-spans
    assert by_doc[1] == (2, 21)
    assert by_doc[2] == (4, 23)


def test_two_disjoint_spans_stay_separate(spark):
    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    docs = _docs(
        spark,
        [
            (1, a + " mid1 mid2 mid3 " + b),
            (2, a + " other words entirely distinct " + b),
        ],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_spans(docs, k=8, min_docs=2).collect()
    )
    assert got == [(1, 1, 8), (1, 12, 19), (2, 1, 8), (2, 13, 20)]


def test_short_docs_emit_nothing(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    assert dup_spans(docs, k=8, min_docs=2).count() == 0


def test_cut_rebuilds_exact_residue(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + BOILER + " gamma delta"),
            (2, BOILER + " tail1 tail2"),
        ],
    )
    spans = dup_spans(docs, k=8, min_docs=2)
    out = {r.doc_id: r for r in cut_spans(docs, spans).collect()}
    assert out[1].clean_text == "alpha beta gamma delta"
    assert out[1].kept_tokens == 4
    assert out[2].clean_text == "tail1 tail2"
    assert out[2].kept_tokens == 2


def test_cut_passes_span_free_docs_through(spark):
    docs = _docs(
        spark,
        [(5, "completely unique body of text with no twin anywhere")],
    )
    spans = dup_spans(docs, k=8, min_docs=2)
    out = cut_spans(docs, spans).collect()
    assert len(out) == 1
    assert out[0].clean_text == (
        "completely unique body of text with no twin anywhere"
    )


def test_min_docs_three_ignores_pairs(spark):
    docs = _docs(
        spark,
        [
            (1, "x " + BOILER),
            (2, "y " + BOILER),
            (3, "unrelated text body entirely z1 z2 z3 z4 z5 z6"),
        ],
    )
    assert dup_spans(docs, k=8, min_docs=3).count() == 0
    docs3 = docs.union(_docs(spark, [(4, "z " + BOILER)]))
    assert dup_spans(docs3, k=8, min_docs=3).count() == 3
