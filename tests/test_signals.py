"""Content-signal tests: PII redaction on PII-bearing fixtures (the driver
corpus is clean word-soup, so this is where the regexes face real PII) and
Gopher repetition metrics vs a Python brute force.  The Java-regex/RE2
parity check replays every pattern in DuckDB on the same fixture rows —
the exact dialect assumption the oracle SQL rests on."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

from pyspark.sql import functions as F

from dev_clickhouse_spark.llm.signals import (
    PII_PATTERNS,
    pii_counts,
    pii_redact,
    text_repetition_signals,
)

FIXTURE = [
    (1, "contact me at jane.doe+spam@example.co.uk or call 555-123-4567 now"),
    (2, "server 10.0.255.1 talked to 192.168.1.77 over tls"),
    (3, "card 4111111111111111 expires soon, acct 12345678901234567"),
    (4, "mixed: bob@corp.io from 8.8.8.8 dialed 800.555.1212 ref 1234567890123"),
    (5, "clean text with numbers 42 and 3.14 but no pii at all"),
    (6, ""),
]

EXPECTED_COUNTS = {
    1: {"n_email": 1, "n_ipv4": 0, "n_phone": 1, "n_digit_run": 0},
    2: {"n_email": 0, "n_ipv4": 2, "n_phone": 0, "n_digit_run": 0},
    3: {"n_email": 0, "n_ipv4": 0, "n_phone": 0, "n_digit_run": 2},
    4: {"n_email": 1, "n_ipv4": 1, "n_phone": 1, "n_digit_run": 1},
    5: {"n_email": 0, "n_ipv4": 0, "n_phone": 0, "n_digit_run": 0},
    6: {"n_email": 0, "n_ipv4": 0, "n_phone": 0, "n_digit_run": 0},
}


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(FIXTURE, ["doc_id", "text"])


def test_pii_counts_on_real_pii(fixture_df):
    rows = fixture_df.select("doc_id", *pii_counts("text")).collect()
    got = {r.doc_id: {k: r[k] for k in EXPECTED_COUNTS[1]} for r in rows}
    assert got == EXPECTED_COUNTS


def test_pii_redaction_replaces_every_match(fixture_df):
    rows = fixture_df.select(
        "doc_id", pii_redact("text").alias("clean")
    ).collect()
    clean = {r.doc_id: r.clean for r in rows}
    assert clean[1] == "contact me at <EMAIL> or call <PHONE> now"
    assert clean[2] == "server <IP> talked to <IP> over tls"
    assert clean[3] == "card <ID> expires soon, acct <ID>"
    assert clean[4] == "mixed: <EMAIL> from <IP> dialed <PHONE> ref <ID>"
    assert clean[5] == FIXTURE[4][1]
    # nothing PII-shaped survives any class
    for text in clean.values():
        for pattern, _ in PII_PATTERNS.values():
            assert not re.search(pattern, text), (pattern, text)


def test_regex_dialect_parity_java_vs_re2(fixture_df):
    """Every pattern must match identically under Spark (Java regex) and
    DuckDB (RE2) — the oracle replays the same strings verbatim."""
    spark_rows = {
        r.doc_id: [r[f"n_{name}"] for name in PII_PATTERNS]
        for r in fixture_df.select("doc_id", *pii_counts("text")).collect()
    }
    con = duckdb.connect()
    exprs = ", ".join(
        f"len(regexp_extract_all(text, '{p}')) AS n_{name}"
        for name, (p, _) in PII_PATTERNS.items()
    )
    con.execute("CREATE TABLE fx(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?)", FIXTURE)
    duck_rows = {
        row[0]: list(row[1:])
        for row in con.execute(f"SELECT doc_id, {exprs} FROM fx").fetchall()
    }
    assert spark_rows == duck_rows


def test_repetition_signals_vs_brute_force(spark, tmp_path):
    docs = [
        (0, "a a a a b"),                 # top word 4/5; bigram 'a a' 3/4
        (1, "x y x y x y"),               # alternating — high dup bigrams
        (2, "all words here are unique"),  # no repetition
        (3, "solo"),                       # 1 word: no bigrams at all
    ]
    spark.createDataFrame(docs, ["doc_id", "text"]).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.doc_id: r for r in text_repetition_signals(spark, str(tmp_path)).collect()}
    for doc_id, text in docs:
        words = text.split(" ")
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        wc, bc = Counter(words), Counter(bigrams)
        r = out[doc_id]
        assert r.top_word_frac == pytest.approx(max(wc.values()) / len(words), abs=1e-6)
        if bigrams:
            assert r.top_bigram_frac == pytest.approx(
                max(bc.values()) / len(bigrams), abs=1e-6)
            assert r.dup_bigram_frac == pytest.approx(
                1 - len(bc) / len(bigrams), abs=1e-6)
        else:
            assert r.top_bigram_frac == 0.0 and r.dup_bigram_frac == 0.0
