"""Pointer-doubling recursive-CTE analog (operators/iterative.py).

The registry query walks an arithmetic heap tree (parent = key div 2);
these tests prove the operator on a DATA-DRIVEN tree with arbitrary
parent pointers — the shape a real recursive CTE sees — by comparing
against a brute-force Python walk.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_clickhouse_spark.operators.iterative import (
    ancestor_chain_fold,
    iterate,
)


def _fold(spark, edges):
    """edges: {node: (parent_or_None, weight)} → fold via the operator."""
    rows = [
        (n, p, w, 1)
        for n, (p, w) in sorted(edges.items())
    ]
    df = spark.createDataFrame(
        rows, "node long, ptr long, s long, c long"
    )
    max_depth = max(_depth(edges, n) for n in edges)
    out = ancestor_chain_fold(
        df, node_col="node", ptr_col="ptr", sum_cols=["s", "c"],
        max_depth=max_depth,
    )
    return {r["node"]: (r["s"], r["c"], r["ptr"]) for r in out.collect()}


def _depth(edges, n):
    d = 0
    while edges[n][0] is not None:
        n = edges[n][0]
        d += 1
    return d


def _brute(edges, n):
    s = 0
    c = 0
    cur = n
    while cur is not None:
        s += edges[cur][1]
        c += 1
        cur = edges[cur][0]
    return s, c


def test_chain_fold_matches_brute_force_on_irregular_tree(spark):
    # deterministic irregular forest: two roots, skewed depths, a long
    # chain (depth 9) to force multiple doubling rounds
    edges = {1: (None, 10), 2: (1, 3), 3: (1, 5), 4: (2, 7), 5: (4, 2),
             6: (4, 9), 7: (None, 1), 8: (7, 4), 9: (8, 6), 10: (9, 8),
             11: (10, 1), 12: (11, 2), 13: (12, 3), 14: (13, 4),
             15: (14, 5), 16: (15, 6)}
    got = _fold(spark, edges)
    assert set(got) == set(edges)
    for n in edges:
        s, c = _brute(edges, n)
        assert got[n][0] == s, n
        assert got[n][1] == c, n
        assert got[n][2] is None, f"pointer not exhausted for {n}"


def test_chain_fold_single_root_is_identity(spark):
    got = _fold(spark, {1: (None, 42)})
    assert got == {1: (42, 1, None)}


def test_iterate_checkpoints_and_applies_each_round(spark):
    df = spark.createDataFrame([(0,)], "x long")
    out = iterate(
        df, lambda d, i: d.select((F.col("x") + 1).alias("x")),
        n_iters=5, checkpoint_every=2,
    )
    assert out.collect()[0]["x"] == 5


def test_log_rounds_not_linear(spark):
    # a depth-15 chain folds in ceil(log2(16)) = 4 self-joins; assert the
    # operator's round count by counting localCheckpoint generations via
    # a wrapped step — indirectly: ancestor_chain_fold(max_depth=15) must
    # produce exhausted pointers, and max_depth=1 on the same data must
    # NOT (too few rounds), proving the bound is the active knob.
    edges = {i: (i - 1 if i > 1 else None, 1) for i in range(1, 17)}
    rows = [(n, p, w, 1) for n, (p, w) in sorted(edges.items())]
    df = spark.createDataFrame(rows, "node long, ptr long, s long, c long")
    full = ancestor_chain_fold(df, "node", "ptr", ["s", "c"], max_depth=15)
    assert all(r["ptr"] is None for r in full.collect())
    short = ancestor_chain_fold(df, "node", "ptr", ["s", "c"], max_depth=1)
    assert any(r["ptr"] is not None for r in short.collect())
