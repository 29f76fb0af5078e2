"""Iterative / recursive-CTE analog operators.

ClickHouse (24.4+) executes ``WITH RECURSIVE`` by re-evaluating the
recursive member until the working set is empty (reference serves stock
ClickHouse SQL, so hierarchy walks over its MergeTree tables are fair
surface).  Spark has no recursive CTE, so the analog is an explicit
driver-side loop over DataFrame transformations — which is *better* at
scale when the recursion is a pointer chase, because the loop can use
**pointer doubling**: after i rounds every node has folded the state of
its nearest ``2^i`` ancestors, so a depth-``d`` hierarchy needs only
``ceil(log2(d))+1`` self-joins instead of ``d`` sequential ones.  On a
1000-executor cluster that is the difference between ~30 shuffles and
~5 for a billion-node tree.

Two scale rules are load-bearing here:

- ``localCheckpoint`` after every round: a self-join doubles the lineage
  each iteration, so an unchecked plan grows exponentially and the
  optimizer chokes long before the data does.  (On a real cluster with
  unreliable local disks, ``checkpoint()`` to the reliable store — same
  call shape.)
- the loop bound is computed from ONE tiny aggregate (max key / max
  depth), not a per-iteration ``count()`` action, so the driver issues a
  fixed number of jobs.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iterate(
    df: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    n_iters: int,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Apply ``step`` ``n_iters`` times, cutting lineage every
    ``checkpoint_every`` rounds.  The generic recursive-CTE loop shell:
    any fixpoint whose round count is known up front (or bounded) runs
    through here without per-round driver actions."""
    for i in range(n_iters):
        df = step(df, i)
        if (i + 1) % checkpoint_every == 0 or i == n_iters - 1:
            df = df.localCheckpoint()
    return df


def ancestor_chain_fold(
    state: DataFrame,
    node_col: str,
    ptr_col: str,
    sum_cols: list[str],
    max_depth: int,
) -> DataFrame:
    """Fold additive state up an ancestor chain by pointer doubling.

    ``state`` holds one row per node: ``node_col`` (unique key),
    ``ptr_col`` (parent pointer; NULL marks a root whose fold is
    complete), and ``sum_cols`` — additive accumulators initialized to
    the node's own contribution.  After the fold each node's ``sum_cols``
    hold the sum over its full ancestor-or-self chain and ``ptr_col`` is
    NULL everywhere.

    Invariant per round: a row's accumulators cover the half-open chain
    segment ``[node .. pred(ptr)]``.  Joining a row to its pointer's row
    concatenates two adjacent segments and lands the pointer ``2×``
    further up, so ``ceil(log2(max_depth + 1))`` rounds finish every
    node.  Each round is ONE equi-join of the node set against itself —
    shuffle-partitioned on the key, no skew (pointers are near-unique),
    broadcast never needed.
    """
    n_iters = max(1, math.ceil(math.log2(max_depth + 1))) if max_depth > 0 else 1

    def step(df: DataFrame, _i: int) -> DataFrame:
        a = df.alias("a")
        b = df.select(
            F.col(node_col).alias("__b_node"),
            F.col(ptr_col).alias("__b_ptr"),
            *[F.col(c).alias(f"__b_{c}") for c in sum_cols],
        ).alias("b")
        joined = a.join(
            b, F.col(f"a.{ptr_col}") == F.col("b.__b_node"), "left"
        )
        folded = F.col("b.__b_node").isNotNull()
        return joined.select(
            F.col(f"a.{node_col}").alias(node_col),
            F.when(folded, F.col("b.__b_ptr"))
            .otherwise(F.col(f"a.{ptr_col}"))
            .alias(ptr_col),
            *[
                F.when(folded, F.col(f"a.{c}") + F.col(f"__b_{c}"))
                .otherwise(F.col(f"a.{c}"))
                .alias(c)
                for c in sum_cols
            ],
        )

    return iterate(state, step, n_iters, checkpoint_every=1)
