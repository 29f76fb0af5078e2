"""Recursive-CTE parity (round 10): ClickHouse ``WITH RECURSIVE``
hierarchy walk re-expressed as a pointer-doubling DataFrame loop.

dev-clickhouse serves stock ClickHouse SQL (reference
clickhouse/init/01_schema.sql is ordinary MergeTree), and ClickHouse
24.4+ runs recursive CTEs, so ancestor-chain analytics over its tables
are fair surface.  The oracle IS a recursive CTE (DuckDB ``WITH
RECURSIVE`` walks each node to the root one join per level); the Spark
side folds the same chains in ``O(log depth)`` self-joins via
``operators/iterative.py::ancestor_chain_fold`` — see that module's
docstring for the 100 TB argument.

Hierarchy: parts with key ≥ 1 form a binary heap tree (parent(k) =
k div 2, root = 1).  Key 0 is excluded in BOTH engines — its parent
pointer would self-loop.  Prices are quantized to integer cents before
any sum so the cross-engine value hash cannot drift with summation
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.iterative import ancestor_chain_fold
from .registry import register


@register(
    "recursive_cte_part_hierarchy",
    oracle="""
WITH RECURSIVE walk AS (
  SELECT p_partkey AS node, p_partkey AS cur,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS s_cents,
         1 AS c
  FROM part WHERE p_partkey >= 1
  UNION ALL
  SELECT w.node, p.p_partkey,
         w.s_cents + CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT),
         w.c + 1
  FROM walk w JOIN part p ON p.p_partkey = w.cur // 2
  WHERE w.cur > 1
)
SELECT CAST(c - 1 AS INT) AS depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(s_cents) AS BIGINT) / 100.0 AS sum_chain
FROM walk WHERE cur = 1
GROUP BY 1 ORDER BY depth
""",
    tags=["clickhouse-parity", "recursive-cte", "iterative"],
)
def recursive_cte_part_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` parity: for every part node, the sum of
    ``p_retailprice`` over its ancestor-or-self chain in the implicit
    binary-heap hierarchy (parent = key div 2), aggregated per depth
    level.  Depth is counted structurally (chain length − 1), never via
    ``log2`` — float ``log2`` at exact powers of two rounds differently
    across engines.

    Spark plan: one row per node ``(node, ptr=parent, s_cents, c=1)``,
    then ``ceil(log2(max_depth+1))`` pointer-doubling self-joins (4 at
    sf0.01, ~5 at sf0.1, ~31 for a 2^31-deep pathological chain), then
    one data-sized group-by on depth.  The DuckDB oracle walks the same
    chains level-by-level (depth joins) — at 100 TB the doubling loop
    does ~5 shuffles where the literal recursion does ~25."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") >= 1)
    max_key = part.agg(F.max("p_partkey")).first()[0] or 1
    max_depth = max(0, int(max_key).bit_length() - 1)
    state = part.select(
        F.col("p_partkey").alias("node"),
        F.when(F.col("p_partkey") > 1, F.expr("p_partkey div 2").cast("long"))
        .alias("ptr"),
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("s_cents"),
        F.lit(1).cast("long").alias("c"),
    )
    folded = ancestor_chain_fold(
        state, node_col="node", ptr_col="ptr",
        sum_cols=["s_cents", "c"], max_depth=max_depth,
    )
    # WITH RECURSIVE emits a terminal row only for walks that actually
    # reach the root: a node whose parent key is absent from the table
    # (possible under partial/sharded key spaces) never terminates in the
    # oracle and must not surface here either — its fold leaves ptr
    # non-null, so the filter is exactly that contract
    folded = folded.filter(F.col("ptr").isNull())
    return (
        folded.groupBy((F.col("c") - 1).cast("int").alias("depth"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            (F.sum("s_cents").cast("long") / F.lit(100.0)).alias("sum_chain"),
        )
        .orderBy("depth")
    )
