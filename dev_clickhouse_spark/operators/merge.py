"""MERGE upsert (SURVEY.md J8) — the legacy-Postgres pipeline idiom.

The reference's PG implementation maintains gold tables with

    MERGE INTO target USING (source) ON (keys)
    WHEN MATCHED THEN UPDATE SET …
    WHEN NOT MATCHED THEN INSERT …

(postgres/init/06_dynamic_dag_metadata.sql:154-162, :1447-1537).  Parquet has
no in-place UPDATE, so the engine's equivalent is a deterministic
read-modify-write: full outer join on the keys, matched rows take the source
payload, target-only rows pass through, source-only rows insert.  One shuffle
on the keys; at scale, partition-restrict the target read to the partitions
the source touches before calling this (the runner's windowed reads do
exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Return the post-MERGE state of ``target``.

    ``update_cols`` limits WHEN MATCHED updates to those columns (the
    reference's MERGE updates measure/attribute columns and preserves keys);
    default = every non-key column present in both sides.  Null source values
    overwrite on match, exactly like SQL MERGE — presence is tracked with a
    marker column, not value-nullness.

    SQL MERGE errors when a target row matches MULTIPLE source rows; a plain
    full-outer join would instead silently fan the target row out.  The same
    contract is enforced here: a per-key source count rides the presence
    marker and raises at execution time when any key has >1 source row —
    pre-aggregate the source (one row per key) before calling.
    """
    from pyspark.sql import Window

    if update_cols is None:
        update_cols = [
            c for c in source.columns if c in set(target.columns) and c not in keys
        ]
    passthrough = [c for c in target.columns if c not in keys and c not in update_cols]

    t = target.alias("t")
    # assert_true rides the (always-referenced) presence marker so it cannot
    # be pruned; the window shares the join's key partitioning
    src_cnt = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    uniq = F.assert_true(
        src_cnt <= 1,
        F.concat(
            F.lit("merge_upsert: source has multiple rows for key ("),
            F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
            F.lit(") — MERGE requires at most one match; pre-aggregate the source"),
        ),
    )
    # coalesce(assert::int, 1): assert_true yields NULL when the predicate
    # holds (so the marker is 1) and raises otherwise; a when(c,1).otherwise(1)
    # would be constant-folded away together with the assertion
    s = source.withColumn(
        "__s_present", F.coalesce(uniq.cast("int"), F.lit(1))
    ).alias("s")
    joined = t.join(s, on=keys, how="full_outer")
    present = F.col("s.__s_present").isNotNull()

    cols = [F.col(k).alias(k) for k in keys]
    for c in update_cols:
        cols.append(
            F.when(present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        )
    for c in passthrough:
        cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*cols)
