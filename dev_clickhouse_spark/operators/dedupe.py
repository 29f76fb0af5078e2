"""Deduplication operators.

``replacing_dedupe`` re-expresses ClickHouse ``ReplacingMergeTree(updated_at)``
last-write-wins semantics (reference clickhouse/init/03_gold_tables.sql:12-13,
124-126) — but synchronously at write/read time instead of at background merge
time, so queries never see pre-merge duplicates (stronger than the reference;
SURVEY.md S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def replacing_dedupe(
    df: DataFrame,
    keys: list[str],
    version_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep exactly the row with the greatest ``version_col`` per key
    (``ReplacingMergeTree`` keeps the last merged row; with a version column it
    keeps the max version).  ``tiebreak`` columns make the choice deterministic
    when versions tie — ClickHouse keeps an arbitrary one; we refuse to.

    One shuffle on ``keys``; AQE handles skew.  At 100 TB prefer calling this
    per ingest window (small input) rather than over the full table.
    """
    order = [F.col(version_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedupe(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (``SELECT DISTINCT`` — reference A3,
    dim_date.sql:27-35).  ``cols=None`` dedupes whole rows."""
    return df.dropDuplicates(cols) if cols else df.distinct()
