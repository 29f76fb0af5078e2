"""Driver-gated evidence row for the data-skipping index (round 8).

ClickHouse MergeTree tables carry data-skipping indexes as stock DDL —
``INDEX i x TYPE minmax`` / ``TYPE tokenbf_v1`` (every reference table is
ordinary MergeTree, reference clickhouse/init/01_schema.sql, so this is
engine-identity surface, not an extension).  plans/skip_index.py is the
Spark-idiomatic translation: per-file min/max + token-bloom statistics in
warehouse-manifest sidecars, pruned driver-side BEFORE any file is
opened — the Iceberg/Delta file-stats design, which is what file skipping
has to look like at 100 TB where the expensive step is listing/opening
files, not decoding them.

This query builds a scratch manifest warehouse from ``events`` with four
user_id-range batches (so members are genuinely disjoint on the indexed
column), indexes user_id (minmax) + event_type (token bloom), and answers
a conjunctive predicate through the PRUNED read path.  The DuckDB oracle
runs the same predicate declaratively over the original parquet — a
pruning bug that drops a matching file, a stale-sidecar bug after the
append, or a residual-filter bug all flip the row/hash gate.  The
files-actually-skipped evidence lives in tests/test_skip_index.py (six
cases, including mutation invalidation and guaranteed-absent blooms).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..plans.skip_index import SkipIndex
from ..plans.warehouse import Warehouse
from .registry import register


@register(
    "skip_index_pruned_scan",
    oracle="""
WITH b AS (SELECT (max(user_id) // 4) + 1 AS step FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       floor(sum("value") * 100 + 0.5) / 100 AS sum_value
FROM events, b
WHERE user_id BETWEEN b.step + 1 AND b.step + b.step // 2
  AND event_type = 'purchase'
GROUP BY event_type
""",
    tags=["clickhouse-parity", "skip-index"],
)
def skip_index_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minmax + tokenbf skip-index end-to-end: four disjoint user_id-range
    members, ``SkipIndex.ensure()`` builds per-file sidecar stats, and the
    read prunes to the one member that can hold the range (plus the bloom
    dropping files without the 'purchase' token) before applying the
    residual filter.  Equality with the oracle proves pruning never drops
    a matching row; the test suite proves files are actually skipped."""
    ev = load_table(spark, sf_dir, "events")
    scratch = os.path.join(
        tempfile.gettempdir(),
        "dcs_skip_scan_" + hashlib.md5(sf_dir.encode()).hexdigest()[:10],
    )
    shutil.rmtree(scratch, ignore_errors=True)
    wh = Warehouse(spark, scratch)
    t = "skipscan_events"
    hi = ev.agg(F.max("user_id")).first()[0]
    step = (hi // 4) + 1
    for b in range(4):
        wh.append(
            t,
            ev.filter(
                (F.col("user_id") >= b * step)
                & (F.col("user_id") < (b + 1) * step)
            ),
            batch_id=b,
        )
    idx = SkipIndex(
        wh, t, minmax_cols=("user_id",), token_col="event_type"
    )
    idx.ensure()
    pruned = idx.read(
        [
            ("between", "user_id", step + 1, step + step // 2),
            ("token", "purchase"),
        ]
    )
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        rnd(F.sum("value"), 2).alias("sum_value"),
    )
