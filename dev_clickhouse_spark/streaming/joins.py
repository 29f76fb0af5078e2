"""Stream-stream and stream-static joins (beyond-reference ST surface).

The reference's streaming layer is a fan-out (one Kafka stream → typed
tables, SURVEY.md S2); real SIEM enrichment also needs JOINs on the moving
data: correlate an alert stream against the raw event stream within a
time window (stream-stream), and stamp every streaming event with its
slowly-changing dimension row (stream-static).  Both are first-class in
Structured Streaming; this module pins the engine's semantics:

- **stream-stream interval join** — both sides watermarked, the join
  condition carries an EVENT-TIME RANGE, so Spark can bound the buffered
  state to the watermark horizon and garbage-collect it (unbounded-state
  joins without the range are refused by Spark itself — by design, one
  horizon of each stream is the maximum state a 100 TB/day deployment
  ever buffers per executor after key partitioning).
- **stream-static join** — the static side is re-planned per micro-batch
  (so a compaction/refresh of the dim parquet is picked up on the next
  batch) and broadcast when small, exactly like the batch star joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on ``key`` where ``right_ts`` falls in
    ``[left_ts - lookback, left_ts]`` — the alert-to-causal-events shape.

    Both sides get event-time watermarks; the range condition is what
    lets Spark expire buffered rows: a right row is dropped from state
    once the left watermark passes ``right_ts + lookback``, a left row
    once the right watermark passes ``left_ts``.  State per executor is
    therefore O(rows inside one watermark horizon of its key range),
    independent of stream lifetime.

    ``join_type`` supports ``inner`` and ``leftOuter`` (outer emission
    waits for the watermark, per Structured Streaming semantics)."""
    if join_type not in ("inner", "leftOuter"):
        raise ValueError(
            f"unsupported stream-stream join type {join_type!r} "
            "(inner / leftOuter)"
        )
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    # disambiguate overlapping column names: the right side is prefixed
    overlap = (set(lw.columns) & set(rw.columns)) - {key}
    for c in overlap:
        rw = rw.withColumnRenamed(c, f"r_{c}")
    r_ts = f"r_{right_ts}" if right_ts in overlap else right_ts
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{r_ts}") >= F.expr(
            f"l.{left_ts} - INTERVAL {lookback}"
        ))
        & (F.col(f"r.{r_ts}") <= F.col(f"l.{left_ts}"))
    )
    joined = lw.alias("l").join(rw.alias("r"), cond, join_type)
    # drop the duplicated right-side key (null on unmatched leftOuter rows)
    return joined.drop(F.col(f"r.{key}"))


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: stamp each streaming row with its
    dimension attributes.  The static side is re-evaluated per
    micro-batch — a dim refresh (SCD2 close/open, compaction) is visible
    on the NEXT batch without restarting the query — and broadcast by
    default (dims are small; the stream side never shuffles)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    overlap = (set(stream.columns) & set(dim.columns)) - {key}
    for c in overlap:
        d = d.withColumnRenamed(c, f"dim_{c}")
    return stream.join(d, key, how)
