"""Range (interval) join: probe rows against validity/time intervals.

The reference's only interval pattern is the ASOF lookup (SURVEY.md J2); a
general range join is the natural extension a security/training pipeline
needs (events ↔ maintenance windows, spans, rate-limit buckets).

Two strategies:

- ``range_join`` — keyed: equi-join on the keys, interval predicate as a join
  condition.  Catalyst executes the equi part as a hash/sort-merge join and
  filters the interval — fine whenever keys bound the fan-out.
- ``binned_range_join`` — unkeyed or hot-keyed: co-partition both sides by
  time bin (interval rows replicated into every bin they overlap), join on
  the bin + filter.  Turns the O(|L|·|R|) cross product into
  O(Σ_bin |L_b|·|R_b|) — the standard scalable interval-join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: list[str] | str | None = None,
    how: str = "inner",
    end_inclusive: bool = False,
) -> DataFrame:
    """left.ts ∈ [right.start, right.end) (half-open by default, matching the
    engine's window convention; ``end_inclusive=True`` for BETWEEN)."""
    keys = [on] if isinstance(on, str) else list(on or [])
    lo = F.col(left_ts) >= F.col(right_start)
    hi = (
        F.col(left_ts) <= F.col(right_end)
        if end_inclusive
        else F.col(left_ts) < F.col(right_end)
    )
    # NULL end = open interval (SCD2 current version)
    cond = lo & (F.col(right_end).isNull() | hi)
    for k in keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Unkeyed interval join via time-bin co-partitioning.  Pick
    ``bin_seconds`` ≈ the typical interval length: intervals replicate into
    ⌈len/bin⌉+1 bins, probes into exactly one.

    NULL ``right_end`` keeps the open-interval semantics of
    :func:`range_join`: open intervals are replicated up to the newest probe
    bin (one tiny aggregate on the probe side establishes that bound)."""
    lbin = (F.unix_timestamp(F.col(left_ts)) / bin_seconds).cast("long")
    l = left.withColumn(_BIN, lbin)
    max_probe_bin = left.agg(
        F.max((F.unix_timestamp(F.col(left_ts)) / bin_seconds).cast("long"))
    ).first()[0]
    if max_probe_bin is None:
        max_probe_bin = 0  # empty probe side → join result is empty anyway
    sbin = (F.unix_timestamp(F.col(right_start)) / bin_seconds).cast("long")
    ebin = F.least(
        F.coalesce(
            (F.unix_timestamp(F.col(right_end)) / bin_seconds).cast("long"),
            F.lit(max_probe_bin),
        ),
        F.lit(max_probe_bin),
    )
    # intervals starting after the newest probe replicate once and match
    # nothing; everything else replicates only across probe-visible bins
    r = right.withColumn(_BIN, F.explode(F.sequence(sbin, F.greatest(sbin, ebin))))
    cond = (
        (l[_BIN] == r[_BIN])
        & (F.col(left_ts) >= F.col(right_start))
        & (F.col(right_end).isNull() | (F.col(left_ts) < F.col(right_end)))
    )
    return l.join(r, cond, how).drop(_BIN)
