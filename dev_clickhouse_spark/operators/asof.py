"""As-of (temporal most-recent-match) join.

Re-expresses the reference's ``ASOF LEFT JOIN`` used to pick the SCD2 dimension
version in effect at event time (reference
airflow/dags/sql/fact_wazuh_events.sql:60-68):

    ASOF LEFT JOIN gold.dim_agent a
      ON a.agent_name = <nk> AND src.event_ts_local >= a.effective_from

Spark has no native as-of join, so this implements the scalable
union-and-carry-forward rewrite (SURVEY.md J2):

1. union the left (probe) and right (version) rows on the key columns with a
   side marker, packing right-side payload into one struct;
2. a single window sort per key on ``(ts, side)`` — right rows sort before
   left rows at equal ts, making the match inclusive (``>=``) like ClickHouse;
3. ``last(payload, ignoreNulls)`` carries the latest version forward onto each
   probe row.

Scale notes: one shuffle on the key columns and one sort — O(n log n) with no
row blowup, unlike the join+filter+row_number rewrite whose intermediate is
|probe| × |versions-per-key|.  Skewed keys can be salted upstream; AQE skew
handling applies to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` within equal ``on`` keys.

    Parameters mirror pandas ``merge_asof`` (direction='backward').  Right
    payload columns (``right_cols``, default all non-key/non-ts columns) come
    back NULL when no version precedes the probe — ClickHouse ``ASOF LEFT
    JOIN`` semantics.  ``tolerance_seconds`` optionally voids matches older
    than the window (not used by the reference; offered for training-data
    as-of feature lookups).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = F.struct(*[F.col(c) for c in right_cols])

    left_cols = left.columns
    probe = left.select(
        *left_cols,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__asof_payload"),
    )
    versions = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols
          if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        payload.alias("__asof_payload"),
    ).select(*left_cols, "__asof_ts", "__asof_side", "__asof_payload")

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", "__asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = probe.unionByName(versions).withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        ts_w = Window.partitionBy(*keys).orderBy("__asof_ts", "__asof_side").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        carried = carried.withColumn(
            "__asof_match_ts",
            F.when(F.col("__asof_side") == 0, F.col("__asof_ts")),
        ).withColumn(
            "__asof_match_ts", F.last("__asof_match_ts", ignorenulls=True).over(ts_w)
        ).withColumn(
            "__asof_match",
            F.when(
                F.col("__asof_match_ts")
                >= F.col("__asof_ts") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS"),
                F.col("__asof_match"),
            ),
        )

    # one select, not a withColumn-per-payload chain: every DataFrame op is
    # eagerly analyzed, so N withColumns cost N analysis passes of the whole
    # plan (r13 — driver-side build time in the gold refresh).  Same
    # add-or-replace semantics: payload columns replace same-name left
    # columns in place, new ones append in right_cols order.
    drop = {"__asof_ts", "__asof_side", "__asof_payload", "__asof_match",
            "__asof_match_ts"}
    out = carried.filter(F.col("__asof_side") == 1)
    match = lambda c: F.col("__asof_match").getField(c).alias(c)  # noqa: E731
    existing = [c for c in out.columns if c not in drop]
    sel = [match(c) if c in right_cols else F.col(c) for c in existing]
    sel += [match(c) for c in right_cols if c not in existing]
    return out.select(*sel)


def asof_join_multi(
    left: DataFrame,
    specs: list[tuple[str, DataFrame, str, str, str, str]],
    left_ts: str,
    id_cols: list[str],
    salt_buckets: int | None = None,
) -> DataFrame:
    """N as-of lookups against N version dims in ONE window shuffle.

    ``specs`` is a list of ``(tag, versions_df, left_key_col, right_key_col,
    right_ts_col, payload_col)``; every payload column must share one Spark
    type (surrogate hash keys are all bigint here).  ``id_cols`` must identify
    a left row (the reference's fact identity ``(event_id, event_ts)`` —
    fact_wazuh_events.sql:76-79 dedupes on exactly that pair).

    Why not N ``asof_join`` calls: each one shuffles the FULL accumulating
    fact width through its own window exchange — N wide shuffles.  Here the
    probe side is only ``id_cols + (tag, key, ts)``: ONE exploded select
    emits a (tag, key) probe row per spec (r14 — one probe scan + one
    analysis pass instead of a select+union per spec), all dims union into
    one version stream keyed by ``(tag, key)``, one narrow window exchange
    serves every lookup, a narrow group-by folds the N matches back to one
    row per fact id, and the wide fact is shuffled exactly once for the
    final join (whose build side is already partitioned on ``id_cols`` by
    the fold).
    At 100 TB this turns fact_wazuh's dominant cost — 3 wide window shuffles
    — into 1 narrow window + 1 narrow fold + 1 wide join.

    HOT-KEY SALTING (r13, guide §2.5; VERDICT r12 #3 — the skew probe held a
    1.5× hot/uniform ratio across rounds): probe rows carry a deterministic
    salt ``xxhash64(id_cols) % S`` and VERSION rows are replicated to every
    salt, so the window partitions on ``(tag, key, salt)`` — a key holding
    90% of the probe stream spreads over S tasks while each salt's window
    still sees every version of the key, so the carried match is identical.
    Versions are the small side by construction (SCD2 dims vs the fact
    stream), so the S× replication adds only version-side shuffle bytes —
    the as-of analog of "salt the big side, explode the small side".
    ``salt_buckets`` defaults to the cluster's default parallelism.
    """
    payload_type = dict(specs[0][1].dtypes)[specs[0][5]]
    left_dtypes = dict(left.dtypes)
    id_types = tuple((c, left_dtypes[c]) for c in id_cols)
    if salt_buckets is None:
        salt_buckets = left.sparkSession.sparkContext.defaultParallelism
    salt_buckets = max(1, int(salt_buckets))

    # Every expression list below is STATIC given this signature — building
    # them is driver-side py4j traffic paid per pipeline per refresh window
    # (r14 profile: ~0.45 s warm for fact_wazuh's 3-dim call), so they are
    # cached per process (functions.colcache; r13 §7 extractor pattern).
    sig = (
        tuple(id_cols), id_types, left_ts,
        tuple((s[0], s[2], s[3], s[4], s[5]) for s in specs),
        payload_type, salt_buckets,
    )

    def _build_exprs():
        # ONE exploded probe select instead of a select+union per spec: the
        # probe side (the accumulating fact — the big side) is scanned once,
        # and the driver pays one analysis pass instead of len(specs) (r14).
        # explode(array(struct(tag, key)…)) emits exactly the same
        # (tag, key) probe row multiset the per-spec unions produced.
        probe_cols = [
            *[F.col(c) for c in id_cols],
            F.explode(F.array(*[
                F.struct(
                    F.lit(tag).alias("t"),
                    F.col(lkey).cast("string").alias("k"),
                )
                for tag, _, lkey, *_ in specs
            ])).alias("__tk"),
            F.col(left_ts).alias("__ts"),
            F.lit(1).alias("__side"),
            F.lit(None).cast(payload_type).alias("__payload"),
            F.pmod(
                F.xxhash64(*[F.col(c) for c in id_cols]),
                F.lit(salt_buckets),
            ).cast("int").alias("__salt"),
        ]
        probe_flat = [
            *[F.col(c) for c in id_cols],
            F.col("__tk.t").alias("__tag"),
            F.col("__tk.k").alias("__key"),
            F.col("__ts"), F.col("__side"), F.col("__payload"), F.col("__salt"),
        ]
        version_cols = [
            [
                *[F.lit(None).cast(t).alias(c) for c, t in id_types],
                F.lit(tag).alias("__tag"),
                F.col(rkey).cast("string").alias("__key"),
                F.col(rts).alias("__ts"),
                F.lit(0).alias("__side"),
                F.col(pcol).cast(payload_type).alias("__payload"),
                F.explode(
                    F.sequence(F.lit(0), F.lit(salt_buckets - 1))
                ).alias("__salt"),
            ]
            for tag, _, lkey, rkey, rts, pcol in specs
        ]
        agg_cols = [
            F.count(F.lit(1)).alias("__probe_rows"),
            *[
                F.max(F.when(F.col("__tag") == tag, F.col("__match"))).alias(
                    f"__m_{tag}"
                )
                for tag, *_ in specs
            ],
        ]
        assert_col = F.assert_true(
            F.col("__probe_rows") == F.lit(len(specs)),
            F.concat(
                F.lit(
                    "asof_join_multi: id_cols do not uniquely identify "
                    "left rows (id="
                ),
                F.concat_ws(", ", *[F.col(c).cast("string") for c in id_cols]),
                F.lit(
                    f") — expected {len(specs)} probe rows per id; "
                    "dropDuplicates(id_cols) the probe side first"
                ),
            ),
        ).isNull()
        return probe_cols, probe_flat, version_cols, agg_cols, assert_col

    from ..functions.colcache import cached_cols

    probe_cols, probe_flat, version_cols, agg_cols, assert_col = cached_cols(
        ("asof_join_multi", sig), _build_exprs
    )

    stream = left.select(*probe_cols).select(*probe_flat)
    for (tag, right, *_), vcols in zip(specs, version_cols):
        stream = stream.unionByName(right.select(*vcols))

    w = (
        Window.partitionBy("__tag", "__key", "__salt")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        stream.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .groupBy(*id_cols)
        .agg(*agg_cols)
        # Enforce the id_cols-uniqueness precondition instead of trusting the
        # docstring: every unique left row contributes exactly len(specs)
        # probe rows to this fold, so a higher count means duplicate
        # (id_cols) rows whose matches the max() would silently mix (e.g.
        # duplicate (event_id, event_ts) across micro-batches with different
        # natural keys).  Checked inside the existing aggregate — no extra
        # shuffle; raises at action time.
        .filter(assert_col)
        .drop("__probe_rows")
    )
    # single select (not N withColumn+drop pairs — each is a full eager
    # analysis pass): payload columns replace same-name left columns in
    # place, new ones append in spec order
    out = left.join(matched, on=id_cols, how="left")
    by_payload = {pcol: tag for tag, _, _, _, _, pcol in specs}
    tagcols = {f"__m_{tag}" for tag, *_ in specs}
    existing = [c for c in out.columns if c not in tagcols]

    def _build_final():
        sel = [
            F.col(f"__m_{by_payload[c]}").alias(c) if c in by_payload
            else F.col(c)
            for c in existing
        ]
        sel += [
            F.col(f"__m_{tag}").alias(pcol)
            for tag, _, _, _, _, pcol in specs
            if pcol not in existing
        ]
        return sel

    final_sel = cached_cols(
        ("asof_join_multi_final", tuple(existing), sig), _build_final
    )
    return out.select(*final_sel)
