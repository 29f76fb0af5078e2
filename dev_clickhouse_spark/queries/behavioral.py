"""ClickHouse-parity behavioral / time-series analytics.

Three operators ClickHouse ships as dedicated SQL features, re-expressed
as Catalyst-plannable DataFrame ops:

- ``timeseries_fill_gaps`` — ``ORDER BY ... WITH FILL`` + ``INTERPOLATE``
  (ClickHouse docs §select/order-by): densify an hourly series onto the
  full grid, zero-fill counts, carry metrics forward (LOCF).
- ``funnel_window_counts`` — ``windowFunnel(window)(ts, c1, c2, c3)``:
  depth of the view→click→purchase chain each user completes inside a
  24 h window anchored at any qualifying first step.
- ``retention_cohorts`` — ``retention(c1, c2, ...)``: per signup-day
  cohort, how many users return on day+1 / day+7.

Scale notes: the fill grid is time-range-sized (720 rows/month) and never
scales with event volume, so the single-partition LOCF window over it is
deliberate, not a skew bug.  The funnel's step joins are user-keyed equi
joins with the time window as a residual predicate — one shuffle per
step, no cartesian; retention reduces to per-user flags before the
cohort rollup so the second shuffle carries one row per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from .registry import register


def _r(expr: str, scale: int) -> str:
    m = 10 ** scale
    return f"floor(({expr}) * {m} + 0.5) / {m}"


@register(
    "timeseries_fill_gaps",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n,
         {_r('avg(value)', 4)} AS av
  FROM events GROUP BY 1
), grid AS (
  SELECT unnest(generate_series((SELECT min(h) FROM hourly),
                                (SELECT max(h) FROM hourly),
                                INTERVAL 1 HOUR)) AS h
)
SELECT strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(hourly.n, 0) AS n_events,
       last_value(hourly.av IGNORE NULLS) OVER (
         ORDER BY grid.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS avg_value,
       CAST(CASE WHEN hourly.h IS NULL THEN 1 ELSE 0 END AS INTEGER) AS filled
FROM grid LEFT JOIN hourly ON grid.h = hourly.h
""",
    tags=["ch-with-fill", "timeseries", "W1"],
)
def timeseries_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH FILL / INTERPOLATE: hourly event counts densified onto the
    complete hour grid (empty hours appear as 0) with avg_value carried
    forward.  The grid is built distributedly from a 1-row min/max
    aggregate + sequence/explode — no driver-side collect."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"), rnd(F.avg("value"), 4).alias("av"))
    )
    grid = (
        hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("gh"))
    )
    locf = Window.orderBy("gh").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(hourly, F.col("gh") == F.col("h"), "left")
        .select(
            F.date_format("gh", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("av", ignorenulls=True).over(locf).alias("avg_value"),
            F.when(F.col("h").isNull(), 1).otherwise(0)
            .cast("int").alias("filled"),
        )
    )


@register(
    "funnel_window_counts",
    oracle="""
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
s2 AS (
  SELECT v.user_id, v.v_ts, min(c.c_ts) AS c1
  FROM v JOIN c ON v.user_id = c.user_id
   AND c.c_ts >= v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 24 HOUR
  GROUP BY v.user_id, v.v_ts
),
s3 AS (
  SELECT s2.user_id
  FROM s2 JOIN p ON s2.user_id = p.user_id
   AND p.p_ts >= s2.c1 AND p.p_ts <= s2.v_ts + INTERVAL 24 HOUR
),
lv AS (
  SELECT user_id, 0 AS lvl FROM u
  UNION ALL SELECT DISTINCT user_id, 1 FROM v
  UNION ALL SELECT DISTINCT user_id, 2 FROM s2
  UNION ALL SELECT DISTINCT user_id, 3 FROM s3
)
SELECT CAST(lvl AS INTEGER) AS funnel_level, CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT user_id, max(lvl) AS lvl FROM lv GROUP BY user_id)
GROUP BY lvl
""",
    tags=["ch-window-funnel", "J5"],
)
def funnel_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(24h)(ts, view, click, purchase): chain depth per user,
    anchored at ANY view event (not just the first — matching ClickHouse's
    exhaustive chain search), then a histogram of max depth reached.
    Each step is a user-keyed equi join with the time window as residual."""
    # r14 plan audit (guide §3.3): this query's branches — views/clicks/
    # purchases, the two step joins, and the four union arms — made
    # Catalyst re-derive the events scan 14 TIMES in one plan.  A lazy
    # localCheckpoint of the 3-column projection turns that into ONE scan
    # whose result every branch shares (checkpoint dies with the
    # DataFrame: each invocation still computes from parquet).
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .localCheckpoint(eager=False)
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    deadline = F.col("v_ts") + F.expr("INTERVAL 24 HOURS")
    s2 = (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts")) & (F.col("c_ts") <= deadline),
        )
        .groupBy("user_id", "v_ts")
        .agg(F.min("c_ts").alias("c1"))
    )
    s3 = s2.join(
        buys,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c1")) & (F.col("p_ts") <= deadline),
    ).select("user_id")
    levels = (
        ev.select("user_id").distinct().withColumn("lvl", F.lit(0))
        .unionByName(views.select("user_id").distinct().withColumn("lvl", F.lit(1)))
        .unionByName(s2.select("user_id").distinct().withColumn("lvl", F.lit(2)))
        .unionByName(s3.distinct().withColumn("lvl", F.lit(3)))
    )
    return (
        levels.groupBy("user_id").agg(F.max("lvl").alias("lvl"))
        .groupBy(F.col("lvl").cast("int").alias("funnel_level"))
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "retention_cohorts",
    oracle="""
WITH first_signup AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), flags AS (
  SELECT f.user_id, f.cohort_date,
         max(CASE WHEN a.day = f.cohort_date + 1 THEN 1 ELSE 0 END) AS d1,
         max(CASE WHEN a.day = f.cohort_date + 7 THEN 1 ELSE 0 END) AS d7
  FROM first_signup f JOIN activity a ON f.user_id = a.user_id
  GROUP BY f.user_id, f.cohort_date
)
SELECT cohort_date, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(d1) AS BIGINT) AS d1_retained,
       CAST(sum(d7) AS BIGINT) AS d7_retained
FROM flags GROUP BY cohort_date
""",
    tags=["ch-retention", "A2"],
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention()-style cohort table: users grouped by first-signup day,
    with day+1 / day+7 comeback counts.  Reduces to one flag row per user
    before the cohort rollup, so the final shuffle is user-count sized."""
    ev = load_table(spark, sf_dir, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_date"))
    )
    activity = ev.select(
        F.col("user_id").alias("a_user"), F.to_date("ts").alias("day")
    ).distinct()
    flags = (
        first_signup.join(activity, F.col("user_id") == F.col("a_user"))
        .groupBy("user_id", "cohort_date")
        .agg(
            F.max(F.when(F.col("day") == F.date_add("cohort_date", 1), 1)
                  .otherwise(0)).alias("d1"),
            F.max(F.when(F.col("day") == F.date_add("cohort_date", 7), 1)
                  .otherwise(0)).alias("d7"),
        )
    )
    return flags.groupBy("cohort_date").agg(
        F.count("*").alias("n_users"),
        F.sum("d1").alias("d1_retained"),
        F.sum("d7").alias("d7_retained"),
    )


#: event_type → one-char symbol for the sequence string (deterministic,
#: shared by the Spark query and the DuckDB oracle)
_SEQ_SYMBOLS = {"view": "v", "click": "c", "purchase": "p",
                "signup": "s", "error": "e"}
_SEQ_SYM_SQL = "CASE " + " ".join(
    f"WHEN event_type = '{k}' THEN '{v}'" for k, v in _SEQ_SYMBOLS.items()
) + " ELSE 'x' END"


def _event_seq():
    """Per-user symbol-string aggregate in (ts, event_id) order — the ONE
    definition both sequence queries (and, via _SEQ_SYM_SQL, both oracles)
    share, so the symbol map and tie-break order can never diverge."""
    sym = F.when(F.lit(False), F.lit("x"))
    for k, v in _SEQ_SYMBOLS.items():
        sym = sym.when(F.col("event_type") == k, v)
    sym = sym.otherwise("x")
    return F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", sym.alias("sym")))
            ),
            lambda s: s.sym,
        ),
    )


@register(
    "sequence_match_users",
    oracle=f"""
SELECT user_id,
       CAST(CASE WHEN regexp_matches(
              string_agg({_SEQ_SYM_SQL}, '' ORDER BY ts, event_id),
              'v.*c.*p') THEN 1 ELSE 0 END AS INTEGER) AS matched,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
""",
    tags=["behavioral", "clickhouse-parity"],
)
def sequence_match_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')(ts, view, click,
    purchase)`` parity: per user, did a view→click→purchase occur IN ORDER
    (any gaps allowed)?  The regex ``v.*c.*p`` on the per-user symbol string
    (which the DuckDB oracle still evaluates literally) matches iff there
    exist STRICTLY increasing positions i<j<k holding view/click/purchase —
    exactly what three stacked running-max window flags compute: ``seen_v``
    (a view strictly before this row), ``ok_c`` (a click with seen_v),
    ``matched`` (a purchase with a prior qualifying click).  One
    hash-partition + per-partition sort on (user, ts, event_id); the final
    per-user groupBy reuses the window's partitioning (no second exchange).

    This replaced the collect_list(struct)+array_sort+regex fold after the
    ×30 rehearsal profile (VERDICT r6 item #5): the fold's
    ObjectHashAggregate + per-user string build ran 2.5× slower at ×30
    (2.7 s vs 1.05 s) and was the pack's worst scaling point; the window
    plan is whole-stage-codegen end to end and measured result-identical
    (exceptAll both ways = 0 at ×30).  The r6-reported α=1.51 itself does
    NOT reproduce in isolation (×10→×30 ratio 2.0, α≈0.64): the remainder
    was long-session broadcast/GC pressure across the ~100-execution
    rehearsal pack, now attributed in SCALING.md."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seen_v = F.coalesce(
        F.max((F.col("event_type") == "view").cast("int")).over(w), F.lit(0)
    )
    ok_c = F.when(
        (F.col("event_type") == "click") & (seen_v == 1), 1
    ).otherwise(0)
    seen_vc = F.coalesce(F.max(ok_c).over(w), F.lit(0))
    row_match = F.when(
        (F.col("event_type") == "purchase") & (seen_vc == 1), 1
    ).otherwise(0)
    return (
        ev.withColumn("_m", row_match)
        .groupBy("user_id")
        .agg(
            F.max("_m").cast("int").alias("matched"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "sequence_count_users",
    oracle=f"""
SELECT user_id,
       CAST(length(regexp_extract_all(
              string_agg({_SEQ_SYM_SQL}, '' ORDER BY ts, event_id),
              'v.*?c.*?p')) AS BIGINT) AS n_chains
FROM events GROUP BY user_id
""",
    tags=["behavioral", "clickhouse-parity"],
)
def sequence_count_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount`` parity: how many NON-OVERLAPPING
    view→click→purchase chains per user, counted left-to-right with lazy
    gaps (``.*?`` — both engines' regex scanners find leftmost matches and
    resume after each match end, so the counts agree bit-for-bit).  Same
    symbol-string shape and shuffle budget as ``sequence_match_users``."""
    ev = load_table(spark, sf_dir, "events")
    seq = _event_seq()
    return ev.groupBy("user_id").agg(
        F.size(F.regexp_extract_all(seq, F.lit("v.*?c.*?p"), F.lit(0)))
        .cast("long").alias("n_chains"),
    )


#: (?t<=N) gap bound for the timed sequence match — 24 h, sized to the test
#: corpus's per-user event spacing (median inter-event gap ≈ 7 h) so both
#: matched and unmatched users exist at every sf
_SEQ_TIMED_GAP_US = 86_400 * 1_000_000


@register(
    "sequence_match_timed_users",
    oracle=f"""
WITH m AS (
  SELECT DISTINCT v.user_id
  FROM events v
  JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
       AND (c.ts, c.event_id) > (v.ts, v.event_id)
       AND epoch_us(c.ts) - epoch_us(v.ts) <= {_SEQ_TIMED_GAP_US}
  JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
       AND (p.ts, p.event_id) > (c.ts, c.event_id)
       AND epoch_us(p.ts) - epoch_us(c.ts) <= {_SEQ_TIMED_GAP_US}
  WHERE v.event_type = 'view'
)
SELECT e.user_id,
       CAST(CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS matched,
       CAST(count(*) AS BIGINT) AS n_events
FROM events e LEFT JOIN m ON m.user_id = e.user_id
GROUP BY e.user_id, m.user_id
""",
    tags=["behavioral", "clickhouse-parity"],
)
def sequence_match_timed_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=86400)(?2)(?t<=86400)(?3)')(ts,
    view, click, purchase)`` parity — the TIME-CONSTRAINED pattern family
    (`(?t<=N)` bounds the gap between the two matched events; any events may
    lie between them).  The regex-on-symbol-string trick of
    ``sequence_match_users`` cannot carry timestamps, so this folds the
    per-user (ts, event_id)-sorted event array with ``F.aggregate`` (pure
    JVM, no Python): the accumulator keeps the LATEST view time and the
    latest time-qualified click time, which is exact for existence — a later
    predecessor always satisfies ``gap <= N`` at least as well as an earlier
    one, so greedy-latest finds a chain iff one exists (the brute-force
    triple-join oracle checks all (v, c, p) combinations).  Shape at scale:
    identical to the untimed variant — ONE groupBy(user) shuffle carrying
    (ts, event_id, 1-char) triples, per-user work linear in that user's
    events; the oracle's O(n³) join is the spec, not the plan."""
    ev = load_table(spark, sf_dir, "events")
    sym = F.when(F.lit(False), F.lit("x"))
    for k, v in _SEQ_SYMBOLS.items():
        sym = sym.when(F.col("event_type") == k, v)
    sym = sym.otherwise("x")
    # epoch-µs precomputed pre-collect: ts is TIMESTAMP_NTZ in the test
    # parquet, and the UTC session makes the cast agree with the oracle's
    # epoch_us over the same naive timestamps
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    arr = F.array_sort(
        F.collect_list(
            F.struct("ts", "event_id", us.alias("us"), sym.alias("sym"))
        )
    )
    gap = F.lit(_SEQ_TIMED_GAP_US)
    acc0 = F.struct(
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("long").alias("c"),
        F.lit(False).alias("ok"),
    )

    def step(acc, e):
        t = e.us
        qual_c = (
            (e.sym == F.lit("c")) & acc.v.isNotNull() & ((t - acc.v) <= gap)
        )
        qual_p = (
            (e.sym == F.lit("p")) & acc.c.isNotNull() & ((t - acc.c) <= gap)
        )
        return F.struct(
            F.when(e.sym == F.lit("v"), t).otherwise(acc.v).alias("v"),
            F.when(qual_c, t).otherwise(acc.c).alias("c"),
            (acc.ok | qual_p).alias("ok"),
        )

    matched = F.aggregate(arr, acc0, step).getField("ok")
    return ev.groupBy("user_id").agg(
        F.when(matched, 1).otherwise(0).cast("int").alias("matched"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "funnel_strict_order_levels",
    oracle="""
WITH led AS (
  SELECT user_id, ts, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(ts, 1)        OVER w AS ts1,
         lead(event_type, 2) OVER w AS t2,
         lead(ts, 2)        OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
         max(CASE WHEN event_type = 'view' AND t1 = 'click'
                   AND ts1 <= ts + INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS l2,
         max(CASE WHEN event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
                   AND ts2 <= ts + INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS l3
  FROM led GROUP BY user_id
)
SELECT CAST(CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
            WHEN l1 = 1 THEN 1 ELSE 0 END AS INTEGER) AS funnel_level,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1
""",
    tags=["ch-window-funnel", "clickhouse-parity"],
)
def funnel_strict_order_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(24h, 'strict_order')(ts, view, click, purchase)``
    parity: in strict_order mode ANY event between two chain steps breaks
    the chain, so a level-k chain is k CONSECUTIVE events in the user's
    (ts, event_id)-ordered stream with the whole run inside the window.
    That collapses the step joins of the default mode into LEAD window
    lookups — per user: does any event have (self=view, next=click,
    next²=purchase) within 24 h?  ONE window shuffle on user_id, no joins;
    histogram of max strict level per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deadline = F.expr("INTERVAL 24 HOURS")
    led = ev.select(
        "user_id", "ts", "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("ts", 1).over(w).alias("ts1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    is_v = F.col("event_type") == "view"
    l2 = is_v & (F.col("t1") == "click") & (F.col("ts1") <= F.col("ts") + deadline)
    l3 = (
        is_v & (F.col("t1") == "click") & (F.col("t2") == "purchase")
        & (F.col("ts2") <= F.col("ts") + deadline)
    )
    per_user = led.groupBy("user_id").agg(
        F.max(is_v.cast("int")).alias("l1"),
        F.max(l2.cast("int")).alias("l2"),
        F.max(l3.cast("int")).alias("l3"),
    )
    level = (
        F.when(F.col("l3") == 1, 3)
        .when(F.col("l2") == 1, 2)
        .when(F.col("l1") == 1, 1)
        .otherwise(0)
    )
    return (
        per_user.select(level.cast("int").alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "timeseries_interpolate_gaps",
    oracle=f"""
WITH b AS (
  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS h,
         CAST(count(*) AS BIGINT) AS n,
         {_r('avg(value)', 4)} AS av
  FROM events GROUP BY 1
), grid AS (
  SELECT unnest(generate_series((SELECT min(h) FROM b),
                                (SELECT max(h) FROM b),
                                INTERVAL 5 MINUTE)) AS h
), j AS (
  SELECT grid.h, b.n, b.av,
         last_value(b.av IGNORE NULLS) OVER past AS pv,
         last_value(CASE WHEN b.av IS NOT NULL THEN grid.h END IGNORE NULLS)
           OVER past AS ph,
         first_value(b.av IGNORE NULLS) OVER fut AS nv,
         first_value(CASE WHEN b.av IS NOT NULL THEN grid.h END IGNORE NULLS)
           OVER fut AS nh
  FROM grid LEFT JOIN b ON grid.h = b.h
  WINDOW
    past AS (ORDER BY grid.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    fut  AS (ORDER BY grid.h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket,
       coalesce(n, 0) AS n_events,
       {_r("CASE WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv "
           "WHEN nh = ph THEN pv ELSE pv + (nv - pv) * "
           "((epoch(h) - epoch(ph)) / (epoch(nh) - epoch(ph))) END", 4)}
         AS interp_value,
       CAST(CASE WHEN av IS NULL THEN 1 ELSE 0 END AS INTEGER) AS filled
FROM j
""",
    tags=["ch-with-fill", "timeseries", "interpolate"],
)
def timeseries_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY ... WITH FILL INTERPOLATE`` with LINEAR interpolation —
    the second fill mode next to ``timeseries_fill_gaps``'s LOCF.  A
    5-minute grid (8640 buckets/month: ~31% empty at the sf0.01 gate, so
    the interpolation path is genuinely exercised cross-engine, unlike the
    hourly grid which that sf fills completely); empty buckets get the
    linear blend of the nearest present neighbors, edges clamp to the
    available side.  Same scale shape as the LOCF variant: the grid is
    time-range-sized, never event-volume-sized, so the single-partition
    neighbor windows over it are deliberate; the only data-sized work is
    the initial bucket aggregate (one shuffle, map-side combine)."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / 300).cast("long") * 300
            ).alias("h")
        )
        .agg(F.count("*").alias("n"), rnd(F.avg("value"), 4).alias("av"))
    )
    grid = (
        b.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTE"))).alias("gh"))
    )
    past = Window.orderBy("gh").rowsBetween(Window.unboundedPreceding, 0)
    fut = Window.orderBy("gh").rowsBetween(0, Window.unboundedFollowing)
    marked_h = F.when(F.col("av").isNotNull(), F.col("gh"))
    j = (
        grid.join(b, F.col("gh") == F.col("h"), "left")
        .select(
            "gh", "n", "av",
            F.last("av", ignorenulls=True).over(past).alias("pv"),
            F.last(marked_h, ignorenulls=True).over(past).alias("ph"),
            F.first("av", ignorenulls=True).over(fut).alias("nv"),
            F.first(marked_h, ignorenulls=True).over(fut).alias("nh"),
        )
    )
    frac = (
        (F.unix_timestamp("gh") - F.unix_timestamp("ph"))
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph"))
    )
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nh") == F.col("ph"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return j.select(
        F.date_format("gh", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        rnd(interp, 4).alias("interp_value"),
        F.when(F.col("av").isNull(), 1).otherwise(0).cast("int").alias("filled"),
    )


@register(
    "funnel_strict_increase_counts",
    oracle="""
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
s2 AS (
  SELECT v.user_id, v.v_ts, min(c.c_ts) AS c1
  FROM v JOIN c ON v.user_id = c.user_id
   AND c.c_ts > v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 24 HOUR
  GROUP BY v.user_id, v.v_ts
),
s3 AS (
  SELECT s2.user_id
  FROM s2 JOIN p ON s2.user_id = p.user_id
   AND p.p_ts > s2.c1 AND p.p_ts <= s2.v_ts + INTERVAL 24 HOUR
),
lv AS (
  SELECT user_id, 0 AS lvl FROM u
  UNION ALL SELECT DISTINCT user_id, 1 FROM v
  UNION ALL SELECT DISTINCT user_id, 2 FROM s2
  UNION ALL SELECT DISTINCT user_id, 3 FROM s3
)
SELECT CAST(lvl AS INTEGER) AS funnel_level,
       CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT user_id, max(lvl) AS lvl FROM lv GROUP BY user_id)
GROUP BY lvl
""",
    tags=["ch-window-funnel", "clickhouse-parity"],
)
def funnel_strict_increase_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(24h, 'strict_increase')(ts, view, click, purchase)``:
    each chain step must carry a STRICTLY greater timestamp than its
    predecessor — simultaneous events (batch imports, second-granularity
    clocks) cannot advance the chain, the CH tie-safety mode.  Identical
    plan shape to the default funnel (user-keyed step joins, window as
    residual); only the boundary comparisons tighten, so the two modes'
    driver rows differ exactly on tie rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    deadline = F.col("v_ts") + F.expr("INTERVAL 24 HOURS")
    s2 = (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("v_ts")) & (F.col("c_ts") <= deadline),
        )
        .groupBy("user_id", "v_ts")
        .agg(F.min("c_ts").alias("c1"))
    )
    s3 = s2.join(
        buys,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c1")) & (F.col("p_ts") <= deadline),
    ).select("user_id")
    levels = (
        ev.select("user_id").distinct().withColumn("lvl", F.lit(0))
        .unionByName(
            views.select("user_id").distinct().withColumn("lvl", F.lit(1)))
        .unionByName(
            s2.select("user_id").distinct().withColumn("lvl", F.lit(2)))
        .unionByName(s3.distinct().withColumn("lvl", F.lit(3)))
    )
    return (
        levels.groupBy("user_id").agg(F.max("lvl").alias("lvl"))
        .groupBy(F.col("lvl").cast("int").alias("funnel_level"))
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@register(
    "funnel_strict_dedup_counts",
    oracle="""
WITH vc AS (
  SELECT user_id, ts, event_id, event_type,
         lead(event_type) OVER w AS n1_type,
         lead(ts)        OVER w AS n1_ts,
         lead(event_id)  OVER w AS n1_id
  FROM events WHERE event_type IN ('view', 'click')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cp AS (
  SELECT user_id, event_id, 
         lead(event_type) OVER w AS n2_type,
         lead(ts)        OVER w AS n2_ts
  FROM events WHERE event_type IN ('click', 'purchase')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
l2 AS (
  SELECT user_id, ts AS v_ts, n1_id AS c_id
  FROM vc
  WHERE event_type = 'view' AND n1_type = 'click'
    AND n1_ts <= ts + INTERVAL 24 HOUR
),
l3 AS (
  SELECT l2.user_id
  FROM l2 JOIN cp ON cp.user_id = l2.user_id AND cp.event_id = l2.c_id
  WHERE cp.n2_type = 'purchase' AND cp.n2_ts <= l2.v_ts + INTERVAL 24 HOUR
),
lv AS (
  SELECT user_id, 0 AS lvl FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL SELECT DISTINCT user_id, 1 FROM events WHERE event_type = 'view'
  UNION ALL SELECT DISTINCT user_id, 2 FROM l2
  UNION ALL SELECT DISTINCT user_id, 3 FROM l3
)
SELECT CAST(lvl AS INTEGER) AS funnel_level,
       CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT user_id, max(lvl) AS lvl FROM lv GROUP BY user_id)
GROUP BY lvl
""",
    tags=["ch-window-funnel", "clickhouse-parity"],
)
def funnel_strict_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``windowFunnel(24h, 'strict_dedup')(ts, view, click, purchase)``:
    a REPEATED match of an already-satisfied step breaks the chain — a
    second view before the click kills that anchor, a second click
    before the purchase kills the level-3 extension.  (Interpretation
    note: only a duplicate of the step being ADVANCED FROM interrupts —
    a view recurring after level 2 is already reached does not; the
    oracle pins this exact contract.)  That makes "the
    next step-relevant event" decisive, so the whole mode reduces to
    LEAD over two FILTERED subsequences ({view,click} for step 2,
    {click,purchase} for step 3) — two window shuffles + one user-keyed
    join, no per-anchor scan, no quadratic term; chain order is the
    deterministic (ts, event_id) lexicographic order in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vc = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_id", "event_type",
        F.lead("event_type").over(w).alias("n1_type"),
        F.lead("ts").over(w).alias("n1_ts"),
        F.lead("event_id").over(w).alias("n1_id"),
    )
    cp = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id", F.col("event_id").alias("c_event_id"),
        F.lead("event_type").over(w).alias("n2_type"),
        F.lead("ts").over(w).alias("n2_ts"),
    )
    day = F.expr("INTERVAL 24 HOURS")
    l2 = vc.filter(
        (F.col("event_type") == "view")
        & (F.col("n1_type") == "click")
        & (F.col("n1_ts") <= F.col("ts") + day)
    ).select("user_id", F.col("ts").alias("v_ts"), F.col("n1_id").alias("c_id"))
    l3 = l2.join(
        cp,
        (l2["user_id"] == cp["user_id"]) & (cp["c_event_id"] == l2["c_id"]),
    ).filter(
        (F.col("n2_type") == "purchase")
        & (F.col("n2_ts") <= F.col("v_ts") + day)
    ).select(l2["user_id"])
    levels = (
        ev.select("user_id").distinct().withColumn("lvl", F.lit(0))
        .unionByName(
            ev.filter(F.col("event_type") == "view")
            .select("user_id").distinct().withColumn("lvl", F.lit(1)))
        .unionByName(
            l2.select("user_id").distinct().withColumn("lvl", F.lit(2)))
        .unionByName(l3.distinct().withColumn("lvl", F.lit(3)))
    )
    return (
        levels.groupBy("user_id").agg(F.max("lvl").alias("lvl"))
        .groupBy(F.col("lvl").cast("int").alias("funnel_level"))
        .agg(F.count("*").cast("long").alias("n_users"))
    )
