"""Property tests (Hypothesis) for the hard composite operators.

SURVEY.md §7.2 calls for property-testing the two genuinely hard semantics:
the as-of join (vs a brute-force per-row reference) and the SCD2 version
builder (no overlaps, exactly one current per key, coverage).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from dev_clickhouse_spark.operators.asof import asof_join
from dev_clickhouse_spark.operators.range_join import binned_range_join, range_join
from dev_clickhouse_spark.operators.scd import scd2_from_history

BASE = dt.datetime(2026, 1, 1)

# small domains force collisions (shared keys, equal timestamps)
keys = st.integers(min_value=0, max_value=3)
offsets = st.integers(min_value=0, max_value=50)

events_strategy = st.lists(
    st.tuples(keys, offsets), min_size=1, max_size=25
)
versions_strategy = st.lists(
    st.tuples(keys, offsets, st.integers(min_value=0, max_value=9)),
    min_size=0, max_size=15,
)


def _ts(off: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=off)


@settings(max_examples=12, deadline=None)
@given(events=events_strategy, versions=versions_strategy)
def test_asof_join_matches_bruteforce(spark, events, versions):
    left = spark.createDataFrame(
        [(i, k, _ts(o)) for i, (k, o) in enumerate(events)],
        "row_id int, k int, ts timestamp",
    )
    # dedupe (k, ts) on the right: with ties the winner is arbitrary in both
    # the operator and the brute force — remove the ambiguity, keep max v
    vmap: dict[tuple[int, int], int] = {}
    for k, o, v in versions:
        vmap[(k, o)] = max(vmap.get((k, o), -1), v)
    right = spark.createDataFrame(
        [(k, _ts(o), v) for (k, o), v in vmap.items()],
        "k int, vts timestamp, v int",
    )
    got = {
        r.row_id: r.v
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="vts").collect()
    }
    for i, (k, o) in enumerate(events):
        eligible = [(vo, v) for (vk, vo), v in vmap.items() if vk == k and vo <= o]
        want = max(eligible)[1] if eligible else None
        assert got[i] == want, (i, k, o, eligible, got[i])


@settings(max_examples=12, deadline=None)
@given(events=st.lists(st.tuples(keys, offsets, st.integers(0, 2)),
                       min_size=1, max_size=30))
def test_scd2_invariants(spark, events):
    # dedupe (k, ts): change detection at identical timestamps is
    # order-dependent by nature — keep the max attr deterministically
    emap: dict[tuple[int, int], int] = {}
    for k, o, a in events:
        emap[(k, o)] = max(emap.get((k, o), -1), a)
    df = spark.createDataFrame(
        [(k, _ts(o), str(a)) for (k, o), a in emap.items()],
        "k int, ts timestamp, attr string",
    )
    dim = scd2_from_history(df, "k", ["attr"], "ts").collect()
    by_key: dict[int, list] = {}
    for r in dim:
        by_key.setdefault(r.k, []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.effective_from)
        # exactly one current, and it is the last version
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current == 1 and rows[-1].effective_to is None
        # contiguous, non-overlapping intervals
        for a, b in zip(rows, rows[1:]):
            assert a.effective_to == b.effective_from
        # consecutive versions always differ in the attribute
        for a, b in zip(rows, rows[1:]):
            assert a.attr != b.attr
        # first version starts at the key's first event
        first_event = min(o for (ek, o) in emap if ek == k)
        assert rows[0].effective_from == _ts(first_event)


@settings(max_examples=8, deadline=None)
@given(
    probes=st.lists(st.tuples(keys, offsets), min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(keys, offsets, st.integers(1, 20)), min_size=0, max_size=10
    ),
)
def test_binned_range_join_matches_plain(spark, probes, intervals):
    left = spark.createDataFrame(
        [(i, _ts(o)) for i, (k, o) in enumerate(probes)],
        "row_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(j, _ts(o), _ts(o + ln)) for j, (k, o, ln) in enumerate(intervals)],
        "iv_id int, start timestamp, end timestamp",
    )
    plain = range_join(left, right, "ts", "start", "end").select("row_id", "iv_id")
    binned = binned_range_join(left, right, "ts", "start", "end",
                               bin_seconds=300).select("row_id", "iv_id")
    assert {(r.row_id, r.iv_id) for r in plain.collect()} == {
        (r.row_id, r.iv_id) for r in binned.collect()
    }


@settings(max_examples=5, deadline=None)
@given(ints=st.lists(st.integers(0, (1 << 128) - 1), min_size=1, max_size=40))
def test_ip_canonicalization_matches_ipaddress(spark, ints):
    """Any 128-bit address, spelled fully-expanded/uppercase/zero-padded,
    canonicalizes to exactly what Python's ipaddress renders (v4-mapped
    adjusted to the dotted ClickHouse display form)."""
    import ipaddress

    from dev_clickhouse_spark.functions.ip import to_ipv6_or_null
    from pyspark.sql import functions as F

    rows = []
    for n in ints:
        a = ipaddress.IPv6Address(n)
        canonical = (
            f"::ffff:{a.ipv4_mapped}" if a.ipv4_mapped is not None else str(a)
        )
        # ugly-but-valid spellings of the same address
        fat = ":".join(f"{(n >> (112 - 16 * i)) & 0xFFFF:04X}" for i in range(8))
        rows.append((fat, canonical))
        rows.append((str(a).upper(), canonical))
    df = spark.createDataFrame(rows, "ip string, want string")
    bad = df.select(
        "ip", "want", to_ipv6_or_null("ip").alias("got")
    ).filter(~F.col("got").eqNullSafe(F.col("want")))
    assert bad.count() == 0, bad.collect()[:5]


@settings(max_examples=5, deadline=None)
@given(
    events=st.lists(
        st.tuples(keys, offsets, keys, keys), min_size=1, max_size=25
    ),
    versions=st.lists(st.tuples(keys, offsets), min_size=0, max_size=15),
)
def test_asof_join_multi_matches_chained_singles(spark, events, versions):
    """The fused multi-dim as-of equals chaining asof_join per dim for
    arbitrary key/timestamp layouts (two dims with distinct payload columns,
    keyed off different event columns, sharing one version list)."""
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.operators.asof import asof_join, asof_join_multi

    ev = spark.createDataFrame(
        [(i, _ts(o), k1, k2) for i, (k1, o, k2, _) in enumerate(events)],
        "event_id long, event_ts timestamp, nk_a string, nk_b string",
    )
    da = spark.createDataFrame(
        [(k, _ts(o), j + 100) for j, (k, o) in enumerate(versions)],
        "nk string, effective_from timestamp, va long",
    )
    db = da.select("nk", "effective_from", (F.col("va") + 1000).alias("vb"))

    fused = asof_join_multi(
        ev,
        [("a", da, "nk_a", "nk", "effective_from", "va"),
         ("b", db, "nk_b", "nk", "effective_from", "vb")],
        left_ts="event_ts", id_cols=["event_id", "event_ts"],
    )

    step = asof_join(
        ev, da.withColumnRenamed("nk", "nk_a"),
        on="nk_a", left_ts="event_ts", right_ts="effective_from",
    )
    step = asof_join(
        step, db.withColumnRenamed("nk", "nk_b"),
        on="nk_b", left_ts="event_ts", right_ts="effective_from",
    )
    got = sorted((r.event_id, r.va, r.vb) for r in fused.collect())
    want = sorted((r.event_id, r.va, r.vb) for r in step.collect())
    assert got == want


@given(
    st.text(
        alphabet=list("ab;'\"`\\-/*\n g"),  # quotes, escapes, comment starters
        max_size=60,
    ),
    st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_serving_masker_invariants(sql, mask_backticks):
    """The serving endpoint's lexical masker (security-critical: the ';' and
    global_temp deny scans run on its output) must (1) preserve length, so
    positions line up with the original statement, (2) only ever blank
    characters or pass them through unchanged — never invent text, and
    (3) never reveal a character the strict variant hides (monotone:
    keeping backticks visible can only add back backtick-region chars)."""
    from dev_clickhouse_spark.serving import _mask_quoted

    masked = _mask_quoted(sql, mask_backticks)
    assert len(masked) == len(sql)
    for orig, m in zip(sql, masked):
        assert m == orig or m == " "
    if mask_backticks:
        # strict mask hides at least everything the lenient mask hides
        lenient = _mask_quoted(sql, False)
        for pos, (strict_c, lenient_c) in enumerate(zip(masked, lenient)):
            if lenient_c == " ":
                assert strict_c == " " or sql[pos] == " ", (pos, sql)


# -- ALTER-surface property: random append/rename/drop/compact sequences ----

_alter_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 3)),
        st.tuples(st.just("rename"), st.integers(0, 99)),
        st.tuples(st.just("drop"), st.integers(0, 99)),
        st.tuples(st.just("modify"), st.integers(0, 99)),
        st.tuples(st.just("compact"), st.just(0)),
    ),
    min_size=1, max_size=7,
)


@settings(max_examples=5, deadline=None)
@given(ops=_alter_ops)
def test_alter_sequence_matches_eager_model(spark, tmp_path_factory, ops):
    """Any interleaving of appends, metadata-only RENAME/DROP COLUMN,
    non-widening MODIFY COLUMN (cast-on-read chains), and compaction
    serves exactly the rows an eager-rewrite model holds: name chains,
    type chains, and their compositions (rename-after-modify,
    modify-then-merge retirement) are invisible to readers."""
    from pyspark.sql import types as T

    from dev_clickhouse_spark.plans.warehouse import Warehouse
    from dev_clickhouse_spark.quality import SchemaMigrator

    tmp = tmp_path_factory.mktemp("alterprop")
    wh = Warehouse(spark, str(tmp / "wh"))
    mig = SchemaMigrator(wh)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("c0", T.StringType()),
        T.StructField("c1", T.DoubleType()),
    ])
    wh.save_schema_override("t", schema)
    # model: logical column list + rows as dicts under CURRENT names
    cols = ["k", "c0", "c1"]
    model: list[dict] = []
    batch = 0
    fresh = 0
    for op, arg in ops:
        if op == "append":
            rows = [
                {c: (batch * 100 + i if c == "k"
                     else f"s{batch}_{i}" if wh.schema_for("t")[c].dataType
                     == T.StringType() else float(batch + i))
                 for c in cols}
                for i in range(arg)
            ]
            df = spark.createDataFrame(
                [tuple(r[c] for c in cols) for r in rows],
                wh.schema_for("t"),
            )
            wh.append("t", df, batch_id=batch)
            model.extend(rows)
            batch += 1
        elif op == "rename":
            renameable = [c for c in cols if c != "k"]
            if not renameable:
                continue
            old = renameable[arg % len(renameable)]
            new = f"r{fresh}"
            fresh += 1
            mig.rename_column("t", old, new)
            cols[cols.index(old)] = new
            for r in model:
                r[new] = r.pop(old)
        elif op == "drop":
            droppable = [c for c in cols if c != "k"]
            if len(droppable) < 2:
                continue  # keep at least one payload column
            victim = droppable[arg % len(droppable)]
            mig.drop_column("t", victim, metadata_only=True)
            cols.remove(victim)
            for r in model:
                r.pop(victim)
        elif op == "modify":
            # retype a currently-double payload column to string; the
            # model converts with str() (floats here are x.0, which
            # Spark's double→string cast renders identically)
            doubles = [
                c for c in cols
                if wh.schema_for("t")[c].dataType == T.DoubleType()
            ]
            if not doubles:
                continue
            victim = doubles[arg % len(doubles)]
            mig.modify_column_type("t", victim, T.StringType())
            for r in model:
                r[victim] = str(r[victim])
        else:
            if wh.exists("t"):
                wh.compact("t")
    got = sorted(
        (tuple(sorted(r.asDict().items())) for r in wh.read("t").collect())
    )
    want = sorted(tuple(sorted(r.items())) for r in model)
    assert got == want
