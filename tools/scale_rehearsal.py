#!/usr/bin/env python
"""×N scale rehearsal — measure, don't extrapolate.

Every 100 TB design claim in EXPLAIN.md rests on plan shape at sf0.1.  This
tool synthesizes an order-of-magnitude-larger dataset and MEASURES the bench
pack against it, so a quadratic term hidden behind a healthy-looking plan
(LSH bucket blowup, per-user sequence-string growth, df-cap leaks) shows up
as a super-linear wall-clock ratio instead of a production incident.

Inflation design (default ×10), chosen so the workload stays homogeneous and
the EXPECTED scaling of every query is known:

- every table gets N replicas; each replica is a self-consistent universe —
  all join keys are offset by ``replica * base`` per key FAMILY (custkey in
  customer AND orders, orderkey in orders AND lineitem, …), so referential
  integrity holds within a replica and no key collides across replicas.
- ``documents.text`` gets a per-replica Caesar shift (``translate`` over the
  ascii letters, JVM-side).  Spaces/punctuation/digits are untouched, so
  token boundaries, lengths, and shingle COUNTS are identical per replica —
  but every shingle's bytes differ across replicas, so cross-replica Jaccard
  is ~0 and the TRUE near-dup pair count scales exactly ×N.  A dedup path
  whose candidate set grows faster than ×N is therefore a real bug, not a
  property of the synthetic corpus.
- ``embeddings.embedding`` is multiplied by a per-replica deterministic ±1
  sign pattern (md5 parity of (replica, component)).  A shared sign flip is
  an isometry: within a replica every pairwise cosine is EXACTLY the sf0.1
  value (ANN ground truth scales ×N by construction), while cross-replica
  pairs behave like genuinely random pairs.  NOTE a component ROTATION is
  not enough — the base embeddings have cross-dimension structure that
  survives shifting, which round 6 measured as 86k spurious cross-replica
  pairs at ×10.  Even with sign flips, the ≥0.4 threshold at dim 64 sits at
  ~3.2σ of the random-pair cosine distribution, so the cosine-pair OUTPUT
  grows ~quadratically with corpus size (N² random-tail pairs) exactly as
  a real 10× corpus's would — that query's rows_ratio is expected ≈N²/10,
  and the artifact marks it ``expected_quadratic`` instead of gating it on
  linear growth.
- ``events`` offsets event_id/user_id only: per-user sequence lengths are
  unchanged, so sequence/sessionize state per key stays constant and only
  the KEY COUNT grows — the shape a 1000-executor shuffle actually sees.

Output: ONE JSON artifact (default SCALE_X10.json) with per-query
{sf_sec, xN_sec, ratio}, invariant COUNTS (dedup pairs, ANN rows) proving
near-linear growth, and a ``verdict`` listing any query whose wall-clock
ratio exceeds N (super-linear ⇒ would not survive the next ×10).

Usage: python tools/scale_rehearsal.py [--factor 10] [--out SCALE_X10.json]
       [--base-sf /root/testdata/sf0.1] [--workdir /tmp/scale_x10]
       [--reps 3] [--keep-data]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: join-key FAMILIES: every column in a family gets the same per-replica
#: offset so foreign keys keep matching inside a replica.
KEY_FAMILIES: dict[str, list[tuple[str, str]]] = {
    "regionkey": [("region", "r_regionkey"), ("nation", "n_regionkey")],
    "nationkey": [("nation", "n_nationkey"), ("customer", "c_nationkey"),
                  ("supplier", "s_nationkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

LETTERS = string.ascii_lowercase + string.ascii_uppercase


def _caesar(shift: int) -> str:
    """Rotate the COMBINED 52-letter cycle (not per case): period 52, so
    replica texts only alias at factor > 52.  The first ×30 run rotated
    lower/upper separately (period 26) and replicas 0/26, 1/27, … got
    IDENTICAL text — cross-replica 'near-dups' that inflated the pair
    invariants 116× instead of 30×."""
    s = shift % len(LETTERS)
    return LETTERS[s:] + LETTERS[:s]


def synthesize(spark, base_sf: str, out_dir: str, factor: int,
               tables: list[str] | None = None) -> dict:
    """Write ×factor inflated copies of every test table to ``out_dir``.

    One distributed job per table: scan → explode(replica 0..N-1) → per-key
    offset / per-replica text+vector perturbation → parquet.  No driver-side
    rows; at a real 100 TB base this is the same map-only plan."""
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.io import TEST_TABLES, load_table

    if factor > len(LETTERS):
        raise ValueError(
            f"factor {factor} exceeds the text-perturbation period "
            f"({len(LETTERS)}): replica texts would alias and corrupt the "
            "dedup invariants"
        )
    os.makedirs(out_dir, exist_ok=True)
    # per-family offset base: one power of 10 above the family's max key so
    # replica keyspaces never overlap (computed once, tiny agg per table)
    fam_base: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        mx = 0
        for table, col in cols:
            v = (
                load_table(spark, base_sf, table)
                .agg(F.max(F.col(col)).alias("m")).first().m
            )
            mx = max(mx, int(v or 0))
        b = 10
        while b <= mx:
            b *= 10
        fam_base[fam] = b

    col_offset = {
        (t, c): fam_base[fam]
        for fam, cols in KEY_FAMILIES.items()
        for (t, c) in cols
    }
    counts: dict[str, int] = {}
    for table in (tables if tables is not None else TEST_TABLES):
        df = load_table(spark, base_sf, table)
        out = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        for c in df.columns:
            base = col_offset.get((table, c))
            if base is not None:
                out = out.withColumn(c, F.col(c) + F.col("_r") * F.lit(base))
        if table == "documents":
            shifted = F.col("text")
            for r in range(1, factor):
                shifted = F.when(
                    F.col("_r") == r, F.translate("text", LETTERS, _caesar(r))
                ).otherwise(shifted)
            out = out.withColumn("text", shifted)
        if table == "embeddings":
            # per-replica ±1 sign pattern (replica 0 = identity): exact
            # isometry within a replica, random-pair behavior across
            out = out.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: x * F.when(
                        (F.col("_r") == 0)
                        | (F.pmod(
                            F.xxhash64(F.concat_ws(":", F.col("_r"), i)), 2
                        ) == 0),
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)).cast("float"),
                ),
            )
        path = os.path.join(out_dir, f"{table}.parquet")
        nparts = max(4, min(32, factor * 2))
        out.drop("_r").repartition(nparts).write.mode("overwrite").parquet(path)
        counts[table] = spark.read.parquet(path).count()
    return counts


#: scale-sensitive result-set sizes recorded at both scales: the pair/row
#: counts must grow ~linearly for the banding/df-cap claims to hold.
INVARIANT_QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_keep_list",
    "dedup_exact_stats",
    "dedup_ngram_jaccard_pairs",
    "dedup_embedding_cosine_pairs",
    "dedup_near_dup_clusters",
    "sequence_match_users",
]


def _time_pack(spark, registry, names, sf_dir, reps) -> tuple[dict, dict]:
    timings, rowcounts = {}, {}
    for i, name in enumerate(names):
        fn = registry[name].fn
        runs = []
        n = 0
        for _ in range(reps):
            t0 = time.time()
            n = len(fn(spark, sf_dir).collect())
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        rowcounts[name] = n
        print(f"  [{sf_dir}] {name}: {timings[name]}s ({n} rows)", flush=True)
        # ~200 query executions in one session pin every auto-broadcast in
        # driver storage until the ContextCleaner's weak refs GC; at x30
        # that exhausted an 8g driver mid-pack in r6 and a 16g one in r7
        # once the pack grew to 36 queries.  Nudge BOTH collectors after
        # every query (outside the timed region) so stale broadcasts drop.
        import gc as _gc

        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    return timings, rowcounts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/scale_x10")
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--keep-data", action="store_true")
    ap.add_argument("--skip-synth", action="store_true",
                    help="reuse an existing --workdir")
    ap.add_argument("--pack", choices=["full", "invariants"], default="full",
                    help="'invariants' times only the dedup/ANN/sequence "
                    "invariant family (the ×50 synthesis-cap point, VERDICT "
                    "r6 item #6 — the full pack's curve is already measured "
                    "at ×10/×30)")
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SCALE_X{args.factor}.json",
    )

    # ×N data + ~4·|pack| query executions in one session need driver
    # headroom beyond the sf0.1 default (spark-submit territory on a real
    # cluster; an env override still wins)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "28g")

    from bench import BENCH_QUERIES

    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="scale_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    if not args.skip_synth:
        # the invariant family reads only the LLM-side tables — skip the
        # TPC-H inflation (lineitem alone is 30M rows at x50)
        synth_tables = (
            ["documents", "embeddings", "events"]
            if args.pack == "invariants" else None
        )
        counts = synthesize(spark, args.base_sf, args.workdir, args.factor,
                            tables=synth_tables)
    else:
        # reusing an existing workdir: recover the row counts so the
        # artifact stays self-describing (footer-metadata counts, cheap)
        counts = {
            t[: -len(".parquet")]: spark.read.parquet(
                os.path.join(args.workdir, t)
            ).count()
            for t in sorted(os.listdir(args.workdir))
            if t.endswith(".parquet")
        }
    synth_sec = round(time.time() - t0, 1)

    wanted = (
        INVARIANT_QUERIES + ["dedup_cosine_pairs_sharded"]
        if args.pack == "invariants"
        else BENCH_QUERIES + INVARIANT_QUERIES
    )
    pack = list(dict.fromkeys(q for q in wanted if q in REGISTRY))
    # warm first (JIT/codegen caches), then measure base before inflated so
    # any residual warm-up bias penalizes the ×N side, not the baseline
    base_t, base_n = _time_pack(spark, REGISTRY, pack, args.base_sf, args.reps)
    big_t, big_n = _time_pack(spark, REGISTRY, pack, args.workdir, args.reps)

    queries = {
        q: {
            "base_sec": base_t[q],
            "xn_sec": big_t[q],
            "ratio": round(big_t[q] / base_t[q], 2) if base_t[q] > 0 else None,
        }
        for q in pack
    }
    # dedup_embedding_cosine_pairs' output includes the random-pair tail at
    # its 0.4/dim-64 operating point, which grows ~N² in any real corpus —
    # its rows_ratio is reported but not gated on linear growth
    quadratic_output = {"dedup_embedding_cosine_pairs"}
    invariants = {
        q: {
            "base_rows": base_n[q],
            "xn_rows": big_n[q],
            "rows_ratio": round(big_n[q] / base_n[q], 2) if base_n[q] else None,
            **({"expected_quadratic": True} if q in quadratic_output else {}),
        }
        for q in INVARIANT_QUERIES
        if q in REGISTRY
    }
    # The wall-clock gate exempts queries whose OUTPUT is declared quadratic
    # (their time cannot scale linearly when their result set doesn't — at
    # ×50 the exact cosine-pair query emits 2.5M rows, 2694× base, and that
    # is the documented reason the sharded path exists).  They are still
    # reported, under their own key, so a regression is visible.
    superlinear = sorted(
        q for q, v in queries.items()
        if v["ratio"] is not None and v["ratio"] > args.factor
        and q not in quadratic_output
    )
    quadratic_over = sorted(
        q for q, v in queries.items()
        if v["ratio"] is not None and v["ratio"] > args.factor
        and q in quadratic_output
    )
    artifact = {
        "metric": "scale_rehearsal",
        "factor": args.factor,
        "base_sf": args.base_sf,
        "synth_sec": synth_sec,
        "row_counts": counts,
        "queries": queries,
        "invariants": invariants,
        "superlinear": superlinear,
        "expected_quadratic_over_envelope": quadratic_over,
        "verdict": (
            "PASS: no query exceeds the x%d wall-clock envelope" % args.factor
            + (
                " (quadratic-output exact path over it as designed: %s)"
                % ", ".join(quadratic_over) if quadratic_over else ""
            )
            if not superlinear
            else "ATTENTION: super-linear queries need a plan diff: %s"
            % ", ".join(superlinear)
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: artifact[k] for k in
                      ("factor", "synth_sec", "superlinear", "verdict")}))
    print(f"wrote {out_path}")
    if not args.keep_data:
        shutil.rmtree(args.workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
