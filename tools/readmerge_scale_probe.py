#!/usr/bin/env python
"""Scale series for the round-10 read-time-merge family — measure, don't
extrapolate (VERDICT r10 next-round #3).

`read_final` / `read_summed` / `read_collapsed` are each ONE key shuffle
whose cost must track live rows; `apply_ttl_group_by` must stay one
compact pass; the hierarchical-dictionary unrolled lookup is map-only
against a broadcast dict, so its cost must track probe rows with the
dictionary held constant.  This probe builds a manifest warehouse table
at N, 10N and 100N rows (multiple members, so the read-time merge
actually crosses parts), measures each operator's wall clock, and gates
the consecutive-point exponent alpha = log10(t_k1/t_k0) at <= ALPHA_MAX
for the large transition (sub-second timings are overhead-dominated and
reported but not gated).

Rows-per-key is constant by construction (key count grows with N), so
every operator's OUTPUT also grows exactly 10x per step — checked as an
invariant alongside the timing.

Artifact: READMERGE_SCALE.json.
Usage: python tools/readmerge_scale_probe.py [--base-rows 200000]
       [--reps 2] [--out READMERGE_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dev_clickhouse_spark.functions.dict import SparkDictionary  # noqa: E402
from dev_clickhouse_spark.plans.warehouse import Warehouse  # noqa: E402
from dev_clickhouse_spark.session import get_spark  # noqa: E402

ALPHA_MAX = 1.3
GATE_FLOOR_SEC = 1.0  # both points must exceed this for the alpha gate
VERSIONS_PER_KEY = 4
N_MEMBERS = 3


def build_table(spark, wh: Warehouse, n_rows: int) -> str:
    """N rows, n/VERSIONS keys x VERSIONS versions, split over N_MEMBERS
    manifest members so read-time merges really cross parts.  Half the
    rows are 'old' (TTL-expired), signs alternate with a surviving +1
    per key, value is summable."""
    t = "rm_events"
    df = (
        spark.range(n_rows)
        .select(
            (F.col("id") / VERSIONS_PER_KEY).cast("long").alias("k"),
            (F.col("id") % VERSIONS_PER_KEY).cast("int").alias("v"),
            # even keys: 2x(+1)/2x(-1) -> annihilate; odd keys: 3x(+1)/
            # 1x(-1) -> net +2, latest state survives.  Half the keys
            # disappear, half serve one row: both collapse paths scale.
            F.when(
                ((F.col("id") / VERSIONS_PER_KEY).cast("long") % 2) == 0,
                F.when(F.col("id") % 4 < 2, 1).otherwise(-1),
            ).otherwise(
                F.when(F.col("id") % 4 == 1, -1).otherwise(1)
            ).cast("int").alias("sign"),
            (F.col("id") % 97).cast("double").alias("value"),
            (F.col("id") % 25).cast("int").alias("nation_id"),
            F.when(
                (F.col("id") % 2) == 0,
                F.to_timestamp(F.lit("2026-01-01 00:00:00")),
            ).otherwise(
                F.to_timestamp(F.lit("2026-02-01 00:00:00"))
            ).alias("ts"),
            F.col("id"),
        )
    )
    wh.save_schema_override(t, df.schema)
    for m in range(N_MEMBERS):
        wh.append(t, df.filter(F.col("id") % N_MEMBERS == m), batch_id=m)
    return t


def timeit(fn, reps: int) -> float:
    best = math.inf
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def run_point(spark, root: str, n_rows: int, reps: int) -> dict:
    out: dict = {"rows": n_rows, "ops": {}}
    wh = Warehouse(spark, os.path.join(root, f"wh_{n_rows}"))
    t = build_table(spark, wh, n_rows)

    def op_final():
        return wh.read_final(t, ["k"], "v").count()

    def op_summed():
        return wh.read_summed(t, ["k"], ["value"], order_col="v").count()

    def op_collapsed():
        return wh.read_collapsed(t, ["k"], "sign", version_col="v").count()

    def op_dict():
        # constant 25-node hierarchy (binary parent chain, depth ~5),
        # probed by every row: unrolled in-plan lookups, map-only
        nodes = spark.createDataFrame(
            [(i, i // 2 if i >= 1 else None) for i in range(25)],
            "nid int, parent int",
        )
        d = SparkDictionary(nodes, "nid", ["parent"])
        d.set_hierarchy({i: i // 2 for i in range(1, 25)})
        return (
            wh.read(t)
            .select(F.size(d.get_hierarchy(F.col("nation_id"))).alias("d"))
            .agg(F.sum("d")).collect()[0][0]
        )

    counts = {}
    for name, fn in [
        ("read_final", op_final),
        ("read_summed", op_summed),
        ("read_collapsed", op_collapsed),
        ("dict_hierarchy_probe", op_dict),
    ]:
        counts[name] = fn()  # warm + invariant
        out["ops"][name] = {"sec": round(timeit(fn, reps), 3),
                            "out_rows": counts[name]}

    # TTL rollup mutates the table: fresh copy, single measured apply
    wh_ttl = Warehouse(spark, os.path.join(root, f"wh_ttl_{n_rows}"))
    build_table(spark, wh_ttl, n_rows)
    t0 = time.time()
    wh_ttl.apply_ttl_group_by(
        t, "2026-01-15T00:00:00", group_by=["k"],
        aggregates={"value": "sum(value)", "ts": "max(ts)",
                    "v": "min(v)", "sign": "min(sign)",
                    "nation_id": "min(nation_id)", "id": "min(id)"},
        ttl_col="ts",
    )
    out["ops"]["apply_ttl_group_by"] = {
        "sec": round(time.time() - t0, 3),
        "out_rows": wh_ttl.read(t).count(),
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-rows", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="READMERGE_SCALE.json")
    ap.add_argument("--workdir", default="/tmp/readmerge_scale")
    args = ap.parse_args()

    from tools.quietcheck import quiet_stamp, settle

    settle()
    quiet = quiet_stamp()
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    points = [
        run_point(spark, args.workdir, args.base_rows * f, args.reps)
        for f in (1, 10, 100)
    ]
    ops = sorted(points[0]["ops"])
    series, failures = {}, []
    for op in ops:
        row: dict = {"sec": [p["ops"][op]["sec"] for p in points],
                     "out_rows": [p["ops"][op]["out_rows"] for p in points],
                     "alphas": []}
        for a, b in ((0, 1), (1, 2)):
            ta, tb = row["sec"][a], row["sec"][b]
            alpha = math.log10(max(tb, 1e-3) / max(ta, 1e-3))
            gated = ta >= GATE_FLOOR_SEC and tb >= GATE_FLOOR_SEC
            row["alphas"].append(
                {"step": f"x{10**a}->x{10**b}", "alpha": round(alpha, 3),
                 "gated": gated}
            )
            if gated and alpha > ALPHA_MAX:
                failures.append(f"{op} {row['alphas'][-1]}")
        # output must grow exactly 10x per step (constant rows-per-key),
        # except the dict probe whose invariant is the summed depth
        r0, r1, r2 = row["out_rows"]
        row["rows_linear"] = (r1 == 10 * r0 and r2 == 10 * r1)
        if not row["rows_linear"]:
            failures.append(f"{op} rows not linear: {row['out_rows']}")
        series[op] = row
    artifact = {
        "metric": "readmerge_scale",
        "base_rows": args.base_rows,
        "factors": [1, 10, 100],
        "alpha_max": ALPHA_MAX,
        "gate_floor_sec": GATE_FLOOR_SEC,
        "protocol": {
            "reps_min": args.reps, "members": N_MEMBERS,
            "versions_per_key": VERSIONS_PER_KEY,
            "ttl": "single apply on a fresh copy, stats=False (one pass)",
        },
        "ops": series,
        "quiet": quiet,
        "verdict": "PASS" if not failures else "FAIL",
        "failures": failures,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({"verdict": artifact["verdict"],
                      "failures": failures}))
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
