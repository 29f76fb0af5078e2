"""Spill/GC probe for the ×30→×50 tail bend (SCALING.md round-8 section).

SCALE_X50.json's `tail_superlinear` names six queries whose wall-time bends
between ×30 and ×50 while their candidate/output volumes grow EXACTLY
linearly (census + invariants).  The working hypothesis recorded in
SCALING.md is fixed-box memory saturation: execution-memory spill (or GC
pressure) beginning between ×30 and ×50 on 32 cores / 28 g — a regime a
real cluster never enters because executors are sized so per-core state
stays constant as data grows.

This tool produces the evidence either way.  For each target query it runs
one isolated worker per CELLS entry (fresh driver JVM each, adaptive
warm-up, median of reps — the exact protocol of tools/scale_rehearsal.py)
across a (factor × driver-memory × shuffle-partitions) matrix, and scrapes the Spark status REST API (``/api/v1/applications/<id>/stages``)
after the timed runs for the aggregate task metrics that name the cause:

    memoryBytesSpilled / diskBytesSpilled   — execution-memory spill
    jvmGcTime vs executorRunTime            — GC-pressure fraction
    shuffleReadBytes / shuffleWriteBytes    — in-flight shuffle state size

Verdict logic per query:
  * spill@28g ≫ 0 and spill@56g ≈ 0 with a big time drop  → cause = spill
  * gc_frac@28g ≫ gc_frac@56g with a big time drop        → cause = GC
  * neither moves                                          → hypothesis
    refuted; the bend needs a different attribution.

Writes SPILL_PROBE.json at the repo root (one JSON object, quiet-stamped).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    "dedup_ngram_jaccard_pairs",   # α_local 2.76 at ×50
    "scd2_user_type_versions",     # α_local 2.65
    "dedup_cosine_pairs_sharded",  # α_local 2.47
    "dedup_keep_list",             # α_local 1.77
]

# (factor, driver_memory, shuffle_partitions).  32 partitions is the regime
# the committed ×30/×50 artifacts ACTUALLY ran under (a round-8 commit
# documented a 256-ceiling session change but never landed it); 256 is the
# alternative the recorded SPILL_PROBE.json ran as the then-session-default
# "dfltp" cells — kept EXPLICIT now that the session default went back to
# the core count and volume-proportional sizing moved to
# session.partitions_for_factor (the probe's own A/B is the evidence that
# rule is built on).  The 56g cell isolates the memory axis inside the old
# regime.
CELLS = [
    (30, "28g", 32),
    (30, "28g", 256),
    (50, "28g", 32),
    (50, "56g", 32),
    (50, "28g", 256),
]


def _rest_stage_totals(spark) -> dict:
    """Sum the cause-naming task metrics over all completed stages."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.loads(r.read())
    tot = {
        "memory_spilled_bytes": 0, "disk_spilled_bytes": 0,
        "jvm_gc_time_ms": 0, "executor_run_time_ms": 0,
        "shuffle_read_bytes": 0, "shuffle_write_bytes": 0,
    }
    for s in stages:
        tot["memory_spilled_bytes"] += s.get("memoryBytesSpilled", 0)
        tot["disk_spilled_bytes"] += s.get("diskBytesSpilled", 0)
        tot["jvm_gc_time_ms"] += s.get("jvmGcTime", 0)
        tot["executor_run_time_ms"] += s.get("executorRunTime", 0)
        tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
    return tot


def worker(name: str, sf_dir: str, reps: int,
           shuffle_partitions: int | None) -> None:
    """Fresh-JVM single-query measurement + REST metric scrape.

    Prints ONE JSON line.  Driver memory comes from $SPARK_DRIVER_MEMORY,
    set by the parent per cell.  Warm-up follows the rehearsal protocol
    (re-run untimed until the runtime stops dropping >20%, max 4)."""
    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import get_spark

    spark = get_spark(
        app_name=f"spill_probe_{name}",
        shuffle_partitions=shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = REGISTRY[name].fn
    prev = None
    for _ in range(4):
        t0 = time.time()
        len(fn(spark, sf_dir).collect())
        dt = time.time() - t0
        if prev is not None and dt >= prev * 0.8:
            break
        prev = dt
    before = _rest_stage_totals(spark)
    runs, n = [], 0
    for _ in range(reps):
        t0 = time.time()
        n = len(fn(spark, sf_dir).collect())
        runs.append(time.time() - t0)
    after = _rest_stage_totals(spark)
    delta = {k: after[k] - before[k] for k in after}
    gc_frac = (
        delta["jvm_gc_time_ms"] / delta["executor_run_time_ms"]
        if delta["executor_run_time_ms"] else 0.0
    )
    print(json.dumps({
        "median_sec": round(sorted(runs)[len(runs) // 2], 3),
        "rows": n,
        "reps": reps,
        "metrics_per_rep": {k: v // reps for k, v in delta.items()},
        "gc_frac": round(gc_frac, 4),
        "driver_memory": spark.conf.get("spark.driver.memory"),
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/spill_probe")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SPILL_PROBE.json")
    ap.add_argument("--targets", default=",".join(TARGETS))
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--worker-query", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--worker-sf", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--worker-shuffle-partitions", type=int, default=0,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker_query:
        worker(args.worker_query, args.worker_sf, args.reps,
               args.worker_shuffle_partitions or None)
        return

    from quietcheck import quiet_stamp, settle
    from scale_rehearsal import synthesize

    targets = [t for t in args.targets.split(",") if t]
    factors = sorted({f for f, _, _ in CELLS})
    data_dirs = {f: os.path.join(args.workdir, f"x{f}") for f in factors}
    if not args.skip_synth:
        os.environ.setdefault("SPARK_DRIVER_MEMORY", "28g")
        from dev_clickhouse_spark.session import get_spark

        spark = get_spark(app_name="spill_probe_synth")
        spark.sparkContext.setLogLevel("ERROR")
        for f in factors:
            print(f"synthesizing ×{f} → {data_dirs[f]}", flush=True)
            synthesize(spark, args.base_sf, data_dirs[f], f,
                       tables=["events", "documents", "embeddings"])
        spark.stop()

    settle()
    stamp = quiet_stamp()
    results: dict[str, dict] = {}
    for name in targets:
        results[name] = {}
        for factor, mem, parts in CELLS:
            cell = f"x{factor}_{mem}_{parts}p"
            env = dict(os.environ, SPARK_DRIVER_MEMORY=mem)
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--worker-query", name, "--worker-sf", data_dirs[factor],
                "--reps", str(args.reps),
                "--worker-shuffle-partitions", str(parts or 0),
            ]
            proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"worker {name} {cell} failed:\n{proc.stderr[-2000:]}")
            res = json.loads(proc.stdout.strip().splitlines()[-1])
            results[name][cell] = res
            m = res["metrics_per_rep"]
            print(
                f"  {name} {cell}: {res['median_sec']}s  "
                f"spill={m['memory_spilled_bytes'] / 1e9:.2f}GB(mem)/"
                f"{m['disk_spilled_bytes'] / 1e9:.2f}GB(disk)  "
                f"gc={res['gc_frac']:.1%}  "
                f"shuffleW={m['shuffle_write_bytes'] / 1e6:.0f}MB",
                flush=True,
            )

    # Per-query attribution across the two axes, plus the local exponent
    # under the now-actually-applied 256-ceiling default.
    import math

    verdicts = {}
    for name, cells in results.items():
        def t(c):
            return cells[c]["median_sec"]

        def spill(c):
            m = cells[c]["metrics_per_rep"]
            return m["memory_spilled_bytes"] + m["disk_spilled_bytes"]

        mem_drop = (t("x50_28g_32p") - t("x50_56g_32p")) / t("x50_28g_32p")
        part_drop = (t("x50_28g_32p") - t("x50_28g_256p")) / t("x50_28g_32p")
        alpha_dflt = round(
            math.log(t("x50_28g_256p") / t("x30_28g_256p"))
            / math.log(50 / 30), 2)
        v = {
            "alpha_local_x30_x50_256p": alpha_dflt,
            "time_drop_2x_memory_at_32p": round(mem_drop, 2),
            "time_drop_256_ceiling_vs_32p": round(part_drop, 2),
            "spill_bytes_per_rep_32p_28g": spill("x50_28g_32p"),
            "spill_bytes_per_rep_256p_28g": spill("x50_28g_256p"),
            "gc_frac_32p_28g": cells["x50_28g_32p"]["gc_frac"],
            "gc_frac_256p_28g": cells["x50_28g_256p"]["gc_frac"],
        }
        verdicts[name] = v
        print(f"  VERDICT {name}: {json.dumps(v)}", flush=True)

    out = {
        "metric": "x30_x50_tail_memory_attribution",
        "base_sf": args.base_sf,
        "cells": [f"x{f}_{m}_{p}p" for f, m, p in CELLS],
        "reps": args.reps,
        "protocol": "process-per-query, adaptive warm-up, median of reps; "
                    "REST stage-metric delta over the timed reps only",
        "quiet": stamp,
        "results": results,
        "verdicts": verdicts,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
