#!/usr/bin/env python
"""Interleaved A/B attribution for the two builder-quiet bench declines
(VERDICT r10 next-round #1): ``gold_refresh_16_pipelines`` 6.71→8.07 s
and ``ingest_10k_events`` 1706→1217 ev/s between the r9 and r10 trees.

Bench e2e is known to swing ±30% with page-cache state, so single runs
cannot adjudicate.  This tool checks out the r9 bench tree into a git
worktree and runs the ingest+gold cycle as A/B PAIRS — HEAD then r9,
back to back, in fresh subprocesses, ``--reps`` times — so both sides
see the same machine state within each pair.  The verdict compares the
per-side medians: a real regression must survive interleaving; a
page-cache artifact averages out.

Artifact: BENCH_AB_PAIR.json with every pair attached (the r10 verdict's
"noise adjudication with the pairs attached" requirement).

Usage: python tools/bench_ab_pair.py [--r9-rev 609dae7] [--reps 3]
       (probe mode, internal: --probe --tree PATH)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

HEAD_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(tree: str) -> None:
    """One fresh-warehouse ingest+gold cycle against the code at `tree`;
    prints one JSON line {ingest_sec, gold_sec, pipeline_secs}."""
    import shutil
    import tempfile
    import time

    sys.path.insert(0, tree)
    os.chdir(tree)
    import datetime as dt

    from pyspark.sql import functions as F

    from bench import N_INGEST_EVENTS, synth_payloads
    from dev_clickhouse_spark.plans import PipelineRunner
    from dev_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="bench_ab_probe")
    spark.sparkContext.setLogLevel("ERROR")
    indir = tempfile.mkdtemp(prefix="ab_raw_")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    payloads = synth_payloads(N_INGEST_EVENTS)
    per = max(1, len(payloads) // cpus)
    for i in range(0, len(payloads), per):
        with open(os.path.join(indir, f"part_{i}.jsonl"), "w") as fh:
            fh.write("\n".join(payloads[i:i + per]) + "\n")
    raw = spark.read.text(indir).select(F.col("value").alias("raw"))
    wh = tempfile.mkdtemp(prefix="ab_wh_")
    try:
        runner = PipelineRunner(spark, wh)
        t0 = time.time()
        runner.ingest_raw(raw, collect_counts=False)
        ingest_sec = time.time() - t0
        t0 = time.time()
        metrics = runner.run_window(
            dt.datetime(2026, 1, 8, 9, 0), dt.datetime(2026, 1, 8, 11, 0)
        )
        gold_sec = time.time() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(indir, ignore_errors=True)
    print(json.dumps({
        "ingest_sec": round(ingest_sec, 3),
        "gold_sec": round(gold_sec, 3),
        "pipeline_secs": {m["pipeline_id"]: m["seconds"] for m in metrics},
    }))
    spark.stop()


def run_probe(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe",
         "--tree", tree],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--tree", default=HEAD_REPO)
    ap.add_argument("--r9-rev", default="609dae7")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(HEAD_REPO,
                                                  "BENCH_AB_PAIR.json"))
    args = ap.parse_args()
    if args.probe:
        probe(args.tree)
        return

    sys.path.insert(0, HEAD_REPO)
    from tools.quietcheck import quiet_stamp, settle

    settle()
    quiet = quiet_stamp()
    r9_tree = "/tmp/ab_r9_tree"
    subprocess.run(["git", "worktree", "remove", "--force", r9_tree],
                   cwd=HEAD_REPO, capture_output=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", r9_tree, args.r9_rev],
        cwd=HEAD_REPO, check=True, capture_output=True,
    )
    try:
        pairs = []
        for rep in range(args.reps):
            head = run_probe(HEAD_REPO)
            r9 = run_probe(r9_tree)
            pairs.append({"rep": rep, "head": head, "r9": r9})
            print(json.dumps({
                "rep": rep,
                "head": {k: head[k] for k in ("ingest_sec", "gold_sec")},
                "r9": {k: r9[k] for k in ("ingest_sec", "gold_sec")},
            }), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", r9_tree],
                       cwd=HEAD_REPO, capture_output=True)

    med = lambda side, k: statistics.median(p[side][k] for p in pairs)  # noqa: E731
    deltas = {}
    for k in ("ingest_sec", "gold_sec"):
        h, r = med("head", k), med("r9", k)
        # the PAIRED estimator: each pair shares machine state, so the
        # per-pair ratio cancels load; the median of ratios is robust to
        # one contaminated pair, where the ratio of unpaired medians is
        # not (it can pair a hot HEAD run against a cold r9 run)
        ratios = sorted(p["head"][k] / p["r9"][k] for p in pairs)
        deltas[k] = {
            "head_median": round(h, 3), "r9_median": round(r, 3),
            "pair_ratios": [round(x, 3) for x in ratios],
            "head_over_r9": round(statistics.median(ratios), 3),
        }
    # per-pipeline medians for attribution when gold moved
    pipes = sorted(pairs[0]["head"]["pipeline_secs"])
    pipe_deltas = {}
    for p_id in pipes:
        h = statistics.median(
            p["head"]["pipeline_secs"].get(p_id, 0.0) for p in pairs
        )
        r = statistics.median(
            p["r9"]["pipeline_secs"].get(p_id, 0.0) for p in pairs
        )
        pipe_deltas[p_id] = {
            "head": round(h, 3), "r9": round(r, 3),
            "ratio": round(h / r, 3) if r else None,
        }
    # adjudication: a real regression survives interleaving at >15%
    threshold = 1.15
    regressed = {
        k: v for k, v in deltas.items() if v["head_over_r9"] > threshold
    }
    artifact = {
        "metric": "bench_ab_pair",
        "r9_rev": args.r9_rev,
        "reps": args.reps,
        "protocol": "interleaved HEAD/r9 pairs, fresh subprocess + fresh "
                    "warehouse per probe, medians compared",
        "pairs": pairs,
        "medians": deltas,
        "pipeline_medians": pipe_deltas,
        "regression_threshold": threshold,
        "quiet": quiet,
        "verdict": (
            "NOISE: interleaved medians agree within the threshold — the "
            "r9->r10 builder-quiet deltas were machine-state variance"
            if not regressed else
            "REGRESSION: " + ", ".join(
                f"{k} head/r9 = {v['head_over_r9']}"
                for k, v in regressed.items()
            )
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"verdict": artifact["verdict"],
                      "medians": deltas}))


if __name__ == "__main__":
    main()
