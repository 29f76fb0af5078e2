#!/usr/bin/env python
"""Interleaved A/B of the lightweight-mutation read/write split between two
trees (VERDICT r13 #3: re-adjudicate the lightweight_{update,delete}_read
"regressed" rows with the paired-probe protocol).

Runs bench._mutation_read_split in fresh subprocesses, alternating tree A
and tree B within each rep, and reports per-key median pair ratios.

Usage: python tools/mutsplit_ab_r14.py --tree-a /tmp/ab_r12 --tree-b /tmp/ab_r13
       [--reps 3] [--out MUTSPLIT_AB_R14.json]
       (probe mode: --probe --tree PATH)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def probe(tree: str) -> None:
    sys.path.insert(0, tree)
    os.chdir(tree)
    from bench import _mutation_read_split
    from dev_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="mutsplit_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(json.dumps(_mutation_read_split(spark, sf_dir)))
    spark.stop()


def run_probe(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe", "--tree", tree],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--tree", default=None)
    ap.add_argument("--tree-a", help="old tree (denominator)")
    ap.add_argument("--tree-b", help="new tree (numerator)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.probe:
        probe(args.tree)
        return

    pairs = []
    for rep in range(args.reps):
        b = run_probe(args.tree_b)
        a = run_probe(args.tree_a)
        pairs.append({"rep": rep, "a": a, "b": b})
        print(json.dumps(pairs[-1]), flush=True)

    keys = sorted(pairs[0]["a"])
    medians = {}
    for k in keys:
        ratios = sorted(
            p["b"][k] / p["a"][k] for p in pairs if p["a"][k] > 0
        )
        medians[k] = {
            "a_median": statistics.median(p["a"][k] for p in pairs),
            "b_median": statistics.median(p["b"][k] for p in pairs),
            "pair_ratios": [round(r, 3) for r in ratios],
            "b_over_a": round(statistics.median(ratios), 3),
        }
    artifact = {
        "metric": "mutsplit_ab_pair",
        "tree_a": args.tree_a,
        "tree_b": args.tree_b,
        "reps": args.reps,
        "protocol": "interleaved B/A pairs, fresh subprocess + fresh "
                    "scratch warehouse per probe, median of pair ratios",
        "pairs": pairs,
        "medians": medians,
    }
    out = args.out or os.path.join(
        os.path.dirname(HERE), "MUTSPLIT_AB_R14.json"
    )
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v["b_over_a"] for k, v in medians.items()}))


if __name__ == "__main__":
    main()
