#!/usr/bin/env python
"""Interleaved A/B attribution for per-query bench deltas (VERDICT r11 #5).

Three queries changed BOTH plan hash and driver wall-time r10→r11:
``dedup_incremental_new_vs_corpus`` (+30%), ``lm_char_trigram_scores``
(+26%), ``rollup_state_distinct_users`` (+41%).  Single runs cannot
adjudicate (this VM swings ±30% with page-cache state), so this tool
checks the r10 tree into a git worktree and runs each query as A/B
PAIRS — HEAD then r10, back to back, in fresh subprocesses — and
compares the median of per-pair ratios (the paired estimator: both
sides of a pair share machine state, so load cancels).

Artifact: QUERY_AB_PAIR.json.  Verdict per query: REGRESSION if the
median pair ratio exceeds the threshold (default 1.15), else NOISE.

Usage: python tools/query_ab_pair.py [--old-rev f8d344b] [--reps 3]
       [--queries a,b,c]
       (probe mode, internal: --probe --tree PATH --queries a,b,c)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

HEAD_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "dedup_incremental_new_vs_corpus",
    "lm_char_trigram_scores",
    "rollup_state_distinct_users",
]


def probe(tree: str, queries: list[str]) -> None:
    """Median-of-3 wall time per named registry query at the bench sf,
    plus the post-AQE plan hash; one JSON line on stdout."""
    import time

    sys.path.insert(0, tree)
    os.chdir(tree)
    from bench import _plan_hash
    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="query_ab_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"times": {}, "plan_hashes": {}}
    for name in queries:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.collect()
            runs.append(time.time() - t0)
        out["times"][name] = round(sorted(runs)[1], 3)
        out["plan_hashes"][name] = _plan_hash(df)
    print(json.dumps(out))
    spark.stop()


def run_probe(tree: str, queries: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe",
         "--tree", tree, "--queries", ",".join(queries)],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--tree", default=HEAD_REPO)
    ap.add_argument("--old-rev", default="f8d344b")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--threshold", type=float, default=1.15)
    ap.add_argument("--out", default=os.path.join(HEAD_REPO,
                                                  "QUERY_AB_PAIR.json"))
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]
    if args.probe:
        probe(args.tree, queries)
        return

    sys.path.insert(0, HEAD_REPO)
    from tools.quietcheck import quiet_stamp, settle

    settle()
    quiet = quiet_stamp()
    old_tree = "/tmp/ab_old_tree"
    subprocess.run(["git", "worktree", "remove", "--force", old_tree],
                   cwd=HEAD_REPO, capture_output=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", old_tree, args.old_rev],
        cwd=HEAD_REPO, check=True, capture_output=True,
    )
    try:
        pairs = []
        for rep in range(args.reps):
            head = run_probe(HEAD_REPO, queries)
            old = run_probe(old_tree, queries)
            pairs.append({"rep": rep, "head": head, "old": old})
            print(json.dumps({
                "rep": rep,
                "head": head["times"], "old": old["times"],
            }), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", old_tree],
                       cwd=HEAD_REPO, capture_output=True)

    results = {}
    for q in queries:
        ratios = sorted(
            p["head"]["times"][q] / max(p["old"]["times"][q], 1e-3)
            for p in pairs
        )
        med_ratio = statistics.median(ratios)
        results[q] = {
            "head_median": round(statistics.median(
                p["head"]["times"][q] for p in pairs), 3),
            "old_median": round(statistics.median(
                p["old"]["times"][q] for p in pairs), 3),
            "pair_ratios": [round(x, 3) for x in ratios],
            "head_over_old": round(med_ratio, 3),
            "head_plan_hashes": sorted(
                {p["head"]["plan_hashes"][q] for p in pairs}),
            "old_plan_hashes": sorted(
                {p["old"]["plan_hashes"][q] for p in pairs}),
            "verdict": (
                "REGRESSION" if med_ratio > args.threshold else "NOISE"
            ),
        }
    artifact = {
        "probe": "query_ab_pair",
        "old_rev": args.old_rev,
        "reps": args.reps,
        "threshold": args.threshold,
        "results": results,
        "pairs": pairs,
        "quiet": quiet,
        "generated_by": "tools/query_ab_pair.py",
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({q: r["verdict"] for q, r in results.items()}))


if __name__ == "__main__":
    main()
