#!/usr/bin/env python
"""Scale probe for the round-10 semantic-clustering operator
(`llm/cluster.py`): MEASURE what k-means + SemDeDup cost at ×N corpus
size under the two k policies a production deployment must choose
between, instead of hand-waving the 100 TB story.

Lloyd assignment is O(N·k·d); within-cluster dedup is O(Σ|cluster|²·d)
≈ N²·d/k for balanced clusters.  So:

- **k fixed** (what the driver-scale registry query pins): assignment
  is LINEAR in N — measured here — but the dedup candidate set grows
  ~N²/k (computed exactly here from the assignment histogram; not
  timed at ×N, it is the configuration you must NOT run at scale).
- **k ∝ N** (constant target cluster size — the SemDeDup paper's
  operating point): the dedup pair set returns to ~linear — measured —
  while assignment picks up the N·k factor; the mitigation ladder for
  THAT term is already in-repo (IVF over centroids,
  `llm/similarity.py` — assign against √k super-centroids first).

Corpus inflation reuses the rehearsal's per-replica ±1 sign-pattern
isometry (`scale_rehearsal.synthesize`), so within-replica geometry is
exactly the base corpus and cross-replica vectors behave like random
pairs.

Output: KMEANS_SCALE.json.  In-process probe (the PROJ_INVALIDATION /
SPILL_PROBE protocol), quiet-stamped.

Usage: python tools/kmeans_scale_probe.py [--factor 10]
       [--base-sf /root/testdata/sf0.1] [--out KMEANS_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quiet_stamp() -> dict:
    try:
        load = os.getloadavg()[0]
    except OSError:
        load = -1.0
    others = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == os.getpid():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "python" in cmd and "pytest" not in cmd:
            others += 1
    return {"loadavg_1m": round(load, 2), "other_python_procs": others}


def measure(spark, sf_dir: str, k: int, time_dedup: bool) -> dict:
    """Time assignment (kmeans_rounds → count) and, optionally, the full
    within-cluster dedup; always return the assignment histogram and the
    EXACT candidate-pair count Σ C(|cluster|, 2) it implies."""
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.io import load_table
    from dev_clickhouse_spark.llm.cluster import (
        _quantize,
        kmeans_rounds,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.select("vec_id", _quantize(F.col("embedding")).alias("q"))
    n = df.count()

    t0 = time.monotonic()
    asg = kmeans_rounds(spark, df, k, n_rounds=2)
    hist = {
        int(r["cl"]): int(r["n"])
        for r in asg.groupBy("cl").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assign_s = round(time.monotonic() - t0, 3)
    cand_pairs = sum(c * (c - 1) // 2 for c in hist.values())

    out = {
        "n_vectors": n,
        "k": k,
        "assign_s": assign_s,
        "cluster_sizes": {
            "min": min(hist.values()),
            "max": max(hist.values()),
            "mean": round(n / len(hist), 1),
        },
        "candidate_pairs_exact": cand_pairs,
    }
    if time_dedup:
        from dev_clickhouse_spark.llm import cluster as C

        # re-run the registered query with this k so the measured path is
        # the driver-gated one, not a variant
        orig = C.K_CLUSTERS
        C.K_CLUSTERS = k
        try:
            t0 = time.monotonic()
            rows = C.semantic_dedup_within_clusters(spark, sf_dir).collect()
            out["dedup_s"] = round(time.monotonic() - t0, 3)
            out["dup_pairs_found"] = sum(int(r["n_dup_pairs"]) for r in rows)
        finally:
            C.K_CLUSTERS = orig
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="KMEANS_SCALE.json")
    ap.add_argument("--workdir", default="/tmp/kmeans_scale")
    args = ap.parse_args()

    from dev_clickhouse_spark.session import get_spark
    from tools.scale_rehearsal import synthesize

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    os.makedirs(args.workdir, exist_ok=True)
    synth_t0 = time.monotonic()
    synthesize(spark, args.base_sf, args.workdir, args.factor,
               tables=["embeddings"])
    synth_s = round(time.monotonic() - synth_t0, 1)

    quiet = quiet_stamp()
    base_k = 8
    base = measure(spark, args.base_sf, base_k, time_dedup=True)
    xn_fixed = measure(spark, args.workdir, base_k, time_dedup=False)
    xn_scaled = measure(spark, args.workdir, base_k * args.factor,
                        time_dedup=True)

    ratio_assign_fixed = round(xn_fixed["assign_s"] / base["assign_s"], 2)
    ratio_dedup_scaled = round(xn_scaled["dedup_s"] / base["dedup_s"], 2)
    pair_growth_fixed = round(
        xn_fixed["candidate_pairs_exact"] / base["candidate_pairs_exact"], 1
    )
    pair_growth_scaled = round(
        xn_scaled["candidate_pairs_exact"] / base["candidate_pairs_exact"], 1
    )
    # envelopes: fixed-k assignment should be ~linear (within 2.5× of N);
    # scaled-k dedup should be ~linear in wall too; fixed-k PAIRS are
    # EXPECTED ~N²/k-ish (documented, not gated)
    verdict = "PASS"
    problems = []
    if ratio_assign_fixed > args.factor * 2.5:
        problems.append(
            f"fixed-k assignment superlinear: {ratio_assign_fixed}x wall "
            f"for {args.factor}x data"
        )
    if ratio_dedup_scaled > args.factor * 2.5:
        problems.append(
            f"scaled-k dedup superlinear: {ratio_dedup_scaled}x wall "
            f"for {args.factor}x data"
        )
    if problems:
        verdict = "ATTENTION: " + "; ".join(problems)

    artifact = {
        "probe": "kmeans_scale",
        "protocol": "in-process probe, single session, sequential timings",
        "base_sf": args.base_sf,
        "factor": args.factor,
        "synth_sec": synth_s,
        "quiet": quiet,
        "base_k8": base,
        "xn_k_fixed": xn_fixed,
        "xn_k_scaled": xn_scaled,
        "ratios": {
            "assign_wall_fixed_k": ratio_assign_fixed,
            "dedup_wall_scaled_k": ratio_dedup_scaled,
            "candidate_pairs_fixed_k": pair_growth_fixed,
            "candidate_pairs_scaled_k": pair_growth_scaled,
        },
        "verdict": verdict,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({"verdict": verdict, "ratios": artifact["ratios"]}))
    shutil.rmtree(args.workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
