#!/usr/bin/env python
"""Scale probe for the round-10 recursive-CTE analog
(`operators/iterative.py` pointer doubling): measure the hierarchy walk
at ×N part-table size and verify the round count grows LOGARITHMICALLY
while wall-clock stays ~linear — the entire reason the operator exists
(a literal level-by-level recursion would add one full shuffle per
extra tree level; doubling adds one per DOUBLING of depth).

Output: ITERATIVE_SCALE.json.  In-process probe protocol.

Usage: python tools/iterative_scale_probe.py [--factor 100]
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


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from dev_clickhouse_spark.io import load_table
    from dev_clickhouse_spark.queries.iterative import (
        recursive_cte_part_hierarchy,
    )

    part = load_table(spark, sf_dir, "part")
    max_key = part.agg(F.max("p_partkey")).first()[0]
    depth = int(max_key).bit_length() - 1
    rounds = max(1, math.ceil(math.log2(depth + 1)))
    t0 = time.monotonic()
    rows = recursive_cte_part_hierarchy(spark, sf_dir).collect()
    wall = round(time.monotonic() - t0, 3)
    return {
        "n_parts": part.count(),
        "max_depth": depth,
        "doubling_rounds": rounds,
        "wall_s": wall,
        "depth_levels_out": len(rows),
        "total_nodes_out": sum(int(r["n_nodes"]) for r in rows),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--base-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="ITERATIVE_SCALE.json")
    ap.add_argument("--workdir", default="/tmp/iter_scale")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dev_clickhouse_spark.io import load_table
    from dev_clickhouse_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    os.makedirs(args.workdir, exist_ok=True)
    # CONTIGUOUS-key inflation (key += replica * n_base), NOT the
    # rehearsal's power-of-10 family offsets: the heap hierarchy
    # parent(k) = k div 2 is only closed over a contiguous range, and the
    # honest ×N shape for a recursive walk is ONE deeper/wider tree —
    # sparse replicas would instead produce 2 M orphan roots whose walks
    # terminate immediately (and which the query now rightly excludes)
    part = load_table(spark, args.base_sf, "part")
    n_base = part.count()
    inflated = part.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(args.factor - 1)))
    ).withColumn(
        "p_partkey", F.col("p_partkey") + F.col("_r") * F.lit(n_base)
    ).drop("_r")
    inflated.repartition(32).write.mode("overwrite").parquet(
        os.path.join(args.workdir, "part.parquet")
    )

    base = measure(spark, args.base_sf)
    xn = measure(spark, args.workdir)
    ratio = round(xn["wall_s"] / base["wall_s"], 2)
    extra_rounds = xn["doubling_rounds"] - base["doubling_rounds"]
    # envelope: wall within 2.5x of data growth; rounds grow by at most
    # log2(factor) (the doubling contract — a literal recursion would
    # instead add ~log2(factor)*depth_base/depth_base LEVELS of shuffles)
    # node invariant: keys are contiguous 0..N·n−1 and exactly key 0 is
    # excluded ONCE (not once per replica), so xn = factor·n_base − 1
    ok = (
        ratio <= args.factor * 2.5
        and extra_rounds <= math.ceil(math.log2(args.factor)) + 1
        and xn["total_nodes_out"] == args.factor * base["n_parts"] - 1
    )
    artifact = {
        "probe": "iterative_scale",
        "protocol": "in-process probe, single session, sequential timings",
        "base_sf": args.base_sf,
        "factor": args.factor,
        "base": base,
        "xn": xn,
        "wall_ratio": ratio,
        "extra_doubling_rounds": extra_rounds,
        "verdict": "PASS" if ok else "ATTENTION: see ratios",
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({"verdict": artifact["verdict"],
                      "wall_ratio": ratio,
                      "rounds": (base["doubling_rounds"],
                                 xn["doubling_rounds"])}))
    shutil.rmtree(args.workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
