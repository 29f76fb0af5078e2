#!/usr/bin/env python
"""Scale series for the round-11b query families — measure, don't
extrapolate.

The driver testdata ships a natural ×10/×10 series (sf0.001 → sf0.01 →
sf0.1); this probe runs each round-11b operator at every point, records
best-of-reps wall clock and output rows, and gates the consecutive-point
exponent alpha = log10(t_hi/t_lo) ≤ ALPHA_MAX whenever both points clear
the overhead floor (sub-second timings are reported, not gated — they
measure Spark fixed cost, not the operator).

Families and their expected shapes:
- quality_model_scores / importance_resample_by_quality — map-only (zero
  or one shuffle): linear in rows, output linear.
- non_negative_derivative_daily — one lag-window shuffle per type: linear.
- group_array_sorted_last — one hash aggregate, bounded output per key:
  linear in rows, output grows with user cardinality.
- exp_time_decayed_daily — data-sized exact aggregate + a GRID-sized fold
  (days × types): near-linear in rows, output bounded by the calendar
  (asserted: output grows STRICTLY slower than rows).
- The column-ALTER reads (modify/clear/colttl) rebuild a scratch
  warehouse per call; their scale story is the ALTER_READ_OVERHEAD probe
  (members axis), not the sf axis, so they are not re-measured here.

Artifact: R11B_SCALE.json.
Usage: python tools/r11b_scale_probe.py [--reps 2] [--out R11B_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA_MAX = 1.3
GATE_FLOOR_SEC = 1.0

QUERIES = [
    "quality_model_scores",
    "importance_resample_by_quality",
    "non_negative_derivative_daily",
    "group_array_sorted_last",
    "exp_time_decayed_daily",
    "min_sample_size_continuous_by_type",
]

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "R11B_SCALE.json",
    ))
    args = ap.parse_args()

    import dev_clickhouse_spark.queries  # noqa: F401 — populate registry
    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import get_spark
    from tools.quietcheck import quiet_stamp, settle

    settle()
    quiet = quiet_stamp()
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    series: dict[str, list[dict]] = {}
    for q in QUERIES:
        fn = REGISTRY[q].fn
        pts = []
        for sf in SF_DIRS:
            best, rows = math.inf, None
            for _ in range(args.reps):
                t0 = time.time()
                rows = fn(spark, sf).count()
                best = min(best, time.time() - t0)
            pts.append({"sf": sf.rsplit("/", 1)[-1],
                        "sec": round(best, 3), "rows": rows})
        series[q] = pts

    checks: dict[str, bool] = {}
    rows_out = {}
    for q, pts in series.items():
        alphas = []
        for lo, hi in zip(pts, pts[1:]):
            a = (
                round(math.log10(hi["sec"] / lo["sec"]), 3)
                if lo["sec"] > 0 else None
            )
            gated = (
                lo["sec"] >= GATE_FLOOR_SEC and hi["sec"] >= GATE_FLOOR_SEC
            )
            alphas.append({
                "transition": f'{lo["sf"]}->{hi["sf"]}',
                "alpha": a, "gated": gated,
            })
            if gated:
                checks[f"{q}_{lo['sf']}_to_{hi['sf']}_alpha"] = (
                    a is not None and a <= ALPHA_MAX
                )
        rows_out[q] = {"points": pts, "alphas": alphas}
        # output-volume invariants
        r = [p["rows"] for p in pts]
        if q == "exp_time_decayed_daily":
            # grid-sized output: strictly sub-linear in data growth
            checks["exp_time_decayed_output_sublinear"] = (
                r[2] < 10 * r[1] and r[1] < 10 * r[0]
            )
        if q in ("quality_model_scores",):
            # one output row per document (testdata docs do NOT scale
            # uniformly: 500/500/5000 across the series — track actuals)
            import pyarrow.parquet as pq

            doc_counts = [
                pq.ParquetFile(os.path.join(sf, "documents.parquet"))
                .metadata.num_rows
                for sf in SF_DIRS
            ]
            checks["quality_output_tracks_docs"] = r == doc_counts

    failed = sorted(k for k, v in checks.items() if not v)
    artifact = {
        "metric": "r11b_scale_series",
        "alpha_max": ALPHA_MAX,
        "gate_floor_sec": GATE_FLOOR_SEC,
        "series": rows_out,
        "checks": checks,
        "quiet": quiet,
        "verdict": "PASS" if not failed else f"FAIL: {failed}",
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({k: v for k, v in artifact.items()
                      if k not in ("series",)}))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
