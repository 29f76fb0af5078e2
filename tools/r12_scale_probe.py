#!/usr/bin/env python
"""Scale series for the round-12 additions — measure, don't extrapolate.

Same protocol as tools/r11b_scale_probe.py: each operator runs at every
point of the natural driver testdata series (sf0.001 → sf0.01 → sf0.1,
×10/×10 on the fact tables), best-of-reps wall clock + output rows, and
the consecutive-point exponent alpha = log10(t_hi/t_lo) is gated at
ALPHA_MAX whenever both points clear the overhead floor.

Operators and expected shapes:
- dsir_importance_weights — one map-only feature explode + two map-side-
  combinable aggregations; both bag models bounded by the bucket count
  (4096) regardless of corpus size, so the ratio join broadcasts:
  linear in corpus tokens, output = one row per document.
- group_array_sorted_last — re-measured after the r12 array_join
  serialization (string build is map-side, bounded 5 elements/key):
  the plan must stay one hash aggregate, linear.

Artifact: R12_SCALE.json.
Usage: python tools/r12_scale_probe.py [--reps 2] [--out R12_SCALE.json]
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
    "dsir_importance_weights",
    "group_array_sorted_last",
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
        "R12_SCALE.json",
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
    import pyarrow.parquet as pq

    doc_counts = [
        pq.ParquetFile(os.path.join(sf, "documents.parquet"))
        .metadata.num_rows
        for sf in SF_DIRS
    ]
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
        if q == "dsir_importance_weights":
            checks["dsir_output_tracks_docs"] = (
                [p["rows"] for p in pts] == doc_counts
            )

    failed = sorted(k for k, v in checks.items() if not v)
    artifact = {
        "metric": "r12_scale_series",
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
