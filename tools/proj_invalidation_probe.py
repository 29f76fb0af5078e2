#!/usr/bin/env python
"""Member-scoped projection invalidation — measure, don't claim.

Round-9 verdict #1: the r9 implementation dropped ALL projection state
whenever the DV/patch epoch moved, so a one-row lightweight DELETE cost
a full-table re-aggregation per projection — a scale-killer for mixed
read/mutate workloads at 100 TB.  Round 10 made invalidation
member-scoped (overlays address (file, position); a file belongs to
exactly one member; only fold batches whose members the new overlay
entries touch are dropped and re-folded).

This probe MEASURES the contract across growing member counts N:

- ``refolded == 1`` after a 1-row delete, at every N;
- the refold ensure() wall time is ~FLAT in N (it re-aggregates one
  member of constant size), while the initial full build grows ~N —
  the gap is exactly what the r9 wholesale rebuild paid per delete.

Artifact: PROJ_INVALIDATION.json, one row per N.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dev_clickhouse_spark.io import load_table  # noqa: E402
from dev_clickhouse_spark.plans.projection import (  # noqa: E402
    Measure,
    Metric,
    ProjectionSet,
    ProjectionSpec,
)
from dev_clickhouse_spark.plans.warehouse import Warehouse  # noqa: E402
from dev_clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

SPEC = ProjectionSpec(
    name="by_type",
    dims=("event_type",),
    measures=(Measure("count"), Measure("sum", "value")),
)
METRICS = [
    Metric("count", None, "cnt"),
    Metric("sum", "value", "sum_value", 2),
]


def probe(spark, root: str, n_members: int) -> dict:
    wh = Warehouse(spark, os.path.join(root, f"wh{n_members}"))
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    # constant member SIZE, growing member COUNT: each member is the same
    # 1/12th slice of the base events, appended n_members times with
    # disjoint event_ids — the shape of a growing ingest history
    base = ev.filter(F.col("event_id") % 12 == 0).localCheckpoint()
    member_rows = base.count()
    max_id = ev.agg(F.max("event_id")).first()[0] + 1
    for b in range(n_members):
        wh.append(
            "ev",
            base.withColumn(
                "event_id", F.col("event_id") + F.lit(b * max_id)
            ),
            batch_id=b,
        )
    ps = ProjectionSet(wh, "ev", [SPEC])
    t0 = time.monotonic()
    rep_build = ps.ensure()
    build_s = time.monotonic() - t0
    assert rep_build.folded_now == n_members, rep_build

    victim = wh.read("ev").select("event_id").first()[0]
    wh.delete_where_lightweight("ev", F.col("event_id") == victim)
    t0 = time.monotonic()
    rep = ps.ensure()
    refold_s = time.monotonic() - t0
    df, rep2 = ps.answer(["event_type"], METRICS)
    rows = df.count()
    base_rows = ps._base_scan(["event_type"], METRICS).count()
    return {
        "n_members": n_members,
        "member_rows": member_rows,
        "build_s": round(build_s, 3),
        "refolded": rep.refolded,
        "rebuilt": rep.rebuilt,
        "refold_ensure_s": round(refold_s, 3),
        "answer_rows": rows,
        "answer_matches_base": rows == base_rows,
    }


def main() -> None:
    import shutil
    import tempfile

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="proj-inval-")
    rows = []
    try:
        for n in (4, 12, 24):
            rows.append(probe(spark, root, n))
            print(json.dumps(rows[-1]), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    flat = (
        rows[-1]["refold_ensure_s"]
        <= max(3.0 * rows[0]["refold_ensure_s"], rows[0]["refold_ensure_s"] + 1.0)
    )
    ok = all(
        r["refolded"] == 1 and not r["rebuilt"] and r["answer_matches_base"]
        for r in rows
    )
    out = {
        "probe": "proj_invalidation",
        "sf_dir": SF_DIR,
        "rows": rows,
        "refold_flat_in_n": flat,
        "verdict": "PASS" if (ok and flat) else "FAIL",
    }
    with open("PROJ_INVALIDATION.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"verdict": out["verdict"]}))


if __name__ == "__main__":
    main()
