#!/usr/bin/env python
"""r14 overlay-read profiler: why does a patch/DV-overlaid read cost 3-5x a
plain read (driver mutation_read_split: patch_dv_read 1.16-2.27 s vs plain
0.41-0.46 s)?

Reproduces the bench's _mutation_read_split scratch warehouse, then times the
overlaid read's phases separately:
  - plan_s: wh.read(t) DataFrame construction (driver-side only)
  - exec_s: the groupBy agg collect (cluster)
and dumps .explain("formatted") of the overlaid read so join strategies /
exchange counts are visible.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dev_clickhouse_spark.io import load_table  # noqa: E402
from dev_clickhouse_spark.plans.warehouse import Warehouse  # noqa: E402
from dev_clickhouse_spark.session import get_spark  # noqa: E402


def timed(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    return runs


def main() -> None:
    from pyspark.sql import functions as F

    spark = get_spark(app_name="profile_overlay_r14")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ev = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="profile_mutsplit_")
    out: dict = {}
    try:
        wh = Warehouse(spark, root)
        for b in range(3):
            wh.append("ev", ev.filter(F.col("event_id") % 3 == b), batch_id=b)

        def agg(df):
            return df.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("decimal(27,4)")).alias("s"),
            )

        # plain
        out["plain_plan_s"] = timed(lambda: wh.read("ev"))
        out["plain_exec_s"] = timed(lambda: agg(wh.read("ev")).collect())

        wh.delete_where_lightweight("ev", "event_type = 'error'")
        wh.delete_where_lightweight("ev", "value > 250.0")
        out["dv_plan_s"] = timed(lambda: wh.read("ev"))
        out["dv_exec_s"] = timed(lambda: agg(wh.read("ev")).collect())

        wh.update_where_lightweight(
            "ev", {"value": "value * 2"}, "event_type = 'purchase'"
        )
        wh.update_where_lightweight(
            "ev", {"value": "value + 100"}, "event_type = 'click'"
        )
        wh.update_where_lightweight(
            "ev", {"value": "value * 1.5"}, "event_type = 'purchase'"
        )
        out["patch_plan_s"] = timed(lambda: wh.read("ev"))
        out["patch_exec_s"] = timed(lambda: agg(wh.read("ev")).collect())

        # fixed plan, repeated exec: isolates per-read plan build cost
        df = agg(wh.read("ev"))
        out["patch_exec_fixed_plan_s"] = timed(lambda: df.collect())

        plan_path = os.environ.get(
            "OVERLAY_PLAN_OUT", "/tmp/overlay_read_plan.txt"
        )
        with open(plan_path, "w") as fh:
            fh.write(agg(wh.read("ev"))._jdf.queryExecution().toString())
        out["plan_file"] = plan_path
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
