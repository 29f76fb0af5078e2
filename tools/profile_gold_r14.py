#!/usr/bin/env python
"""r14 gold-refresh profiler: split each pipeline's cost into driver-side
plan BUILD time vs cluster EXECUTION time (guide §1 — measure first; the
r13 finding was that plan construction dominates several pipelines).

Replays the bench's exact setup (synthetic 10k-event ingest into a scratch
warehouse), then for each of the 16 pipelines times:
  - build_s: PipelineRunner._build(spec, ...) — pure driver work
    (spark.read + Column-tree construction + eager analysis passes)
  - exec_s:  out.localCheckpoint(eager=True) + count — the cluster jobs

Run twice per pipeline (cold + warm) so per-process caching opportunities
show up as the warm number.  Prints a JSON summary.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from dev_clickhouse_spark.plans import PipelineRunner  # noqa: E402
from dev_clickhouse_spark.plans.spec import topo_sorted_waves  # noqa: E402
from dev_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    spark = get_spark(app_name="profile_gold_r14")
    spark.sparkContext.setLogLevel("ERROR")

    indir = tempfile.mkdtemp(prefix="profile_raw_")
    payloads = bench.synth_payloads(bench.N_INGEST_EVENTS)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    per = max(1, len(payloads) // cpus)
    for i in range(0, len(payloads), per):
        with open(os.path.join(indir, f"part_{i}.jsonl"), "w") as fh:
            fh.write("\n".join(payloads[i : i + per]) + "\n")
    raw = spark.read.text(indir).select(F.col("value").alias("raw"))

    out: dict[str, dict] = {}
    wh_root = tempfile.mkdtemp(prefix="profile_wh_")
    try:
        runner = PipelineRunner(spark, wh_root)
        t0 = time.time()
        runner.ingest_raw(raw, collect_counts=False)
        ingest_s = time.time() - t0

        start_ts = dt.datetime(2026, 1, 8, 9, 0)
        end_ts = dt.datetime(2026, 1, 8, 11, 0)

        # materialize bronze windows once like run_window does
        from dev_clickhouse_spark.schemas import BRONZE_SCHEMAS

        cache = {}
        for t in BRONZE_SCHEMAS:
            df = runner.wh.read_window(t, start_ts, end_ts).persist()
            df.count()
            cache[t] = df

        for wave in topo_sorted_waves(runner.pipelines):
            reads: dict = {}
            for spec in wave:
                rec = {"build_runs": [], "exec_runs": []}
                for rep in range(2):  # cold then warm
                    t0 = time.time()
                    built, mode = runner._build(
                        spec, start_ts, end_ts, cache=cache, reads=reads
                    )
                    rec["build_runs"].append(round(time.time() - t0, 3))
                    t0 = time.time()
                    cp = built.localCheckpoint(eager=True)
                    n = cp.count()
                    rec["exec_runs"].append(round(time.time() - t0, 3))
                    if rep == 0:
                        final = (cp, mode)
                rec["rows"] = n
                out[spec.pipeline_id] = rec
                # actually write so downstream pipelines see real deps
                cp, mode = final
                if mode == "append":
                    runner.wh.append(spec.target_table, cp)
                else:
                    runner.wh.overwrite(spec.target_table, cp)

        for df in cache.values():
            df.unpersist()
    finally:
        shutil.rmtree(wh_root, ignore_errors=True)
        shutil.rmtree(indir, ignore_errors=True)

    total_build_cold = sum(v["build_runs"][0] for v in out.values())
    total_build_warm = sum(v["build_runs"][1] for v in out.values())
    total_exec = sum(v["exec_runs"][1] for v in out.values())
    print(json.dumps({
        "ingest_s": round(ingest_s, 3),
        "total_build_cold_s": round(total_build_cold, 3),
        "total_build_warm_s": round(total_build_warm, 3),
        "total_exec_warm_s": round(total_exec, 3),
        "pipelines": out,
    }, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
