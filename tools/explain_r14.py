#!/usr/bin/env python
"""Round-13 optimization harness: capture ``.explain("formatted")`` + noop-sink
timings for the bench registry queries (guide §1.4: time the computation, not
the collect; §7.2: read the plan).

Writes ``plans/r14/<name>_<tag>.txt`` (the judge-checkable plan artifact) and
prints a JSON timing line per query.  Usage:

    python tools/explain_r14.py before [name ...]   # default: all bench names
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import get_spark

    spark = get_spark(app_name=f"explain_r14_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(REPO, "plans", "r14")
    os.makedirs(outdir, exist_ok=True)

    timings = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"r14 {tag}: {name}")
        runs = []
        df = None
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        timings[name] = sorted(runs)[1]
        # formatted plan AFTER execution (includes AQE final where applicable)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(json.dumps({"name": name, "median_noop_sec": timings[name],
                          "runs": runs}))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": tag, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
