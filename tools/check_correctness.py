#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every registry query through Spark AND its DuckDB oracle on the same
parquet tables, then compares row-count, column names, and the order-insensitive
row multiset (columns sorted by name, values normalized).  Usage:

    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize_cell(v):
    import datetime as dt

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and float noise surviving upstream rounding
        return round(v + 0.0, 9)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    if isinstance(v, int):
        return int(v)
    return v


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(normalize_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import dev_clickhouse_spark.queries  # noqa: F401 — populate registry
    from dev_clickhouse_spark.queries import REGISTRY
    from dev_clickhouse_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.names or list(REGISTRY)
    failures = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            if not srows:
                failures.append(name)
            continue
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue

        ok = True
        # The driver's hasher is stricter than normalize_cell: a DuckDB
        # HUGEINT (INT128 — the default result of window/filtered sums over
        # BIGINT) hashes differently from BIGINT even when values are equal.
        # normalize_cell collapses both to Python int, which once masked a
        # driver failure (pack_context_windows, round 2) — so type-check the
        # oracle projection explicitly instead of trusting the values.
        try:
            desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
            wide = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
            if wide:
                print(f"FAIL  {name}: oracle emits INT128 column(s) "
                      f"{wide} — CAST(... AS BIGINT) in the oracle SQL")
                ok = False
        except Exception:
            pass  # DESCRIBE can't wrap every statement shape; value check still runs
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        if ok:
            ms, md = to_multiset(scols, srows), to_multiset(dcols, drows)
            if ms != md:
                only_s = {k: v for k, v in ms.items() if md.get(k) != v}
                only_d = {k: v for k, v in md.items() if ms.get(k) != v}
                print(f"FAIL  {name}: value mismatch "
                      f"({len(only_s)} spark-only / {len(only_d)} duckdb-only keys)")
                for k in list(only_s)[:3]:
                    print(f"   spark : {k}")
                for k in list(only_d)[:3]:
                    print(f"   duckdb: {k}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
