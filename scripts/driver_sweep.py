#!/usr/bin/env python
"""Full driver-contract sweep: run EVERY `__spark_entry__.queries()` entry
on a stock, driver-like SparkSession (default confs — ANSI on, nanos
parquet unreadable, non-UTC timezone) and hash-compare against
`oracle_sql()` in DuckDB, mirroring the driver's t2 canonicalization
(sorted column names, order-insensitive rows, floats rounded to 6dp).

This is the strongest local predictor of CORRECTNESS_r{N}.json: the
round-1 postmortem showed engine-session-only testing hid 17/19 driver
failures. Usage:

    python scripts/driver_sweep.py [sf_dir]          # default sf0.01
    python scripts/driver_sweep.py --only name1,name2

Prints one line per query and a final summary; exits non-zero on any
failure.
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canonicalize(value):
    import datetime
    import decimal

    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if isinstance(value, decimal.Decimal):
        return round(float(value), 6)
    if isinstance(value, (datetime.date, datetime.datetime)):
        return str(value)
    return value


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(repr(canonicalize(row[i])) for i in order) for row in rows)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = "/root/testdata/sf0.01"
    only = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--only":
            only = set(args.pop(0).split(","))
        else:
            sf_dir = a

    # A deliberately STOCK session: no engine confs. ensure_session_defaults
    # inside the builders must make every query work here.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-sweep")
        .config("spark.sql.shuffle.partitions", "200")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as entry
    from flu_data_pipeline_spark.catalog import TESTDATA_TABLES

    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = [n for n in qs if only is None or n in only]
    failures = []
    t_all = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"[{i+1}/{len(names)}] {name}: rows-only ({len(s_rows)} rows) "
                      f"{time.time()-t0:.1f}s")
                continue
            d_res = con.execute(oracles[name])
            d_cols = [c[0] for c in d_res.description]
            d_rows = d_res.fetchall()
            ok_schema = sorted(s_cols) == sorted(d_cols)
            ok_count = len(s_rows) == len(d_rows)
            ok_hash = ok_schema and ok_count and (
                canon_rows(s_cols, s_rows) == canon_rows(d_cols, d_rows)
            )
            status = "OK" if ok_hash else "MISMATCH"
            if not ok_hash:
                failures.append(name)
                detail = (f" spark_cols={sorted(s_cols)} duck_cols={sorted(d_cols)}"
                          if not ok_schema else
                          f" spark_rows={len(s_rows)} duck_rows={len(d_rows)}"
                          if not ok_count else " value-hash diff")
            else:
                detail = f" ({len(s_rows)} rows)"
            print(f"[{i+1}/{len(names)}] {name}: {status}{detail} {time.time()-t0:.1f}s")
        except Exception:
            failures.append(name)
            tb = traceback.format_exc().strip().splitlines()
            print(f"[{i+1}/{len(names)}] {name}: ERROR {tb[-1]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} green in "
          f"{time.time()-t_all:.0f}s; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
