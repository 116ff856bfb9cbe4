#!/usr/bin/env python
"""Drive named queries through the driver contract vs DuckDB at any SF.

The executable form of .claude/skills/verify/SKILL.md step 2: runs each
named query via ``__spark_entry__.queries()`` on the ENGINE session,
runs its ``oracle_sql()`` in DuckDB on the same parquet, and compares
row count, sorted column names, and an order-insensitive value hash
with floats rounded to 6dp (the driver's t2 canonicalization).

    python scripts/verify_contract.py q1,q2[,...] [sf_dir]

Default sf_dir is sf0.1 — bigger than the sf0.01 test suite, surfacing
skew/parallelism issues. Exits non-zero on any mismatch. Differs from
driver_sweep.py in two ways: it does NOT re-stock the session (the
sweep is the stock-session gate; this is the fast iteration loop), and
it takes explicit names instead of sweeping the registry.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        # normalize -0.0: repr('-0.0') != repr('0.0') would make a
        # value straddling zero across engines a spurious mismatch
        return 0.0 if r == 0 else r
    if isinstance(v, decimal.Decimal):
        r = round(float(v), 6)
        return 0.0 if r == 0 else r
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(canon(r[i])) for i in order) for r in rows)


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from flu_data_pipeline_spark.session import get_spark

    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="verify-contract")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    qs, oracles = entry.queries(), entry.oracle_sql()
    ok = True
    for n in names:
        df = qs[n](spark, sf_dir)
        srows = [tuple(r) for r in df.collect()]
        cur = con.execute(oracles[n])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        cols_ok = sorted(df.columns) == sorted(dcols)
        hash_ok = canon_rows(df.columns, srows) == canon_rows(dcols, drows)
        ok &= cols_ok and hash_ok
        print(
            f"{n}: spark {len(srows)} rows, duck {len(drows)} rows, "
            f"cols_match={cols_ok}, hash_match={hash_ok}"
        )
    print("ALL GREEN" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
