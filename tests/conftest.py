"""Shared fixtures: one SparkSession per test session, DuckDB oracle helper
mirroring the driver's compare (row count + schema + order-insensitive
value hash, floats rounded to 6dp)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flu_data_pipeline_spark.catalog import TESTDATA_TABLES
from flu_data_pipeline_spark.session import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_ORACLE = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="flu_data_pipeline_spark-tests", shuffle_partitions=8)
    yield s


#: What a harness-built SparkSession looks like with none of our confs:
#: ANSI on, nanos parquet unreadable, host (non-UTC) timezone, stock
#: shuffle/broadcast sizing, no optimizer exclusions. The driver-parity
#: gate forces these before EVERY query; builders must recover via
#: ensure_session_defaults (CORRECTNESS_r01: 17/19 failures were
#: session coupling invisible to an engine-session-only suite).
STOCK_CONFS = {
    "spark.sql.ansi.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.shuffle.partitions": "200",
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
}


def stockify(s):
    """Reset a session to driver-stock confs (undo engine runtime confs)."""
    for k, v in STOCK_CONFS.items():
        s.conf.set(k, v)
    try:
        s.conf.unset("spark.sql.optimizer.excludedRules")
    except Exception:
        pass
    return s


@pytest.fixture(scope="session")
def spark_stock(spark):
    """Separate SQLConf namespace on the shared context, simulating the
    driver's own default-config session."""
    return spark.newSession()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(SF_ORACLE, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def canonicalize(value):
    """Round floats to 6dp, normalize date/time/Decimal to str, None stays."""
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


def result_key(columns, rows):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted(
        tuple(repr(canonicalize(row[i])) for i in order) for row in rows
    )
    return [columns[i] for i in order], canon_rows


def compare_query(spark, duck, name, builder, oracle, sf_dir=SF_ORACLE):
    """Driver-style compare of a Spark builder vs its DuckDB oracle."""
    sdf = builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_res = duck.execute(oracle)
    d_cols = [c[0] for c in d_res.description]
    d_rows = d_res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, s_canon = result_key(s_cols, s_rows)
    _, d_canon = result_key(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
