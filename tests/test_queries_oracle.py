"""Mirror of the driver's t2 correctness gate: every registry query with an
oracle is hash-compared against DuckDB at sf0.01; oracle-less queries get a
rows+canonicalize check. The gate runs on a SIMULATED DRIVER SESSION —
stock confs (ANSI on, non-UTC tz, no nanos handling) are re-forced before
every single query, so any builder that depends on who built the
SparkSession fails here, not in CORRECTNESS_r{N}."""

from __future__ import annotations

import pytest

from flu_data_pipeline_spark.plans import REGISTRY

from .conftest import SF_ORACLE, compare_query, stockify

WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark_stock, duck, name):
    qd = REGISTRY[name]
    compare_query(stockify(spark_stock), duck, name, qd.builder, qd.oracle)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark_stock, name):
    qd = REGISTRY[name]
    df = qd.builder(stockify(spark_stock), SF_ORACLE)
    # Mirror the driver's rows-only canonicalization: toPandas + sort by
    # every column — unsortable column types (arrays/maps at top level)
    # must fail here like they fail there.
    pdf = df.toPandas()
    assert len(pdf.columns) > 0
    pdf.sort_values(by=list(pdf.columns))
    assert len(pdf) >= 0


def test_engine_session_still_green(spark, duck):
    """get_spark()'s own session stays a first-class citizen: spot-check a
    representative oracle query on the engine-built session too."""
    qd = REGISTRY["report_weekly_trends"]
    compare_query(spark, duck, qd.name, qd.builder, qd.oracle)


def test_serving_edge_format_and_fold():
    """A12/F14/F15: driver-side fold + display formatting happen AFTER
    collect, never in engine tables (api/app.py:240-251,296,336)."""
    from flu_data_pipeline_spark.plans.flu_reports import format_report

    rows = [
        {"week": "2025-01-05", "pct": 3.14159, "wili": 2.5, "n": 7},
        {"week": "2025-01-12", "pct": None, "wili": 0.123456, "n": 4},
    ]
    out = format_report(rows, percent_cols=("pct",), f3_cols=("wili",))
    assert out[0]["pct"] == "3.14%" and out[1]["pct"] is None
    assert out[0]["wili"] == "2.500" and out[1]["wili"] == "0.123"
    # A12: driver-side fold over the (tiny) collected result set
    assert sum(r["n"] for r in rows) == 11
    assert max(float(r["wili"]) for r in out) == 2.5
