"""Mirror of the driver's t2 correctness gate: every registry query with an
oracle is hash-compared against DuckDB at sf0.01; oracle-less queries get a
rows-run smoke check."""

from __future__ import annotations

import pytest

from flu_data_pipeline_spark.plans import REGISTRY

from .conftest import SF_ORACLE, compare_query

WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    qd = REGISTRY[name]
    compare_query(spark, duck, name, qd.builder, qd.oracle)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, name):
    qd = REGISTRY[name]
    df = qd.builder(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


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
