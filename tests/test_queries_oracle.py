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
