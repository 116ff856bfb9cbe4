"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's oracle-checked query registry
(:mod:`flu_data_pipeline_spark.plans`): ``entry(spark)`` smoke-runs the
flagship pricing-summary aggregation at sf0.001; ``queries()`` returns one
builder per implemented operator from SURVEY.md §2 (+ the dedup /
similarity / text extensions); ``oracle_sql()`` the matching DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flu_data_pipeline_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: qd.builder for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None
    }
