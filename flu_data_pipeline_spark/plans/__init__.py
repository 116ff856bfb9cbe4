"""Query plans.

``registry`` collects every implemented query/operator as a
:class:`QueryDef` — a Spark DataFrame builder plus (where SQL-expressible)
the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes this
registry to the correctness driver.

Modules register on import; import them all here so
``from flu_data_pipeline_spark.plans import registry`` sees the full
inventory.
"""

from flu_data_pipeline_spark.plans import (  # noqa: F401
    cdc_queries,
    curation_queries,
    dedup_queries,
    dq_queries,
    events_queries,
    experiment_queries,
    flu_reports,
    flu_tables,
    graph_queries,
    incremental_queries,
    layout_queries,
    join_queries,
    multimodal_queries,
    rank_stats_queries,
    regression_queries,
    relational,
    sketch_queries,
    similarity_queries,
    skew_queries,
    streaming_queries,
    subquery_queries,
    text_queries,
    timeseries_queries,
    tpch_queries,
    warehouse_queries,
    window_queries,
)
from flu_data_pipeline_spark.plans.registry import REGISTRY, QueryDef, register

__all__ = ["REGISTRY", "QueryDef", "register"]
