"""Executed-plan SQL-metric reader: runtime bounds as query outputs.

The self-proving plan-shape assertions (PartitionFilters present, no
N*k stage, broadcast vs shuffle) pin what Catalyst PLANS; this module
pins what the plan DID — a plan can be shaped right and still move too
much data (wrong cap arithmetic, a filter that stopped pruning, a
join condition that silently widened). The pattern: a builder executes
a bounded probe (collect of an aggregate), then reads the relevant
node's SQLMetric (`shuffleRecordsWritten`, `numOutputRows`,
`numFiles`) off that frame's FINAL adaptive executed plan and emits
the metric VALUE as a result column, with the paired DuckDB oracle
computing the same number arithmetically. If execution ever moves
more data than the arithmetic says it can, the correctness gate goes
red — the runtime sibling of a plan-shape test.

Gotcha (documented in the verify recipe): `df.count()` / a noop write
execute a NEW query execution whose plan stays `isFinalPlan=false`;
the metrics live only on the executed plan of the frame you actually
``collect()``-ed. Hence :func:`collect_with_metrics` returning both.

Scope limitation: the walk follows ``children()`` (plus the AQE stage
unwrapping) only — plan nodes INSIDE subquery expressions
(``node.subqueries()``: scalar subqueries, DPP InSubquery filters) are
never visited, so a metric target nested in a subquery reports
found=0. All current gate probes are subquery-free by construction
(repartition → join → agg); if a future probe needs a subquery-side
metric, extend ``_walk`` to also traverse ``node.subqueries()``.

Public knowledge only: SQLMetric names match what the Spark UI shows
per node (`org.apache.spark.sql.execution.metric.SQLMetrics`); the
py4j traversal mirrors `SparkPlan.children` with the standard
adaptive-execution unwrapping (`AdaptiveSparkPlanExec.executedPlan`,
`QueryStageExec.plan`).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = ["collect_with_metrics", "node_metrics"]


def _walk(node: Any):
    """Yield every SparkPlan node, unwrapping AQE stage containers."""
    yield node
    cls = node.getClass().getName()
    if "AdaptiveSparkPlanExec" in cls:
        yield from _walk(node.executedPlan())
        return
    if "QueryStageExec" in cls:
        # ShuffleQueryStage / BroadcastQueryStage / ResultQueryStage
        yield from _walk(node.plan())
        return
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk(it.next())


def node_metrics(df: DataFrame, node_substr: str) -> list[dict[str, int]]:
    """Metric maps (name -> value) of every executed-plan node whose
    ``nodeName`` contains ``node_substr``, in plan order. The frame
    must have been ``collect()``-ed already — otherwise the adaptive
    plan is not final and metrics are zeros."""
    out: list[dict[str, int]] = []
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        if node_substr in node.nodeName():
            mets: dict[str, int] = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                mets[kv._1()] = kv._2().value()
            out.append(mets)
    return out


def collect_with_metrics(
    df: DataFrame, node_substr: str
) -> tuple[list, list[dict[str, int]]]:
    """``collect()`` the frame, then read the matching nodes' metrics
    off ITS final executed plan (one execution, metrics guaranteed to
    describe the rows returned)."""
    rows = df.collect()
    return rows, node_metrics(df, node_substr)
