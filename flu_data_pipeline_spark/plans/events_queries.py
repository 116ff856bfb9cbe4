"""Event-stream queries (batch form of the streaming surface).

The reference has no streaming operators (SURVEY.md §2.9) — these extend the
engine with event-time windowed aggregation over the ``events`` table. The
same logical plan runs under Structured Streaming
(:mod:`flu_data_pipeline_spark.streaming`); here it is expressed in batch so
the DuckDB oracle can verify the semantics.

ns-timestamp caveat: parquet stores ``ts`` at ns precision; Spark truncates
to µs on read while DuckDB keeps ns — so queries never project raw ``ts``,
only hour/day truncations (identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling-window (1h) event-time rollup — the batch twin of the "
    "Structured Streaming windowed agg (readStream → withWatermark → "
    "window(ts, '1 hour')).",
    tags=("streaming", "A7", "A8"),
    bench=True,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "events_user_daily_top",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY day ORDER BY sum_value DESC, user_id
    ) <= 3
    """,
    doc="Per-day top-3 users by total value: groupBy + ranked window with "
    "pinned (value DESC, user_id) tie-break — distributed top-k per group.",
    tags=("A7", "O3", "W1"),
)
def events_user_daily_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    w = Window.partitionBy("day").orderBy(F.desc("sum_value"), F.asc("user_id"))
    return (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
