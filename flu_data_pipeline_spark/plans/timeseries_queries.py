"""Time-series operators over the ``events`` stream: gap filling and
forward filling.

The reference's only time-series handling is a weekly-grain dimension
(dags/flu_data_airflow_v2.py:350-361) with *implicit* gaps (weeks missing
from RHINO simply don't exist in ``temporal``). A real analytics engine
needs the explicit versions: densify a calendar against observed data
(gap-fill) and carry the last observation forward (ffill) — both as
declarative plans, no driver-side loops.

Scale notes: the calendar is built FROM the data (one global min/max
aggregate — a few bytes to the driver-side plan, never collect()ed), and
the dense grid is dims × days, which stays tiny relative to the fact
table; the grid side of the left join broadcasts. Forward fill is a
single partitioned window — one shuffle by entity key, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


@register(
    "ts_gapfill_daily",
    oracle="""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type FROM events
    ), bounds AS (
        SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
    ), days AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM ev
    ), counts AS (
        SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2
    )
    SELECT t.event_type, d.day,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM types t
    CROSS JOIN days d
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
    """,
    doc="Calendar densification (gap-fill): every (event_type, day) cell "
    "over the observed date span, zero-filled where no events occurred. "
    "The day spine comes from sequence() over the data's own min/max — "
    "fully declarative; the spine × type grid is tiny and broadcasts "
    "into the left join against the aggregated counts.",
    tags=("timeseries", "gapfill"),
)
def ts_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type"
    )
    counts = ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    days = (
        ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(days)
    return (
        F.broadcast(grid)
        .join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0).cast("long")).alias("n_events"),
        )
    )


@register(
    "ts_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS last_purchase_value
    FROM events
    """,
    doc="Forward fill (last observation carried forward): per user, each "
    "event carries the most recent purchase value at or before it "
    "(null until the first purchase). One shuffle on user_id, then a "
    "running last(ignorenulls) window — the standard LOCF pattern "
    "without any iterative driver logic. Ordering pinned to "
    "(µs-truncated ts, event_id) on both engines because the parquet "
    "timestamps are nanosecond-precision and Spark reads them at µs.",
    tags=("timeseries", "ffill", "window"),
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 6).alias(
            "last_purchase_value"
        ),
    )
