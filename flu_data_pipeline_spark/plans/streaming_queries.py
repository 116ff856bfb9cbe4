"""Oracle-checked Structured Streaming queries.

The rest of the streaming surface (:mod:`flu_data_pipeline_spark.streaming`)
is verified by runtime pytest (watermark drops, session windows, stateful
stats) because those behaviors are about *when* rows emit. This module
registers the cases where the streaming computation, driven to completion
with ``trigger(availableNow=True)``, must equal its batch twin exactly —
so Structured Streaming itself gets a hash-compared CORRECTNESS row, not
just a rows-only check.

Replayability contract (what makes an exact oracle possible):
- ``availableNow`` processes every file currently present, then stops —
  the stream result is a pure function of the input files;
- ``complete`` output mode emits ALL windows, including ones the
  watermark hasn't closed (append mode would truncate the tail hour);
- streaming aggregations can't do COUNT(DISTINCT) (state would be
  unbounded per group), so the rollup carries count + sum only — the
  batch twin ``events_hourly_rollup`` keeps the distinct-users column.

Scale notes (100 TB): the same pipeline pointed at a landing bucket with
a real trigger is incremental — per micro-batch work is new-files only,
state = open windows x event types (bounded by the watermark horizon),
and the memory sink becomes a parquet/foreachBatch sink. The parquet
nanos ts is declared LongType in the stream schema (nanosAsLong read
path) and converted exactly like catalog.load_table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flu_data_pipeline_spark.plans.registry import register

#: events.parquet schema under nanosAsLong (ts = ns-since-epoch long)
_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


@register(
    "stream_hourly_rollup_exact",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling 1h rollup driven to completion: "
    "readStream(parquet) -> withWatermark -> window(ts, '1 hour') -> "
    "count/sum per event_type, memory sink, availableNow trigger, "
    "complete mode. The emitted table is hash-compared against the "
    "batch SQL — proving the streaming engine's event-time windowing "
    "computes exactly the batch answer on a replayed input (the "
    "streaming analogue of events_hourly_rollup, minus COUNT(DISTINCT) "
    "which streaming state rightly refuses).",
    tags=("streaming", "A7", "S3"),
)
def stream_hourly_rollup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file stream source wants a directory; pin the listing to the
    # events file (the other tables' schemas differ)
    stream = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = stream.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = "stream_hourly_rollup_exact_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
