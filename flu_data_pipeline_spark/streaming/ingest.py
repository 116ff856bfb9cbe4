"""Structured Streaming ingest (extension — SURVEY §2.9: the reference is
pure daily batch; this upgrades its idempotent daily refresh to continuous).

Two pieces:

- :func:`streaming_hourly_rollup`: the event-time windowed aggregation —
  the streaming twin of the batch ``events_hourly_rollup`` query. Watermark
  bounds state (late rows beyond the horizon are dropped), tumbling window
  + append mode emit finalized windows only.
- :func:`streaming_idempotent_sink`: landing-dir stream → ``foreachBatch``
  anti-join append, i.e. the continuous version of the reference's
  ``ON CONFLICT DO NOTHING`` load (flu_data_airflow_v2.py:598-733).

At scale: the stateful agg shuffles on (window, key) like its batch twin;
state store size = windows-in-watermark x key cardinality. foreachBatch
keeps exactly-once per micro-batch through the anti-join (duplicates across
retries land on existing PKs and are dropped).

Custom state: ``applyInPandasWithState`` (streaming_running_stats) is the
supported arbitrary-state path here. Spark 4's successor API
(``transformWithStateInPandas`` — typed value/list/map state, timers,
RocksDB-backed) is the right upgrade on a real cluster, but its Python
state server requires ``google.protobuf``, which this environment does
not ship (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE on
import), so the engine deliberately stays on the v1 API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a landing directory (json-lines), schema
    pinned — the streaming analogue of the reference's daily re-download."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).json(landing_dir)


def streaming_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h event-time window: count + sum per (window, event_type).
    Append output mode emits a window once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
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


def run_rollup_to_memory(
    spark: SparkSession, landing_dir: str, table_name: str = "stream_rollup"
) -> StreamingQuery:
    """Drive the rollup once over everything currently in the landing dir
    (availableNow trigger) into an in-memory sink; used by tests and as the
    local smoke path. ``complete`` mode so unclosed windows are visible."""
    events = read_event_stream(spark, landing_dir)
    agg = streaming_hourly_rollup(events)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def streaming_idempotent_sink(
    stream: DataFrame,
    target_path: str,
    pk_cols: tuple[str, ...],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Continuous ON-CONFLICT-DO-NOTHING: every micro-batch is anti-joined
    against the target before append (exactly-once across retries)."""
    from flu_data_pipeline_spark.sources.writers import idempotent_append

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        idempotent_append(batch_df.sparkSession, batch_df, target_path, pk_cols)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "0 seconds"
) -> DataFrame:
    """Stateful streaming sessionization via native session windows: the
    state store merges/extends per-user sessions as micro-batches arrive
    and emits a session once the watermark passes its close (last event +
    gap). Streaming twin of the batch ``events_session_window`` /
    ``events_sessionize`` queries — same gap semantics (split when
    inter-event gap > 30 min).

    State size = open sessions x user cardinality, bounded by the
    watermark horizon — this is the scale path for continuous
    sessionization (no per-key Python state loop; the state store is
    JVM-side and incremental)."""
    floored = events.select(
        "user_id", "value", F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts")
    )
    return (
        floored.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_sessionize_to_memory(
    spark: SparkSession, landing_dir: str, table_name: str = "stream_sessions"
) -> StreamingQuery:
    """Drive streaming sessionization over the landing dir (availableNow).
    Append mode: only sessions closed by the watermark are emitted — the
    per-user tail session (still extendable) correctly stays in state."""
    events = read_event_stream(spark, landing_dir)
    sessions = streaming_sessionize(events)
    return (
        sessions.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_purchase_click_join(
    events: DataFrame, watermark: str = "0 seconds"
) -> DataFrame:
    """Stream-stream inner join with an event-time interval bound: each
    purchase joins clicks by the same user within the preceding hour.
    Both sides carry watermarks so the join state (buffered unmatched
    rows) is bounded — without the time constraint a stream-stream join
    would buffer forever. Matches emit as soon as both sides arrive
    (inner join doesn't wait for the watermark); state for rows older
    than watermark + interval is evicted.

    Batch twin: the same join expressed over the static events table —
    the test asserts identical results including matches whose two sides
    arrive in different micro-batches."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id", "p_user")


RUNNING_STATS_SCHEMA = "user_id long, n_events long, total_value double"
_RUNNING_STATE_SCHEMA = "n long, total double"


def streaming_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (event count, value total), state carried across micro-batches
    in the state store, one updated row emitted per user per batch.

    This is the escape hatch for stateful logic the built-in windowed/
    session aggregations can't express (model-state updates, CUSUM
    detectors, per-key rate limiters): arbitrary Python against a typed
    GroupState, Arrow-batched per key group — never per row. Built-ins
    (session_window, windowed aggs) remain the first choice; this
    operator exists to prove the custom-state path end to end.

    Output mode must be ``update``; the latest row per user equals the
    batch groupBy count/sum (asserted in tests)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per ``event_id`` and
    evicts seen-keys state once the watermark passes — duplicates arriving
    within the watermark horizon are dropped even across micro-batches.

    This is the streaming twin of the batch exact-dedup query
    (``dedup_exact``): at scale the seen-key state is (key, ts) only —
    never payloads — and its size is bounded by arrival rate x horizon,
    the property that makes continuous dedup feasible where an unbounded
    ``dropDuplicates`` would grow state forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch broadcast-joins the static
    dimension (re-read per batch, so slowly-changing dims pick up updates).
    No watermark or join state needed — the static side is not streaming
    state, which is why dimension enrichment should be expressed this way
    rather than as a stream-stream join."""
    return events.join(F.broadcast(dim), "event_type", "left").select(
        "event_id", "user_id", "event_type", "category", "value"
    )


TWS_STATS_SCHEMA = "user_id long, n_events long, total_value double"


def streaming_running_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, value total) on the MODERN typed-state API
    (``transformWithStateInPandas``, Spark 4.x): a ``StatefulProcessor``
    with a typed ValueState replaces ``applyInPandasWithState``'s
    positional GroupState tuple. Same semantics as
    :func:`streaming_running_stats` — one updated row per user per
    micro-batch, state carried in the state store — but with the API that
    also offers ListState/MapState, state TTL, and timers for eviction
    logic, which is where per-key rate limiters and CUSUM detectors go
    at scale. Kept alongside the legacy-API twin so both stateful
    surfaces stay exercised.

    Runtime dependency: the transformWithState protocol speaks protobuf
    between the JVM and a Python driver worker; on hosts without the
    ``protobuf`` package the stream fails at initialization
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The runtime test
    skips in that case; the legacy applyInPandasWithState twin above has
    no such dependency and is the one exercised everywhere."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=TWS_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
