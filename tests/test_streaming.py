"""Structured Streaming: windowed rollup equals its batch twin; foreachBatch
idempotent sink survives replays."""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.streaming.ingest import (
    read_event_stream,
    run_rollup_to_memory,
    streaming_idempotent_sink,
)

from .conftest import SF_SMOKE


def pin_file_order(landing: str, *names: str) -> None:
    """FileStreamSource orders micro-batches by file modification time;
    files written back-to-back can tie at fs timestamp granularity and
    process out of order (observed as suite-load flakiness). Pin strictly
    increasing mtimes so batch order matches write order."""
    base = int(time.time()) - 100
    for i, name in enumerate(names):
        os.utime(os.path.join(landing, name), (base + i * 10, base + i * 10))


def _dump_events_jsonl(spark, tmp_path, n=2000):
    """Write sf0.001 events as a json-lines landing dir."""
    ev = load_table(spark, SF_SMOKE, "events").limit(n)
    landing = str(tmp_path / "landing")
    os.makedirs(landing, exist_ok=True)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).collect()
    with open(os.path.join(landing, "part-0.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    return landing, ev


def test_streaming_rollup_matches_batch(spark, tmp_path):
    landing, ev = _dump_events_jsonl(spark, tmp_path)
    q = run_rollup_to_memory(spark, landing, "t_stream_rollup")
    q.awaitTermination(120)
    got = {
        (str(r["hour_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_stream_rollup").collect()
    }
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    )
    expected = {(str(r["hour_start"]), r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == expected


def test_streaming_idempotent_sink(spark, tmp_path):
    landing, ev = _dump_events_jsonl(spark, tmp_path, n=500)
    target = str(tmp_path / "events_target")
    chk = str(tmp_path / "chk")
    stream = read_event_stream(spark, landing)
    q = streaming_idempotent_sink(stream, target, ("event_id",), chk)
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == 500
    # replay the same landing data through a FRESH checkpoint: the
    # anti-join layer (not checkpoint offsets) must keep the target stable
    q2 = streaming_idempotent_sink(
        read_event_stream(spark, landing), target, ("event_id",), str(tmp_path / "chk2")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(target).count() == 500


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Emitted (watermark-closed) streaming sessions must equal the batch
    session_window result for the same data; only the per-user tail
    session may be withheld in state."""
    from flu_data_pipeline_spark.streaming.ingest import run_sessionize_to_memory

    landing, ev = _dump_events_jsonl(spark, tmp_path, n=1500)
    q = run_sessionize_to_memory(spark, landing, "t_stream_sessions")
    q.awaitTermination(120)
    streamed = {
        (str(r["session_start"]), r["user_id"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_stream_sessions").collect()
    }
    batch = (
        ev.select(
            "user_id", "value",
            F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts"),
        )
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id", "n_events", "sum_value",
        )
        .collect()
    )
    expected = {
        (str(r["session_start"]), r["user_id"]): (r["n_events"], r["sum_value"])
        for r in batch
    }
    assert len(streamed) > 0, "no sessions emitted - watermark never closed any"
    for key, val in streamed.items():
        assert expected.get(key) == val, f"session {key}: stream={val} batch={expected.get(key)}"
    withheld = set(expected) - set(streamed)
    # anything withheld must be a tail session (one per user at most)
    users = [u for (_, u) in withheld]
    assert len(users) == len(set(users)), "non-tail sessions withheld"


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (purchases x clicks, same user, click
    within 1h before) equals the batch join, including pairs whose sides
    land in different micro-batches."""
    import json

    from flu_data_pipeline_spark.streaming.ingest import (
        read_event_stream,
        streaming_purchase_click_join,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(3000)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).collect()
    rows.sort(key=lambda r: r.ts)  # time-split so pairs straddle batches
    landing = str(tmp_path / "ssj")
    os.makedirs(landing, exist_ok=True)
    third = len(rows) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third] if i < 2 else rows[2 * third :]
        with open(os.path.join(landing, f"part-{i}.json"), "w") as f:
            for r in chunk:
                f.write(json.dumps(r.asDict()) + "\n")

    joined = streaming_purchase_click_join(read_event_stream(spark, landing))
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["purchase_id"], r["click_id"]) for r in spark.table("t_ssj").collect()
    }

    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    batch = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert len(batch) > 0
    assert streamed == batch


def test_apply_in_pandas_with_state_running_stats(spark, tmp_path):
    """Custom stateful op: per-user running stats accumulate across
    micro-batches; the latest emitted row per user equals batch
    count/sum."""
    import json

    from flu_data_pipeline_spark.streaming.ingest import (
        EVENTS_STREAM_SCHEMA,
        streaming_running_stats,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(2000)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).collect()
    rows.sort(key=lambda r: r.ts)
    landing = str(tmp_path / "state")
    os.makedirs(landing, exist_ok=True)
    half = len(rows) // 2
    for i, part in enumerate((rows[:half], rows[half:])):
        with open(os.path.join(landing, f"p{i}.json"), "w") as f:
            for r in part:
                f.write(json.dumps(r.asDict()) + "\n")
    pin_file_order(landing, "p0.json", "p1.json")

    # one file per trigger: without this, availableNow folds every file
    # into a single micro-batch and state never crosses a batch boundary
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    out = streaming_running_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # running counts are monotone: the max per user is the final state
    emitted = {}
    per_user = {}
    for r in spark.table("t_running").collect():
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
        cur = emitted.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            emitted[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    # state must actually cross batches: most users get >1 update row
    assert sum(1 for v in per_user.values() if len(v) > 1) > 0
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("s"))
        .collect()
    }
    assert emitted == batch


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicates arriving in DIFFERENT micro-batches are dropped while
    their keys are inside the watermark horizon."""
    from flu_data_pipeline_spark.streaming.ingest import (
        EVENTS_STREAM_SCHEMA,
        streaming_dedup,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(400)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).collect()
    landing = str(tmp_path / "dedup")
    os.makedirs(landing, exist_ok=True)
    # file 0: all rows; file 1: the same first 200 rows again (replay)
    with open(os.path.join(landing, "p0.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    with open(os.path.join(landing, "p1.json"), "w") as f:
        for r in rows[:200]:
            f.write(json.dumps(r.asDict()) + "\n")
    pin_file_order(landing, "p0.json", "p1.json")

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    q = (
        streaming_dedup(stream, watermark="30 days")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [r["event_id"] for r in spark.table("t_dedup").collect()]
    assert len(got) == len(set(got)) == 400


def test_streaming_static_enrich(spark, tmp_path):
    """Stream-static left join enriches every event; unmatched types get
    null category (no state, no watermark required)."""
    from flu_data_pipeline_spark.streaming.ingest import streaming_static_enrich

    landing, ev = _dump_events_jsonl(spark, tmp_path, n=600)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        ["event_type", "category"],
    )
    q = (
        streaming_static_enrich(read_event_stream(spark, landing), dim)
        .writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_enrich")
    assert got.count() == 600
    cats = {
        (r["event_type"], r["category"]) for r in got.select("event_type", "category").distinct().collect()
    }
    assert ("click", "engagement") in cats and ("purchase", "revenue") in cats
    # unmatched types survive with null category (left join semantics)
    assert all(c is None for t, c in cats if t in ("signup", "error"))


def test_watermark_drops_late_rows(spark, tmp_path):
    """Rows arriving behind the watermark for an already-closed window are
    DROPPED from the aggregation (late-data policy), while in-horizon
    rows still merge."""
    from flu_data_pipeline_spark.streaming.ingest import (
        EVENTS_STREAM_SCHEMA,
        streaming_hourly_rollup,
    )

    def row(eid, ts, et="view", val=1.0):
        return {"event_id": eid, "ts": ts, "user_id": 1,
                "event_type": et, "value": val, "props": "{}"}

    landing = str(tmp_path / "late")
    os.makedirs(landing, exist_ok=True)
    # batch 0: two rows in hour 10:00
    with open(os.path.join(landing, "p0.json"), "w") as f:
        f.write(json.dumps(row(1, "2024-01-01T10:00:00.000Z")) + "\n")
        f.write(json.dumps(row(2, "2024-01-01T10:30:00.000Z")) + "\n")
    # batch 1: advance event time far ahead -> watermark = 20:00 - 2h = 18:00
    with open(os.path.join(landing, "p1.json"), "w") as f:
        f.write(json.dumps(row(3, "2024-01-01T20:00:00.000Z")) + "\n")
    # batch 2: keep event time high. The late-record filter evaluates
    # against the watermark as of the PREVIOUS batch's commit (observed:
    # a late row landing in the batch right after the advance can still
    # merge while the window state is being evicted), so the advance must
    # be fully committed one batch before the late row arrives.
    with open(os.path.join(landing, "p2.json"), "w") as f:
        f.write(json.dumps(row(6, "2024-01-01T20:30:00.000Z")) + "\n")
    # batch 3: a LATE row for the long-closed 10:00 window (behind the
    # >=18:00 watermark -> must be dropped) plus an in-horizon 19:00 row
    with open(os.path.join(landing, "p3.json"), "w") as f:
        f.write(json.dumps(row(4, "2024-01-01T10:45:00.000Z")) + "\n")
        f.write(json.dumps(row(5, "2024-01-01T19:00:00.000Z")) + "\n")

    # late row must not process before the watermark-advancing files
    pin_file_order(landing, "p0.json", "p1.json", "p2.json", "p3.json")

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    q = (
        streaming_hourly_rollup(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish within 180s"
    got = {
        str(r["hour_start"]): r["n_events"]
        for r in spark.table("t_late").collect()
    }
    # the 10:00 window closed with ONLY the two on-time rows; the late
    # event_id=4 was dropped, not merged and not re-emitted
    assert got.get("2024-01-01 10:00:00") == 2, got


def test_streaming_checkpoint_restart_exactly_once(spark, tmp_path):
    """Restart-from-the-SAME-checkpoint recovery: a stopped stream resumed
    with its checkpoint must process only files that arrived while it was
    down — no reprocessing (dupes) of already-committed batches and no
    loss. This is the offsets-based exactly-once layer, complementary to
    test_streaming_idempotent_sink's content-based anti-join layer (which
    deliberately uses FRESH checkpoints)."""
    landing, ev = _dump_events_jsonl(spark, tmp_path, n=400)
    os.rename(
        os.path.join(landing, "part-0.json"), os.path.join(landing, "part-a.json")
    )
    target = str(tmp_path / "restart_target")
    chk = str(tmp_path / "restart_chk")

    def run_once():
        q = (
            read_event_stream(spark, landing)
            .writeStream.format("parquet")
            .option("path", target)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(target).count() == 400

    # new data lands while the stream is down; second batch of 300 rows
    seen = set()
    with open(os.path.join(landing, "part-a.json")) as f:
        for line in f:
            seen.add(json.loads(line)["event_id"])
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .orderBy(F.desc("event_id"))
        .limit(300)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .collect()
    )
    rows = [r for r in rows if r["event_id"] not in seen]
    assert rows, "second batch must be non-empty and disjoint from batch a"
    with open(os.path.join(landing, "part-b.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    pin_file_order(landing, "part-a.json", "part-b.json")

    run_once()
    out = spark.read.parquet(target)
    # 400 committed + the new batch, and NOT 400 + 400 + new (no replay)
    assert out.count() == 400 + len(rows)
    # every event_id exactly once: offsets prevented any re-ingest
    assert out.select("event_id").distinct().count() == out.count()


def test_burst_session_window_gap_boundary(spark, tmp_path):
    """The stream_burst_collapse_exact equivalence hinges on gap = 5 s
    session windows reproducing the batch rule 'same burst while
    consecutive second-floored events are <= 5 s apart' — session
    windows merge an event landing exactly ON the previous session's
    end (diff == gap), so gap equals the batch threshold, not
    threshold + 1. The sf fixture only has singleton bursts, so pin
    the boundary on constructed data: 5 s gaps MERGE, 6 s SPLIT."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # user A: 0s, 5s, 10s  -> one burst of 3 (5 s gaps merge)
    # user B: 0s, 6s       -> two bursts of 1 (6 s gap splits)
    # user C: 0s, 5s, 11s  -> burst of 2 then burst of 1
    rows = [
        ("a", base), ("a", base + dt.timedelta(seconds=5)),
        ("a", base + dt.timedelta(seconds=10)),
        ("b", base), ("b", base + dt.timedelta(seconds=6)),
        ("c", base), ("c", base + dt.timedelta(seconds=5)),
        ("c", base + dt.timedelta(seconds=11)),
    ]
    landing = str(tmp_path / "bursts")
    spark.createDataFrame(rows, "user_id string, ts timestamp").write.parquet(
        landing
    )
    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .parquet(landing)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "5 seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("burst_size"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_burst_boundary")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["burst_size"])
        for r in spark.table("t_burst_boundary").collect()
    )
    assert got == [("a", 3), ("b", 1), ("b", 1), ("c", 1), ("c", 2)]


def test_transform_with_state_running_stats(spark, tmp_path):
    """Typed-state twin of the applyInPandasWithState test on the modern
    transformWithStateInPandas API. The JVM<->Python state protocol
    speaks protobuf, which this container does not ship — skip cleanly
    there; the operator itself is import-safe everywhere."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState driver worker requires protobuf",
    )
    import json

    from flu_data_pipeline_spark.streaming.ingest import (
        EVENTS_STREAM_SCHEMA,
        streaming_running_stats_tws,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(1000)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).collect()
    rows.sort(key=lambda r: r.ts)
    landing = str(tmp_path / "tws")
    os.makedirs(landing, exist_ok=True)
    half = len(rows) // 2
    for i, part in enumerate((rows[:half], rows[half:])):
        with open(os.path.join(landing, f"p{i}.json"), "w") as f:
            for r in part:
                f.write(json.dumps(r.asDict()) + "\n")
    pin_file_order(landing, "p0.json", "p1.json")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(landing)
        )
        out = streaming_running_stats_tws(stream.select("user_id", "value"))
        q = (
            out.writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        final = {}
        for r in spark.table("t_tws").collect():
            cur = final.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                final[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
        batch = {
            r["user_id"]: (r["n"], round(r["s"], 6))
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce("value", F.lit(0.0))).alias("s"),
            )
            .collect()
        }
        assert final == batch
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
