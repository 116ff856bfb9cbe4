"""SparkSession factory.

Defaults are chosen for correctness-parity with the DuckDB oracle (UTC
session timezone, ANSI off so casts return null on junk — mirroring the
reference's try/except cleaner at flu_data_airflow_v2.py:142-154) and for
scale (AQE, skew-join handling, partition coalescing). On a real cluster the
same config applies; only ``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "flu_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on: runtime coalescing of post-shuffle partitions, skew-join
      splitting, and dynamic join-strategy switching — the knobs that make a
      fixed plan survive a 100x scale-up.
    - ``spark.sql.session.timeZone=UTC``: pins date/timestamp semantics so
      results hash-match oracles regardless of host TZ.
    - ANSI mode off: ``CAST('junk' AS DOUBLE)`` yields null (reference
      semantics for its percent cleaner) instead of raising.
    - Arrow enabled: fast createDataFrame/toPandas and pandas UDFs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # parquet TIMESTAMP(NANOS) (events.ts) is otherwise unreadable:
        # read as long ns-since-epoch; catalog.load_table converts to
        # timestamp (integer div by 1000 — no double round-trip).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Broadcast only truly small build sides. A fat threshold forces
        # fact-sized tables through a serial driver-side broadcast build —
        # measurably slower than a parallel shuffle join even at sf0.1 —
        # and would OOM the driver outright at cluster scale. Known-small
        # dims are broadcast explicitly (F.broadcast) in the plans; AQE's
        # runtime join re-selection can still upgrade a shuffle join whose
        # post-filter build side turns out tiny.
        .config("spark.sql.autoBroadcastJoinThreshold", str(2 * 1024 * 1024))
        # InferFiltersFromGenerate synthesizes size(<explode input>)>0 /
        # isnotnull filters; predicate pushdown then substitutes the FULL
        # generator expression and pushes it below repartitions to the
        # scan — for HOF-heavy explode inputs (shingle/hash pipelines)
        # that re-evaluates the whole chain a second time, serially on
        # the scan's partitioning (measured 17x slowdown at sf0.1). Our
        # explode inputs are never mostly-empty, so the rule only hurts.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
