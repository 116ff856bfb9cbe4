"""Table catalog: register the driver's parquet tables as temp views.

The driver test data (TESTDATA.md) is a TPC-H-ish star schema plus
``events`` (event stream), ``documents`` (text corpus) and ``embeddings``
(vector table). All queries in :mod:`flu_data_pipeline_spark.plans` load
through here so the scan layer is a single choke point (one place to switch
to bucketed tables / a real metastore at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.session import ensure_session_defaults

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Column pruning / predicate pushdown happen at
    this scan when callers ``select``/``filter`` downstream (Catalyst pushes
    through — verify with ``.explain``: ``PushedFilters`` / ``ReadSchema``).

    ``events.ts`` arrives in whatever flavor the test-data generator used:
    parquet TIMESTAMP(NANOS) reads as long ns-since-epoch under
    ``spark.sql.legacy.parquet.nanosAsLong`` (converted here to a µs
    timestamp via integer division — ns→µs truncation, sub-µs digits are
    never projected by engine queries); parquet TIMESTAMP(MICROS,
    isAdjustedToUTC=false) reads natively as TIMESTAMP_NTZ and is cast to
    TIMESTAMP here. Under the engine's pinned UTC session timezone the
    cast re-labels the same wall-clock micros as a UTC instant, so both
    flavors land on the identical TIMESTAMP value and every downstream
    query (unix_micros, window ranges, date_trunc) sees ONE schema.

    Runtime confs are (re)applied here so a stock, externally-built
    session gets the same read behavior (nanosAsLong + UTC tz are
    runtime-settable and must be on before the read is analyzed)."""
    ensure_session_defaults(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.typeName() == "long":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and f.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view named after itself, so SQL
    plans (``spark.sql``) and DataFrame plans share one catalog."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
