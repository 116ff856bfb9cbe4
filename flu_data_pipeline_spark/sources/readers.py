"""Source readers (SURVEY §2.1 S1-S3, S8).

The reference pulls CSV over HTTP with pandas and a JSON REST API with
requests (flu_data_airflow_v2.py:72,219,263-278). Spark does not scan HTTP
natively, so ingestion is split the same way the reference splits it:

1. a thin driver-side fetch writes the payload to a landing directory
   (:func:`fetch_to_landing` — pluggable fetcher so tests inject bytes
   instead of a network call; the engine itself never opens sockets), then
2. a schema-pinned distributed scan reads the landing files. Schemas are
   ALWAYS explicit (never inferSchema) — inference is a correctness and
   performance hazard at 100 TB (extra pass over the data).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def fetch_to_landing(
    url: str,
    landing_dir: str,
    filename: str,
    fetcher: Callable[[str], bytes],
) -> str:
    """Driver-side fetch → landing file (S1/S2/S3 extract step). ``fetcher``
    is injected (e.g. ``lambda u: requests.get(u).content``) so the engine
    stays network-free and testable."""
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, filename)
    payload = fetcher(url)
    with open(path, "wb") as f:
        f.write(payload)
    return path


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema-pinned CSV scan (S1/S2) with an explicit malformed-record
    policy — the row-level version of the reference's tolerant value
    cleaner (flu_data_airflow_v2.py:142-154):

    - ``PERMISSIVE`` (default): unparseable fields become null; pass
      ``corrupt_col`` to additionally capture the raw offending line for
      quarantine/audit (a dead-letter column, queryable like any other).
    - ``DROPMALFORMED``: bad rows silently dropped.
    - ``FAILFAST``: first bad row aborts the scan — for feeds where
      malformation means upstream breakage, not noise.
    """
    reader_schema = schema
    if corrupt_col is not None:
        reader_schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
        )
    opts = {"mode": mode}
    if corrupt_col is not None:
        opts["columnNameOfCorruptRecord"] = corrupt_col
    return spark.read.options(**opts).csv(path, schema=reader_schema, header=header)


def read_json_records(
    spark: SparkSession, records: list[dict], schema: T.StructType
) -> DataFrame:
    """REST/JSON API source (S3): the fetched ``data['epidata']`` record
    list becomes a DataFrame with an explicit schema (no inference)."""
    return spark.createDataFrame(
        [tuple(r.get(f.name) for f in schema.fields) for r in records], schema
    )


def read_json_files(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines landing scan with pinned schema."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (format choice is a storage detail, not a capability change)."""
    return spark.read.orc(path)
