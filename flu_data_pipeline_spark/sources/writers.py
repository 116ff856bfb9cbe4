"""Sinks (SURVEY §2.1 S4-S7): parquet tables, CSV interchange, and the
idempotent upsert-ignore load.

The reference's load path is staging-COPY + ``INSERT ... ON CONFLICT
(<pk>) DO NOTHING`` per table (flu_data_airflow_v2.py:589-733). The
capability — append only genuinely-new primary keys, safely re-runnable —
maps to a left **anti-join** against the existing table followed by an
append write. At 100 TB the anti-join shuffles only the PK columns of the
increment vs the target's PK projection (column-pruned scan), and the
partitioned layout confines rewrites to touched partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flu_data_pipeline_spark.schemas import PRIMARY_KEYS


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Parquet table write (S5/S7 DDL+load collapse into one lazy write).
    Facts should pass ``partition_by`` (e.g. season / epiweek prefix) so
    downstream queries get static + dynamic partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV interchange sink (S4) — kept only where interchange parity
    matters; parquet is the at-rest format."""
    df.write.mode(mode).option("header", True).csv(path)


def idempotent_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    pk_cols: tuple[str, ...],
) -> int:
    """``ON CONFLICT DO NOTHING`` semantics (S6): append rows whose PK is
    absent from the existing table; re-running with the same input is a
    no-op. Returns the number of rows appended.

    Within-batch duplicates are also collapsed to one row per PK (the
    staging COPY + PK constraint did the same in the reference).
    """
    deduped = df.dropDuplicates(list(pk_cols))
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*pk_cols)
        new_rows = deduped.join(existing, list(pk_cols), "left_anti")
    else:
        new_rows = deduped
    # the anti-join plan is consumed twice (count + write): cache the small
    # increment, not the big target
    new_rows = new_rows.cache()
    try:
        n = new_rows.count()
        if n > 0:
            new_rows.write.mode("append").parquet(path)
    finally:
        new_rows.unpersist()
    return n


def validate_primary_key(df: DataFrame, table: str) -> int:
    """PK-constraint check (the reference's DDL guarantee, S7): number of
    duplicated PK tuples — must be 0."""
    pk = list(PRIMARY_KEYS[table])
    return (
        df.groupBy(*pk).count().filter("count > 1").count()
    )


def validate_foreign_key(child: DataFrame, parent: DataFrame, key: str) -> int:
    """FK orphan check: child keys missing from the parent — must be 0."""
    return (
        child.select(key)
        .filter(f"{key} IS NOT NULL")
        .distinct()
        .join(parent.select(key).distinct(), [key], "left_anti")
        .count()
    )
