"""Temporal join operators: as-of join (point-in-time correctness).

The reference has only equi-joins (SURVEY.md §2.3); an as-of join — for
each left row, the most recent right row at-or-before its timestamp with
matching keys — is the standard time-series extension (market data,
feature stores, point-in-time training joins).

Design (100 TB-minded): the naive formulation (non-equi theta join +
argmax) explodes to a range join; Spark would plan a cartesian-per-key.
Instead: **union both sides, one window over (keys, time), last non-null
carry-forward, keep left rows** — a single hash shuffle on the join keys,
linear work per partition, no pairwise blow-up. This is the merge-scan
as-of algorithm expressed declaratively; Catalyst plans exactly one
Exchange + one Window sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: attach, to every ``left`` row, ``right_cols`` from the
    most recent ``right`` row with equal ``keys`` and
    ``right_ts <= left_ts`` (ties on the timestamp match — the right row
    sorts first).

    Returns all ``left`` columns plus ``right_cols`` (null when no right
    row precedes) and ``asof_lag`` (left_ts − matched right_ts, null when
    unmatched).

    ``tolerance``: max allowed ``asof_lag`` (same unit as the ts columns);
    matches farther back are nulled — pandas ``merge_asof(tolerance=...)``
    semantics.

    Right-side rows that share an exact (keys, right_ts) are an ambiguous
    match by definition; pre-dedup the right side (e.g. keep-last by a
    deterministic rule) if the input can contain such ties.
    """
    keys = list(keys)
    right_struct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        right_struct.alias("__r"),
    )
    rtype = r.schema["__r"].dataType
    left_cols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    # align schemas: right side carries nulls for left-only columns
    for c in left_cols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*left_cols, "__t", "__is_left", "__r")
    l = l.select(*left_cols, "__t", "__is_left", "__r")

    # right (0) sorts before left (1) at equal __t → ts-equal rows match
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__is_left") == 1)
    lag: Column = F.col("__t") - F.col("__match.__rts")
    if tolerance is not None:
        out = out.withColumn(
            "__match",
            F.when(lag <= tolerance, F.col("__match")),
        )
        lag = F.col("__t") - F.col("__match.__rts")
    return out.select(
        *left_cols,
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
        lag.alias("asof_lag"),
    )
