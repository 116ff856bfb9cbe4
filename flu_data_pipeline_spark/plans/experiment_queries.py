"""Experiment (A/B test) analysis: conversion lift with a z-statistic.

The decision layer over event telemetry: split users into variants,
compare conversion rates, and report the two-proportion z-statistic the
ship/no-ship call reads. Variant assignment is ``user_id % 2`` —
deterministic and engine-identical, standing in for the hash-based
assignment a real experiment framework derives from (user_id,
experiment_id); the production form is the same modular arithmetic over
the portable hash.

Scale notes (100 TB): per-user conversion flags are one groupBy(user)
with map-side combine (MAX of a 0/1 flag is merge-safe); the per-variant
rollup then aggregates ~users rows down to 2, and the z-test itself is
closed-form arithmetic on four numbers — the whole analysis is two
cheap aggregations, never a per-event shuffle of the raw stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


@register(
    "abtest_conversion_ztest",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS INT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events
        GROUP BY user_id
    ), per_variant AS (
        SELECT variant,
               CAST(COUNT(*) AS DOUBLE) AS n_users,
               CAST(SUM(converted) AS DOUBLE) AS n_conv
        FROM per_user GROUP BY variant
    ), wide AS (
        SELECT
            MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
            MAX(CASE WHEN variant = 0 THEN n_conv END) AS c0,
            MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
            MAX(CASE WHEN variant = 1 THEN n_conv END) AS c1
        FROM per_variant
    )
    SELECT CAST(n0 AS BIGINT) AS users_control,
           CAST(n1 AS BIGINT) AS users_treatment,
           ROUND(c0 / n0, 6) AS rate_control,
           ROUND(c1 / n1, 6) AS rate_treatment,
           ROUND(c1 / n1 - c0 / n0, 6) AS abs_lift,
           ROUND((c1 / n1 - c0 / n0)
                 / sqrt(((c0 + c1) / (n0 + n1))
                        * (1 - (c0 + c1) / (n0 + n1))
                        * (1 / n0 + 1 / n1)), 6) AS z_score
    FROM wide
    """,
    doc="Two-proportion z-test over user-level conversion (purchase "
    "events), variants split by user_id parity: per-user flags via one "
    "merge-safe groupBy (MAX of 0/1), per-variant rollup to two rows, "
    "pooled-proportion z in closed form. The experiment-analysis "
    "decision layer computed where the events live — two aggregations "
    "total, arithmetic identical on both engines.",
    tags=("stats", "experiment", "A7", "A10"),
)
def abtest_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    per_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n_users"),
        F.sum("converted").cast("double").alias("n_conv"),
    )
    wide = per_variant.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("c1"),
    )
    n0, c0 = F.col("n0"), F.col("c0")
    n1, c1 = F.col("n1"), F.col("c1")
    p_pool = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / F.sqrt(
        p_pool * (1 - p_pool) * (1 / n0 + 1 / n1)
    )
    return wide.select(
        n0.cast("bigint").alias("users_control"),
        n1.cast("bigint").alias("users_treatment"),
        F.round(c0 / n0, 6).alias("rate_control"),
        F.round(c1 / n1, 6).alias("rate_treatment"),
        F.round(c1 / n1 - c0 / n0, 6).alias("abs_lift"),
        F.round(z, 6).alias("z_score"),
    )
