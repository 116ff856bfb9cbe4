"""Skew-resilient aggregation patterns.

At 100 TB a handful of hot keys (5 event types, a few boilerplate terms)
concentrate a naive shuffle onto a few reducers. Two standard rewrites,
both oracle-checked (the rewrite is internal — results are identical):

- **Two-stage distinct**: COUNT(DISTINCT x) per hot key → first group by
  (key, x) (the x dimension spreads the hot key across all reducers),
  then count per key. Avoids both the single hot reducer and Catalyst's
  expand-based distinct-agg plan.
- **Salted heavy-hitter count**: global term counts → group by
  (term, salt) partial counts, then merge per term. The salt column
  splits a hot term's rows across ``n_salts`` reducers; the merge input
  is at most ``n_salts`` rows per term.

AQE's skew-join splitting handles *join* skew automatically; these
rewrites cover *aggregation* skew, which AQE does not rebalance when the
key itself is hot. Salting uses the portable hash of the row id —
deterministic, no rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.functions.hashing import hash64
from flu_data_pipeline_spark.operators.dedup import tokenize
from flu_data_pipeline_spark.plans.registry import register

N_SALTS = 16


@register(
    "skew_twostage_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="Skew-safe COUNT(DISTINCT): 5 hot event types would funnel a "
    "naive distinct-agg into 5 reducers; grouping by (event_type, "
    "user_id) first spreads each hot type across the cluster, the "
    "per-type merge then counts tiny pre-aggregated rows. Result "
    "identical to the naive plan (oracle-checked).",
    tags=("skew", "A8"),
)
def skew_twostage_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stage1 = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
    )
    return stage1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
        F.round(F.sum("s"), 2).alias("sum_value"),
    )


@register(
    "skew_salted_term_counts",
    oracle="""
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
          FROM documents)
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
    doc=f"Salted heavy-hitter counts: global top-20 terms. Stage 1 groups "
    f"by (term, salt%{N_SALTS}) so a boilerplate term's rows split across "
    f"{N_SALTS} reducers; stage 2 merges ≤{N_SALTS} partial counts per "
    "term, then TakeOrderedAndProject. Deterministic salt = portable "
    "hash of doc_id. Identical result to the unsalted plan.",
    tags=("skew", "text"),
)
def skew_salted_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        (hash64(F.col("doc_id").cast("string")) % N_SALTS).alias("salt"),
        F.explode(tokenize(F.col("text"))).alias("term"),
    )
    partial = terms.groupBy("term", "salt").agg(F.count(F.lit(1)).alias("pn"))
    return (
        partial.groupBy("term")
        .agg(F.sum("pn").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )
