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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.functions.hashing import hash64
from flu_data_pipeline_spark.operators.dedup import tokenize
from flu_data_pipeline_spark.plans.registry import register

N_SALTS = 16

#: Salt fan-out for the replicated-dimension join below. At 100 TB pick
#: roughly (hot-key rows / target-partition rows); 8 is fixture-sized but
#: the plan shape is identical at any fan-out.
N_JOIN_SALTS = 8


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


@register(
    "skew_salted_dim_join",
    oracle="""
    WITH dim AS (
        SELECT event_type, row_number() OVER (ORDER BY event_type) AS type_code
        FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT d.type_code,
           e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.type_code, e.event_type
    ORDER BY d.type_code
    """,
    doc=f"Salted shuffle join against a hot-key dimension, REGISTERED AND "
    f"SELF-PROVING: only ~5 distinct "
    f"event types means a plain shuffle join lands ~1/5 of ALL fact rows on "
    f"one reducer. Rewrite: replicate each dim row {N_JOIN_SALTS}x (explode "
    f"over salts), salt the fact side with portable-hash(event_id) % "
    f"{N_JOIN_SALTS}, join on (event_type, salt) — every hot key spreads "
    f"over {N_JOIN_SALTS} reducers. Result identical to the unsalted join "
    "(oracle = plain join). The builder ASSERTS the physical plan contains "
    "a ShuffledHashJoin on the salted keys — if the SHUFFLE_HASH hint ever "
    "stops being honored (falls back to broadcast or sort-merge), the "
    "query raises and the correctness gate records it red; negative-tested "
    "by building the same shape unhinted (tests/test_plans.py). At 100 TB "
    "the same rewrite applies when the dim "
    "is too large to broadcast; when it is broadcastable, broadcast beats "
    "salting (no fact shuffle at all) — this entry pins the non-broadcast "
    "path. AQE skew-split covers sort-merge joins after the fact, salting "
    "works for any join strategy and bounds the skew a priori.",
    tags=("skew", "J6", "A10", "scale-proof"),
)
def skew_salted_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _salted_dim_join_frame(spark, sf_dir, hinted=True)


def _salted_dim_join_frame(
    spark: SparkSession, sf_dir: str, hinted: bool
) -> DataFrame:
    """Shared shape for skew_salted_dim_join and its negative test:
    ``hinted=False`` drops the SHUFFLE_HASH hint so the planner degrades
    to broadcast/sort-merge and the plan assertion must fire."""
    ev = load_table(spark, sf_dir, "events")
    # dim: one row per event type with a dense code (surrogate key by
    # sorted position — 5 rows, single-partition window is fine)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "type_code",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy("event_type")
            ),
        )
    )
    # replicate dim across salts; salt facts deterministically
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_JOIN_SALTS)]))
    )
    ev_salted = ev.withColumn(
        "salt", (hash64(F.col("event_id").cast("string")) % N_JOIN_SALTS)
    )
    # hint SHUFFLE_HASH so the demo exercises the shuffle path it is
    # written for — a 40-row dim would otherwise be broadcast (which at
    # this size is the better plan, but then nothing would be salted)
    rhs = dim_salted.hint("shuffle_hash") if hinted else dim_salted
    joined = ev_salted.join(rhs, ["event_type", "salt"])
    agg = (
        joined.groupBy("type_code", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("type_code")
    )
    # Living proof the salt actually rides a hash-shuffled join: the
    # plan must carry a ShuffledHashJoin on (event_type, salt). A
    # broadcast fallback would make the salt columns dead weight (no
    # fact shuffle to spread), a sort-merge fallback silently changes
    # the memory/spill profile the rewrite promises.
    plan = agg._jdf.queryExecution().executedPlan().toString()
    if "ShuffledHashJoin" not in plan:
        raise AssertionError(
            "salted dim join did not plan SHUFFLE_HASH (ShuffledHashJoin "
            "absent — broadcast or sort-merge fallback); plan:\n"
            + plan[:2000]
        )
    return agg


# --------------------------------------------------------------------------
# AQE skew-join splitting, registered and self-proving
# --------------------------------------------------------------------------

#: Probe geometry: 200k fact rows, 90% on key 0, joined to a 97-key dim.
#: Payloads are portable-hash values (md5-derived) — deliberately
#: INCOMPRESSIBLE, because AQE's skew detector compares COMPRESSED map
#: output sizes against the threshold and lz4 shrinks a repetitive hot
#: partition ~100x, hiding real skew from a small-looking threshold
#: (the round-3 lesson that killed the first salted-join negative test).
_SKEW_FACT_N = 200_000
_SKEW_KEYS = 97


def _skew_probe_frames(spark: SparkSession):
    fact = spark.range(0, _SKEW_FACT_N, 1, 8).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.col("id") % _SKEW_KEYS)
        .alias("k"),
        hash64(F.col("id").cast("string")).alias("p"),
    )
    dim = spark.range(0, _SKEW_KEYS, 1, 4).select(
        F.col("id").alias("k"),
        hash64((F.col("id") + 1_000_000).cast("string")).alias("dp"),
    )
    return fact, dim


def _assert_aqe_skew_split(spark: SparkSession) -> None:
    """Executed-probe canary for AQE's OptimizeSkewedJoin: a sort-merge
    join whose build side concentrates 90% of rows on one key must come
    back from execution with the skewed partition SPLIT — the final
    adaptive plan carries ``SortMergeJoin(skew=true)`` fed by an
    ``AQEShuffleRead`` marked ``skewed``. The rule is size-gated for
    real clusters (256 MB default threshold), so the probe temporarily
    lowers the thresholds and disables broadcast (skew splitting
    targets shuffle joins), executes, and asserts both markers. The
    ``spark.sql.adaptive.skewJoin.enabled`` master switch is
    deliberately NOT set, so the probe raises if the feature is
    disabled or regresses (negative-tested in tests/test_plans.py).
    Confs are restored in a finally."""
    probe_confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in probe_confs}
    for k, v in probe_confs.items():
        spark.conf.set(k, v)
    try:
        fact, dim = _skew_probe_frames(spark)
        # the aggregate must CONSUME the hash payloads: a count-only
        # probe lets column pruning strip them, the hot partition
        # shrinks to a run of constant keys (~KB compressed), and the
        # skew detector never fires
        j = (
            fact.join(dim, "k")
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("p") + F.col("dp")).alias("s"),
            )
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        if "skew=true" not in plan:
            raise AssertionError(
                "AQE did not split the skewed join partition "
                "(no SortMergeJoin(skew=true) in the final adaptive "
                "plan); plan:\n" + plan[:2000]
            )
        if "skewed" not in plan:
            raise AssertionError(
                "no AQEShuffleRead marked 'skewed' in the final "
                "adaptive plan; plan:\n" + plan[:2000]
            )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


_H = "CAST('0x' || substr(md5(CAST({e} AS VARCHAR)), 1, 14) AS BIGINT)"


@register(
    "aqe_skew_join_split",
    oracle=f"""
    WITH fact AS (
        SELECT CASE WHEN i % 10 < 9 THEN 0 ELSE i % {_SKEW_KEYS} END AS k,
               {_H.format(e='i')} AS p
        FROM (SELECT unnest(range(0, {_SKEW_FACT_N})) AS i)
    ), dim AS (
        SELECT i AS k, {_H.format(e='i + 1000000')} AS dp
        FROM (SELECT unnest(range(0, {_SKEW_KEYS})) AS i)
    )
    SELECT f.k,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(f.p % 1000 + d.dp % 1000) AS BIGINT) AS checksum
    FROM fact f JOIN dim d USING (k)
    GROUP BY f.k
    ORDER BY f.k
    """,
    doc="AQE skew-join splitting, REGISTERED AND SELF-PROVING: per-key "
    "row counts and a portable-hash checksum over a fact←dim join "
    "whose fact side puts 90% of rows on ONE key — the hot-key join "
    "shape that strands a 1000-executor cluster behind a single "
    "straggler reducer. Spark's OptimizeSkewedJoin splits the "
    "oversized partition into advisory-sized slices at runtime "
    "(duplicating the matching dim rows), the engine-native sibling "
    "of the manual salt twin skew_salted_dim_join; because the split "
    "only exists in the final adaptive plan (post-execution), the "
    "builder proves it on an executed probe of the identical shape "
    "with the size gates temporarily lowered "
    "(_assert_aqe_skew_split, conf-restored in a finally, memoized "
    "per session/conf-state) — the same executed-probe style as "
    "runtime_bloom_filter_join. Probe payloads are md5-derived "
    "(incompressible) because the skew detector measures COMPRESSED "
    "map output — repetitive payloads compress ~100x and hide real "
    "skew from the threshold. Raises, and goes red in the "
    "correctness gate, if the rule stops splitting; negative-tested "
    "with spark.sql.adaptive.skewJoin.enabled=false. Returned values "
    "are conf-independent exact integers (portable 56-bit hash, "
    "identical on both engines).",
    tags=("skew", "layout", "J6", "A10", "scale-proof"),
    bench=True,
)
def aqe_skew_join_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flu_data_pipeline_spark.plans.layout_queries import _probe_once

    _probe_once(
        spark,
        "aqeSkewJoinSplit",
        (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
        ),
        lambda: _assert_aqe_skew_split(spark),
    )
    fact, dim = _skew_probe_frames(spark)
    return (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("p") % 1000 + F.col("dp") % 1000)
            .cast("bigint")
            .alias("checksum"),
        )
        .orderBy("k")
    )


def _assert_aqe_coalesce(spark: SparkSession) -> None:
    """Executed-probe canary for AQE partition coalescing: a grouped
    aggregate whose map outputs are bytes-tiny must come back with its
    shuffle read COALESCED below the static partition count — the
    optimization that keeps a 1000-executor cluster from scheduling
    thousands of near-empty reducers on small intermediate results.
    (Its failure mode is the inverse lesson: pair joins tiny in bytes
    but quadratic in pairs must PIN their parallelism — see the
    dedup_semdedup repartition fix in SCALING.md's Catches.) The
    master switch is deliberately NOT set, so a disabled/regressed
    rule raises; negative-tested in tests/test_plans.py."""
    j = (
        spark.range(0, 100_000, 1, 16)
        .select((F.col("id") % 1000).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy()
        .agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("groups"))
    )
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    if "AQEShuffleRead coalesced" not in plan:
        raise AssertionError(
            "AQE did not coalesce the bytes-tiny shuffle read of the "
            "grouped aggregate; plan:\n" + plan[:2000]
        )


@register(
    "aqe_coalesce_shuffle_read",
    oracle=f"""
    WITH fact AS (
        SELECT i % 1000 AS k,
               {_H.format(e='i')} % 1000 AS p
        FROM (SELECT unnest(range(0, 100000)) AS i)
    )
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(p) AS BIGINT) AS checksum
    FROM fact
    GROUP BY k
    ORDER BY k
    """,
    doc="AQE partition coalescing, REGISTERED AND SELF-PROVING — the "
    "third leg of the adaptive-execution trio (skew split: "
    "aqe_skew_join_split; runtime filter: runtime_bloom_filter_join): "
    "per-key counts and a portable-hash checksum over a 1000-key "
    "aggregate whose map outputs are bytes-tiny, the shape where "
    "static shuffle.partitions would schedule near-empty reducers at "
    "cluster scale and AQE folds them into advisory-sized reads. The "
    "builder proves it on an executed probe of the identical shape "
    "(_assert_aqe_coalesce, memoized per session/conf-state) and "
    "raises if the final adaptive plan lacks the coalesced "
    "AQEShuffleRead; negative-tested with "
    "spark.sql.adaptive.coalescePartitions.enabled=false. The "
    "Catches section of SCALING.md records the inverse lesson this "
    "round taught — when NOT to let coalescing win (bytes-tiny but "
    "pair-quadratic joins pin their parallelism instead).",
    tags=("skew", "layout", "A10", "scale-proof"),
)
def aqe_coalesce_shuffle_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flu_data_pipeline_spark.plans.layout_queries import _probe_once

    _probe_once(
        spark,
        "aqeCoalesceShuffleRead",
        (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.coalescePartitions.enabled",
        ),
        lambda: _assert_aqe_coalesce(spark),
    )
    fact = spark.range(0, 100_000, 1, 16).select(
        (F.col("id") % 1000).alias("k"),
        (hash64(F.col("id").cast("string")) % 1000).alias("p"),
    )
    return (
        fact.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("p").cast("bigint").alias("checksum"),
        )
        .orderBy("k")
    )
