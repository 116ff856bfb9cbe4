"""Incremental aggregation: mergeable partial-aggregate state.

The pattern every 100 TB rollup lives on: never recompute history.
Yesterday's aggregate STATE (one row per group of mergeable metrics) is
combined with today's DELTA partition — cost O(|state| + |delta|),
independent of history length. Mergeability rules: count/sum merge by
sum, min/max by min/max, avg is derived (sum/count) at read time and
never stored as a mean (means don't merge). The same algebra is what
makes map-side partial aggregation and streaming state stores work.

The query is self-checking: it recomputes the full aggregate directly
and emits a per-group ``matches_full`` flag, so the merge algebra is
verified inside the result, and the DuckDB oracle independently repeats
both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register

#: History/delta split: orders strictly before 2000-01-01 are "already
#: aggregated" state; the rest is today's incoming partition.
_CUTOFF = "2000-01-01"


@register(
    "incremental_state_merge",
    oracle=f"""
    WITH state AS (
        SELECT o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(o_totalprice) AS total,
               MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '{_CUTOFF}'
        GROUP BY grp
    ), delta AS (
        SELECT o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(o_totalprice) AS total,
               MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '{_CUTOFF}'
        GROUP BY grp
    ), merged AS (
        SELECT COALESCE(s.grp, d.grp) AS grp,
               COALESCE(s.n, 0) + COALESCE(d.n, 0) AS n,
               COALESCE(s.total, 0) + COALESCE(d.total, 0) AS total,
               LEAST(COALESCE(s.mn, d.mn), COALESCE(d.mn, s.mn)) AS mn,
               GREATEST(COALESCE(s.mx, d.mx), COALESCE(d.mx, s.mx)) AS mx
        FROM state s FULL OUTER JOIN delta d ON s.grp = d.grp
    ), full_agg AS (
        SELECT o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(o_totalprice) AS total,
               MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        FROM orders GROUP BY grp
    )
    SELECT m.grp, m.n,
           ROUND(m.total, 2) AS total,
           ROUND(m.mn, 2) AS mn, ROUND(m.mx, 2) AS mx,
           ROUND(m.total / m.n, 6) AS avg_price,
           (m.n = f.n AND m.mn = f.mn AND m.mx = f.mx
            AND ROUND(m.total, 2) = ROUND(f.total, 2)) AS matches_full
    FROM merged m JOIN full_agg f ON m.grp = f.grp
    ORDER BY m.grp
    """,
    doc="Mergeable partial-aggregate state: history rows collapse to one "
    "state row per group (count/sum/min/max), then today's delta "
    "partition merges in O(|state|+|delta|) — the incremental-rollup "
    "maintenance pattern that replaces full recomputation at 100 TB. "
    "avg is derived sum/count at read time (means don't merge). "
    "Self-checking: matches_full compares the merged state against a "
    "direct full aggregation inside the result (float totals compared "
    "at 2dp — state+delta and full-scan sums differ only in "
    "float-addition order). Equivalent semantics to streaming state "
    "stores and map-side combine.",
    tags=("incremental", "A7", "A10", "S6"),
)
def incremental_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("date")

    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("grp")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    state = agg_of(orders.filter(F.col("o_orderdate").cast("date") < cutoff))
    delta = agg_of(orders.filter(F.col("o_orderdate").cast("date") >= cutoff))
    full = agg_of(orders)

    s, d = state.alias("s"), delta.alias("d")
    merged = s.join(d, F.col("s.grp") == F.col("d.grp"), "full_outer").select(
        F.coalesce(F.col("s.grp"), F.col("d.grp")).alias("grp"),
        (F.coalesce(F.col("s.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("s.total"), F.lit(0.0))
            + F.coalesce(F.col("d.total"), F.lit(0.0))
        ).alias("total"),
        F.least(
            F.coalesce(F.col("s.mn"), F.col("d.mn")),
            F.coalesce(F.col("d.mn"), F.col("s.mn")),
        ).alias("mn"),
        F.greatest(
            F.coalesce(F.col("s.mx"), F.col("d.mx")),
            F.coalesce(F.col("d.mx"), F.col("s.mx")),
        ).alias("mx"),
    )
    m, f = merged.alias("m"), full.alias("f")
    return (
        m.join(f, F.col("m.grp") == F.col("f.grp"))
        .select(
            F.col("m.grp").alias("grp"),
            F.col("m.n").alias("n"),
            F.round(F.col("m.total"), 2).alias("total"),
            F.round(F.col("m.mn"), 2).alias("mn"),
            F.round(F.col("m.mx"), 2).alias("mx"),
            F.round(F.col("m.total") / F.col("m.n"), 6).alias("avg_price"),
            (
                (F.col("m.n") == F.col("f.n"))
                & (F.col("m.mn") == F.col("f.mn"))
                & (F.col("m.mx") == F.col("f.mx"))
                & (F.round(F.col("m.total"), 2) == F.round(F.col("f.total"), 2))
            ).alias("matches_full"),
        )
        .orderBy("grp")
    )


@register(
    "intervals_merge_islands",
    oracle="""
    WITH iv AS (
        SELECT user_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + 300000000 AS e
        FROM events
    ), flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
        FROM iv
    ), islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island_id
        FROM flagged
    ), merged AS (
        SELECT user_id, island_id,
               MIN(s) AS island_start, MAX(e) AS island_end
        FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_end - island_start) AS BIGINT) AS covered_us,
           CAST(MAX(island_end - island_start) AS BIGINT) AS longest_us
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Gaps-and-islands: each event opens a 5-minute activity interval; "
    "overlapping intervals per user merge into islands via the classic "
    "running-max-of-ends flag + cumulative-sum island id — two window "
    "passes over ONE (user_id)-partitioned sort, no self-join, no "
    "interval explosion. Output: per-user island count, covered "
    "microseconds, longest island. All integer µs arithmetic (ns→µs "
    "truncation pinned by the catalog) — exact on both engines. At "
    "scale this is the coverage/uptime computation over telemetry "
    "streams; cost is one shuffle on user_id.",
    tags=("intervals", "window", "W1", "A4"),
)
def intervals_merge_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(300_000_000)).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.withColumn(
        "new_island",
        F.when(F.col("s") > prev_max_e, 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("island_end") - F.col("island_start")).alias("covered_us"),
            F.max(F.col("island_end") - F.col("island_start")).alias("longest_us"),
        )
        .orderBy("user_id")
    )


from flu_data_pipeline_spark.functions.hashing import HASH64_MOD, hash64, hash64_sql  # noqa: E402

_MANIFEST_EXPR_SQL = (
    "CAST(event_id AS VARCHAR) || '|' || event_type || '|' "
    "|| CAST(epoch_us(ts) AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)"
)


@register(
    "incremental_partition_manifest",
    oracle=f"""
    WITH hashed AS (
        SELECT CAST(ts AS DATE) AS day,
               event_id,
               {hash64_sql(_MANIFEST_EXPR_SQL)} % {HASH64_MOD} AS h
        FROM events
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id,
           CAST(SUM(h) AS BIGINT) AS manifest_sum
    FROM hashed
    GROUP BY day
    ORDER BY day
    """,
    doc="Partition manifest for incremental load change detection: per "
    "day-partition, row count + id range + an ORDER-INSENSITIVE additive "
    "content fingerprint (sum of portable 31-bit row hashes). An "
    "incremental loader diffs yesterday's manifest against today's and "
    "reprocesses only partitions whose (n_rows, manifest_sum) changed — "
    "O(|partitions|) comparison instead of O(|data|) re-read, the pattern "
    "snapshot-diff systems use at 100 TB. The additive fingerprint is "
    "mergeable (sub-partition manifests sum), unlike an order-sensitive "
    "digest chain; it is computed map-side, so only (day, h) aggregates "
    "shuffle. Row identity = exact integer/string fields only (no float "
    "formatting in the hash — cross-engine float rendering is not "
    "canonical). ts hashes at µs precision, matching the catalog's "
    "pinned ns→µs truncation.",
    tags=("incremental", "S6", "A10"),
)
def incremental_partition_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    row_str = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.unix_micros("ts").cast("string"),
        F.col("user_id").cast("string"),
    )
    hashed = ev.select(
        F.to_date("ts").alias("day"),
        "event_id",
        (hash64(row_str) % HASH64_MOD).alias("h"),
    )
    return (
        hashed.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("event_id").cast("long").alias("min_event_id"),
            F.max("event_id").cast("long").alias("max_event_id"),
            F.sum("h").cast("long").alias("manifest_sum"),
        )
        .orderBy("day")
    )
