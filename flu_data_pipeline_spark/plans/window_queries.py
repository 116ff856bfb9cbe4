"""Window-function battery + sessionization.

The reference's only window usages are whole-partition transforms and one
ordered ``first`` (SURVEY.md §2.5) — this module supplies the standard
analytic-window surface a real engine needs (lag/lead, rank family,
ntile, rolling frames, cumulative aggregates, range frames) plus
gaps-and-islands sessionization over the event stream, all
DuckDB-oracle-checked.

Scale notes (100 TB): every window here partitions by a high-cardinality
key (custkey, user_id) — one hash shuffle per window ordering, no
single-partition windows (the W1 pattern is banned outside tiny dims).
Sessionization is two window passes over the same (user_id, ts) ordering:
Catalyst plans them in a single Window stage chain after one exchange, and
the same per-user logic is what ``applyInPandasWithState`` would run in
the streaming variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register

SESSION_GAP_S = 1800  # 30 min inactivity closes a session


@register(
    "window_lag_lead_rank",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(o_totalprice, 2) AS price,
           ROUND(LAG(o_totalprice) OVER w, 2) AS prev_price,
           ROUND(LEAD(o_totalprice) OVER w, 2) AS next_price,
           CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
                AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
                AS BIGINT) AS priority_drank,
           CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
                AS BIGINT) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window battery: lag/lead over the order sequence, "
    "rank/dense_rank/ntile by price — absent from the reference "
    "(SURVEY §2.5 'no lag/lead/rank/ntile'), standard engine surface. "
    "All windows share the custkey partitioning → one shuffle.",
    tags=("window", "W1"),
)
def window_lag_lead_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_price_desc = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    by_priority = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    by_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(seq), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(seq), 2).alias("next_price"),
        F.rank().over(by_price_desc).cast("long").alias("price_rank"),
        F.dense_rank().over(by_priority).cast("long").alias("priority_drank"),
        F.ntile(4).over(by_price).cast("long").alias("price_quartile"),
    )


@register(
    "window_rolling_stats",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(AVG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3_price,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cum_spend,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS order_seq
    FROM orders
    """,
    doc="Rolling frames: 3-order moving average (rowsBetween(-2, 0)), "
    "cumulative spend and sequence number per customer — explicit frame "
    "specs, which the reference never used (SURVEY §2.5).",
    tags=("window", "frames"),
)
def window_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ma3 = seq.rowsBetween(-2, Window.currentRow)
    cum = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.avg("o_totalprice").over(ma3), 6).alias("ma3_price"),
        F.round(F.sum("o_totalprice").over(cum), 2).alias("cum_spend"),
        F.count(F.lit(1)).over(cum).cast("long").alias("order_seq"),
    )


@register(
    "window_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
               AS value_1h,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS events_1h
    FROM events
    """,
    doc="RANGE frame over event-time: per-user trailing-1-hour value sum / "
    "event count (range on epoch seconds, not row count — frames follow "
    "the time axis, unequal row counts per frame).",
    tags=("window", "frames", "streaming"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("value_1h"),
        F.count(F.lit(1)).over(w).cast("long").alias("events_1h"),
    )


# Shared CTE chain: per-(user, session) rollup — reused by the interval
# join in join_queries.py so both oracles derive sessions identically.
SESSIONS_CTE_SQL = f"""
    ordered AS (
        SELECT user_id, event_id, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
               LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
               ) AS prev_ts_s
        FROM events
    ), marked AS (
        SELECT *, CASE WHEN prev_ts_s IS NULL
                         OR ts_s - prev_ts_s > {SESSION_GAP_S}
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), numbered AS (
        SELECT *, CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_idx
        FROM marked
    ), sessions AS (
        SELECT user_id, session_idx,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts_s) AS session_start_s,
               MAX(ts_s) - MIN(ts_s) AS duration_s,
               ROUND(SUM(value), 2) AS sum_value
        FROM numbered
        GROUP BY user_id, session_idx
    )
"""


@register(
    "events_sessionize",
    oracle=f"""
    WITH {SESSIONS_CTE_SQL}
    SELECT * FROM sessions
    """,
    doc="Gaps-and-islands sessionization (30-min inactivity gap): lag → "
    "new-session flag → running sum as session id → per-session rollup. "
    "Two windows + final agg share one (user_id) shuffle; the streaming "
    "twin is applyInPandasWithState with a session-gap timeout.",
    tags=("window", "sessionize", "streaming"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionized(spark, sf_dir)


def sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, session) rollup — the Spark twin of SESSIONS_CTE_SQL,
    shared with the interval join in join_queries.py."""
    ev = load_table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    cum = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = (
        ev.select(
            "user_id", "event_id", "value", F.unix_timestamp("ts").alias("ts_s")
        )
        .withColumn("prev_ts_s", F.lag("ts_s").over(seq))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts_s").isNull()
                | (F.col("ts_s") - F.col("prev_ts_s") > SESSION_GAP_S),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("is_new").over(cum).cast("long"))
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_s").alias("session_start_s"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "events_session_window",
    oracle=f"""
    WITH {SESSIONS_CTE_SQL}
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(duration_s) AS BIGINT) AS total_duration_s,
           ROUND(SUM(sum_value), 2) AS sum_value
    FROM sessions GROUP BY user_id
    """,
    doc="Native session windows: groupBy(session_window(ts, '30 minutes')) "
    "— Spark's built-in gap-merged session assignment, state-store-backed "
    "under Structured Streaming (the scale path for streaming "
    "sessionization; the gaps-and-islands twin events_sessionize is the "
    "batch-window formulation). Verified equivalent to the islands CTE: "
    "gap boundary is diff > gap on both. Rolled up per user; computed on "
    "second-floored timestamps so the seconds-based oracle is exact.",
    tags=("window", "sessionize", "streaming"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    floored = ev.select(
        "user_id",
        "value",
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts"),
    )
    per_session = (
        floored.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_s"
            ),
            F.sum("value").alias("s_value"),
        )
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("duration_s").cast("long").alias("total_duration_s"),
        F.round(F.sum("s_value"), 2).alias("sum_value"),
    )


@register(
    "window_value_positions",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), 2) AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Positional value functions: first_value (default running frame), "
    "last_value and nth_value over the FULL partition frame — the "
    "default frame stops at CURRENT ROW, the classic last_value "
    "footgun, pinned here explicitly. All three share one (custkey, "
    "orderdate) sort.",
    tags=("window", "frames", "W1"),
)
def window_value_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = seq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.first("o_totalprice").over(seq), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(full), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(full), 2).alias("second_price"),
    )


@register(
    "sequence_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderpriority AS cur,
               LAG(o_orderpriority) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev
        FROM orders
    )
    SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, cur
    ORDER BY prev, cur
    """,
    doc="First-order transition matrix over per-customer order sequences "
    "(which priority follows which) — the Markov-chain counting "
    "primitive for behavioral sequence mining. One lag window per "
    "entity ordering, then a global count per (prev, cur) cell; the "
    "matrix is |states|^2 regardless of data size.",
    tags=("window", "W1", "A7"),
)
def sequence_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            F.col("o_orderpriority").alias("cur"),
            F.lag("o_orderpriority").over(seq).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev", "cur")
    )


@register(
    "window_rank_normalized",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ROUND(PERCENT_RANK() OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
               AS pct_rank,
           ROUND(CUME_DIST() OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
               AS cume_d
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Normalized rank functions — PERCENT_RANK ((rank-1)/(N-1)) and "
    "CUME_DIST (rows<=current / N) per order priority ordered by total "
    "price: the distribution-position primitives behind percentile "
    "features and outlier trimming. Both are exact rationals of "
    "integer rank/count (ties on the double sort key resolve "
    "identically on both engines since the values are bit-identical), "
    "rounded once at the edge. One shuffle on the partition key; the "
    "per-partition sort is the same single sort all four rank "
    "functions share — Spark evaluates them in one Window physical "
    "operator, not one pass each.",
    tags=("window", "W1", "A7"),
)
def window_rank_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_d"),
        )
        .orderBy("o_orderkey")
    )
