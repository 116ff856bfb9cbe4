"""Time-series operators over the ``events`` stream: gap filling and
forward filling.

The reference's only time-series handling is a weekly-grain dimension
(dags/flu_data_airflow_v2.py:350-361) with *implicit* gaps (weeks missing
from RHINO simply don't exist in ``temporal``). A real analytics engine
needs the explicit versions: densify a calendar against observed data
(gap-fill) and carry the last observation forward (ffill) — both as
declarative plans, no driver-side loops.

Scale notes: the calendar is built FROM the data (one global min/max
aggregate — a few bytes to the driver-side plan, never collect()ed), and
the dense grid is dims × days, which stays tiny relative to the fact
table; the grid side of the left join broadcasts. Forward fill is a
single partitioned window — one shuffle by entity key, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register
from flu_data_pipeline_spark.plans.window_queries import SESSIONS_CTE_SQL


@register(
    "ts_gapfill_daily",
    oracle="""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type FROM events
    ), bounds AS (
        SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
    ), days AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM ev
    ), counts AS (
        SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2
    )
    SELECT t.event_type, d.day,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM types t
    CROSS JOIN days d
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
    """,
    doc="Calendar densification (gap-fill): every (event_type, day) cell "
    "over the observed date span, zero-filled where no events occurred. "
    "The day spine comes from sequence() over the data's own min/max — "
    "fully declarative; the spine × type grid is tiny and broadcasts "
    "into the left join against the aggregated counts.",
    tags=("timeseries", "gapfill"),
)
def ts_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type"
    )
    counts = ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    days = (
        ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    types = ev.select("event_type").distinct()
    # Bounded crossJoin: |types| is a small enum (~10) and |days| is the
    # observed date span (~365/yr) — the grid is O(10k)/year regardless of
    # fact cardinality, so broadcasting it is safe at any corpus scale.
    # A gapfill over an UNBOUNDED key (e.g. user_id × day) must instead
    # range-join each key's own [min, max] span — never this grid.
    grid = types.crossJoin(days)
    return (
        F.broadcast(grid)
        .join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0).cast("long")).alias("n_events"),
        )
    )


@register(
    "ts_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('microseconds', ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS last_purchase_value
    FROM events
    """,
    doc="Forward fill (last observation carried forward): per user, each "
    "event carries the most recent purchase value at or before it "
    "(null until the first purchase). One shuffle on user_id, then a "
    "running last(ignorenulls) window — the standard LOCF pattern "
    "without any iterative driver logic. Ordering pinned to "
    "(epoch-µs ts, event_id) on both engines — event_id breaks any "
    "same-microsecond tie, so the fill is deterministic under either "
    "parquet timestamp flavor the catalog normalizes.",
    tags=("timeseries", "ffill", "window"),
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 6).alias(
            "last_purchase_value"
        ),
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), c AS (
        SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(d.day - c.cohort_day AS INT) AS day_offset,
           CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
    FROM d JOIN c ON d.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users grouped by first-seen day, "
    "activity counted per (cohort, day-offset) cell — the standard "
    "product-analytics retention triangle. Active-day dedup happens "
    "BEFORE the join (user x day, far smaller than raw events), the "
    "cohort aggregate joins back on user_id, and every stage keys on "
    "user_id so the shuffles share partitioning.",
    tags=("timeseries", "cohort", "A7", "A8"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    c = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        d.join(c, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "events_daily_pct_change",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS revenue
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT day, revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY day))
                 / LAG(revenue) OVER (ORDER BY day), 6) AS pct_change
    FROM daily
    """,
    doc="Period-over-period change: daily purchase revenue with "
    "day-over-day percent delta via lag. Revenue is rounded 2dp BEFORE "
    "the ratio so both engines divide identical values. The final "
    "window is global but runs over the already-aggregated daily rows "
    "(~1 row/day) — the agg shuffle did the heavy lifting, so the "
    "single-partition tail is O(days), fine at any scale.",
    tags=("timeseries", "window", "A7"),
)
def events_daily_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w = Window.orderBy("day")
    prev = F.lag("revenue").over(w)
    return daily.select(
        "day",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("pct_change"),
    )


@register(
    "sessions_peak_concurrency",
    oracle=f"""
    WITH {SESSIONS_CTE_SQL},
    pts AS (
        SELECT session_start_s AS t, 1 AS delta, user_id, session_idx
        FROM sessions
        UNION ALL
        SELECT session_start_s + duration_s AS t, -1 AS delta,
               user_id, session_idx
        FROM sessions
    ), run AS (
        SELECT t, SUM(delta) OVER (
            ORDER BY t, delta, user_id, session_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS concurrency
        FROM pts
    )
    SELECT CAST(FLOOR(t / 86400.0) AS INT) AS epoch_day,
           CAST(MAX(concurrency) AS INT) AS peak_concurrency
    FROM run
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Interval-overlap analytics by sweep line: sessions (from the "
    "shared gaps-and-islands derivation) become +1/-1 boundary events; "
    "a running sum over the pinned global ordering is the instantaneous "
    "concurrency, maxed per day. End-before-start at equal timestamps "
    "(delta ascending) makes touching intervals non-overlapping — the "
    "convention is pinned identically in both engines, with (user, "
    "session) breaking remaining ties. The O(n log n) alternative to "
    "the quadratic interval self-join. The running sum is a global "
    "window over session BOUNDARIES (2 rows/session, already "
    "aggregate-reduced); at 100 TB the same sweep distributes as a "
    "range-partitioned sort + per-partition prefix sums with partition "
    "offsets added in a second pass (parallel scan).",
    tags=("timeseries", "sessionize", "window", "range"),
)
def sessions_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flu_data_pipeline_spark.plans.window_queries import sessionized

    sess = sessionized(spark, sf_dir).select(
        "user_id",
        "session_idx",
        "session_start_s",
        (F.col("session_start_s") + F.col("duration_s")).alias("session_end_s"),
    )
    starts = sess.select(
        F.col("session_start_s").alias("t"), F.lit(1).alias("delta"),
        "user_id", "session_idx",
    )
    ends = sess.select(
        F.col("session_end_s").alias("t"), F.lit(-1).alias("delta"),
        "user_id", "session_idx",
    )
    sweep = Window.orderBy("t", "delta", "user_id", "session_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = starts.unionByName(ends).select(
        "t", F.sum("delta").over(sweep).alias("concurrency")
    )
    return (
        run.groupBy(F.floor(F.col("t") / 86400.0).cast("int").alias("epoch_day"))
        .agg(F.max("concurrency").cast("int").alias("peak_concurrency"))
        .orderBy("epoch_day")
    )


@register(
    "events_daily_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(SUM(value), 2) AS daily_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, daily_value,
           ROUND((daily_value - AVG(daily_value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(daily_value) OVER (PARTITION BY event_type),
                 6) AS zscore
    FROM daily
    """,
    doc="Daily-value anomaly scores: each (type, day) cell's z-score "
    "against its type's distribution — the alerting primitive for "
    "metric monitoring. Daily sums rounded 2dp before the moments so "
    "both engines standardize identical values (sample stddev on both). "
    "The stats windows run over the aggregated daily grid, not raw "
    "events, and share the event_type partitioning.",
    tags=("timeseries", "stats", "window", "A7"),
)
def events_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("daily_value"))
    w = Window.partitionBy("event_type")
    return daily.select(
        "event_type",
        "day",
        "daily_value",
        F.round(
            (F.col("daily_value") - F.avg("daily_value").over(w))
            / F.stddev_samp("daily_value").over(w),
            6,
        ).alias("zscore"),
    )


@register(
    "rolling_distinct_users",
    oracle="""
    WITH act AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
        SELECT DISTINCT day FROM act
    )
    SELECT d.day AS day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users_7d
    FROM days d
    JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
    doc="Trailing-7-day distinct active users per observed day. Spark has no "
    "COUNT(DISTINCT) OVER RANGE window; the naive form is a non-equi range "
    "self-join (BroadcastNestedLoop — quadratic). Scalable formulation: "
    "dedup to (day, user) pairs map-side, then EXPLODE each pair onto the "
    "<=7 target days it contributes to (sequence(day, day+6)) — bounded "
    "fan-out = window length — restrict to observed days via a broadcast "
    "semi-join on the tiny day grid, and finish with one hash "
    "count-distinct shuffle keyed by target day. Every join is equi; cost "
    "is O(window_len x distinct pairs) regardless of total data size.",
    tags=("timeseries", "window", "A8", "dedup"),
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = act.select("day").distinct()
    fanned = act.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "target_day"
        ),
        "user_id",
    )
    return (
        fanned.join(
            F.broadcast(days),
            fanned.target_day == days.day,
            "left_semi",
        )
        .groupBy(F.col("target_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


@register(
    "ts_ewma_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(SUM(value), 2) AS daily_value
        FROM events GROUP BY 1, 2
    ), series AS (
        SELECT event_type,
               list(daily_value ORDER BY day) AS vals,
               list(day ORDER BY day) AS days
        FROM daily GROUP BY event_type
    ), idx AS (
        SELECT event_type, days, vals,
               unnest(generate_series(1, len(vals))) AS i
        FROM series
    )
    SELECT event_type, days[i] AS day, vals[i] AS daily_value,
           list_reduce(
               list_prepend(CAST(vals[1] AS DOUBLE),
                            CAST(vals[2:i] AS DOUBLE[])),
               (acc, x) -> 0.3 * x + 0.7 * acc
           ) AS ewma
    FROM idx
    """,
    doc="Exponentially weighted moving average (alpha=0.3) of the daily "
    "value series per event type. EWMA is a sequential recurrence "
    "(y_i = a*x_i + (1-a)*y_{i-1}) Spark windows cannot express "
    "natively; here each group's series is collected into an ordered "
    "array (bounded: days per entity, not raw events — the groupBy "
    "collapse happens first) and the prefix fold runs as the "
    "F.aggregate higher-order function, JVM-side, zero UDFs. Both "
    "engines execute the IDENTICAL fold order on identical 2dp-rounded "
    "inputs, so raw-double results hash-match (mul/add are "
    "correctly-rounded IEEE). Scale note: per-key state is one "
    "array of days — fine for bounded series; unbounded streams use "
    "the closed-form weighted-prefix trick or applyInPandasWithState "
    "(streaming/ingest.py).",
    tags=("timeseries", "window", "hof", "A7"),
)
def ts_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("daily_value"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "daily_value"))
        ).alias("pairs")
    )
    exploded = series.select(
        "event_type",
        F.col("pairs.daily_value").alias("vals"),
        F.posexplode(F.col("pairs")).alias("pos", "pair"),
    )
    return exploded.select(
        "event_type",
        F.col("pair.day").alias("day"),
        F.col("pair.daily_value").alias("daily_value"),
        F.when(F.col("pos") == 0, F.col("vals").getItem(0))
        .otherwise(
            F.aggregate(
                F.slice(F.col("vals"), 2, F.col("pos")),
                F.col("vals").getItem(0).cast("double"),
                lambda acc, x: 0.3 * x + 0.7 * acc,
            )
        )
        .alias("ewma"),
    )


@register(
    "ts_linear_interpolate",
    oracle="""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, event_type, value FROM events
    ), bounds AS (
        SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
    ), days AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM ev
    ), obs AS (
        SELECT event_type, day, ROUND(SUM(value), 2) AS v
        FROM ev WHERE dayofmonth(day) % 3 = 1
        GROUP BY 1, 2
    ), grid AS (
        SELECT t.event_type, d.day, o.v
        FROM types t CROSS JOIN days d
        LEFT JOIN obs o ON o.event_type = t.event_type AND o.day = d.day
    ), anchored AS (
        SELECT event_type, day, v,
               MAX(CASE WHEN v IS NOT NULL THEN day END) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_day,
               MIN(CASE WHEN v IS NOT NULL THEN day END) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_day
        FROM grid
    )
    SELECT a.event_type, a.day,
           CAST(a.v IS NOT NULL AS INT) AS observed,
           CASE
               WHEN a.v IS NOT NULL THEN a.v
               WHEN a.prev_day IS NULL THEN n.v
               WHEN a.next_day IS NULL THEN p.v
               ELSE p.v + (n.v - p.v)
                    * (CAST(a.day - a.prev_day AS DOUBLE)
                       / CAST(a.next_day - a.prev_day AS DOUBLE))
           END AS interp_value
    FROM anchored a
    LEFT JOIN obs p ON p.event_type = a.event_type AND p.day = a.prev_day
    LEFT JOIN obs n ON n.event_type = a.event_type AND n.day = a.next_day
    """,
    doc="Group-wise linear interpolation over a gapped daily series: the "
    "observed anchor set (every ~3rd day's rounded daily value-sum — a "
    "deterministic sparsifier) is densified against the calendar spine, "
    "then each gap cell finds its bracketing anchors via cumulative "
    "MAX/MIN-over-window of the observed day (NO vendor IGNORE NULLS — "
    "portable to any engine) and joins their values back for "
    "v0 + (v1-v0)*(Δd/Δspan). Edges backfill/carry the nearest anchor. "
    "One window shuffle per direction on the (type, day) grid — the "
    "grid is dims x days, tiny next to the fact scan that feeds it; "
    "anchor joins broadcast. Interp arithmetic is pinned-order IEEE on "
    "2dp-rounded anchors, so raw doubles hash-match cross-engine.",
    tags=("timeseries", "gapfill", "interpolate"),
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type", "value"
    )
    bounds = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    obs = (
        ev.filter(F.dayofmonth("day") % 3 == 1)
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(obs, ["event_type", "day"], "left")
    )
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    anchored = grid.select(
        "event_type",
        "day",
        "v",
        F.max(obs_day).over(w_back).alias("prev_day"),
        F.min(obs_day).over(w_fwd).alias("next_day"),
    )
    p = obs.select(
        F.col("event_type").alias("p_type"),
        F.col("day").alias("p_day"),
        F.col("v").alias("p_v"),
    )
    n = obs.select(
        F.col("event_type").alias("n_type"),
        F.col("day").alias("n_day"),
        F.col("v").alias("n_v"),
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "next_day", "prev_day"
    ).cast("double")
    return (
        anchored.join(
            F.broadcast(p),
            (F.col("event_type") == F.col("p_type"))
            & (F.col("prev_day") == F.col("p_day")),
            "left",
        )
        .join(
            F.broadcast(n),
            (F.col("event_type") == F.col("n_type"))
            & (F.col("next_day") == F.col("n_day")),
            "left",
        )
        .select(
            "event_type",
            "day",
            F.col("v").isNotNull().cast("int").alias("observed"),
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(F.col("prev_day").isNull(), F.col("n_v"))
            .when(F.col("next_day").isNull(), F.col("p_v"))
            .otherwise(F.col("p_v") + (F.col("n_v") - F.col("p_v")) * frac)
            .alias("interp_value"),
        )
    )


@register(
    "ts_seasonal_naive_eval",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval_days,
           CAST(SUM(ABS(a.n - f7.n)) AS BIGINT) AS abs_err_seasonal7,
           CAST(SUM(ABS(a.n - f1.n)) AS BIGINT) AS abs_err_naive1,
           ROUND(SUM(ABS(a.n - f7.n))
                 / NULLIF(SUM(ABS(a.n - f1.n)), 0), 6) AS mase
    FROM daily a
    JOIN daily f7 ON f7.event_type = a.event_type AND f7.day = a.day - 7
    JOIN daily f1 ON f1.event_type = a.event_type AND f1.day = a.day - 1
    GROUP BY a.event_type
    ORDER BY a.event_type
    """,
    doc="Seasonal-naive forecast evaluation (MASE): per event type, "
    "forecast each day's event count with the count 7 days earlier and "
    "score against the 1-day-naive baseline — MASE = sum|err_7| / "
    "sum|err_1| over days where both references exist. MASE < 1 means "
    "weekly seasonality carries real signal; it is THE scale-free "
    "forecast metric (no division by possibly-zero actuals, unlike "
    "MAPE). All error sums are exact int64 (counts are integers; ABS "
    "and SUM order-insensitive); the single ROUND happens after the "
    "one double division. Plan: one groupBy builds the daily series, "
    "then two self-equi-joins on (type, day-offset) — calendar-exact "
    "under gaps, where a window lag would silently compare "
    "non-adjacent days. At 100 TB the daily series is tiny next to "
    "the event scan that feeds it; joins are on the aggregated frame "
    "only.",
    tags=("timeseries", "eval", "A7", "J6"),
)
def ts_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = daily.alias("a")
    f7 = daily.alias("f7")
    f1 = daily.alias("f1")
    joined = (
        a.join(
            f7,
            (F.col("f7.event_type") == F.col("a.event_type"))
            & (F.col("f7.day") == F.date_sub(F.col("a.day"), 7)),
        )
        .join(
            f1,
            (F.col("f1.event_type") == F.col("a.event_type"))
            & (F.col("f1.day") == F.date_sub(F.col("a.day"), 1)),
        )
    )
    err7 = F.abs(F.col("a.n") - F.col("f7.n"))
    err1 = F.abs(F.col("a.n") - F.col("f1.n"))
    return (
        joined.groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_eval_days"),
            F.sum(err7).cast("bigint").alias("abs_err_seasonal7"),
            F.sum(err1).cast("bigint").alias("abs_err_naive1"),
            F.round(
                F.sum(err7)
                / F.nullif(F.sum(err1), F.lit(0)),
                6,
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


@register(
    "trending_topk_users",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, user_id,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), days AS (SELECT DISTINCT day FROM daily),
    merged AS (
        SELECT d.day AS day, a.user_id, CAST(SUM(a.n) AS BIGINT) AS n_7d
        FROM days d
        JOIN daily a ON a.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1, 2
    )
    SELECT day, user_id, n_7d,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT day, user_id, n_7d,
               ROW_NUMBER() OVER (
                   PARTITION BY day ORDER BY n_7d DESC, user_id) AS rnk
        FROM merged)
    WHERE rnk <= 3
    ORDER BY day, rnk
    """,
    doc="Trailing-7-day top-3 most-active users per day — the 'trending' "
    "rolling leaderboard. Same merged-daily-partials shape as the "
    "rolling HLL: per-(day, user) counts build once from the scan "
    "(map-side combined), each partial fans out to the <=7 target days "
    "it contributes to (explode of a bounded sequence — every join "
    "stays equi), trailing totals are one hash aggregate, and the "
    "per-day top-3 is a keyed rank window that WindowGroupLimit "
    "pre-prunes. Integer counts end-to-end; ties pinned by user_id. "
    "At 100 TB the fan-out is window_length x daily-partial rows — "
    "never a re-scan of events per window, and never a global sort.",
    tags=("timeseries", "window", "O3", "A7"),
)
def trending_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    days = daily.select("day").distinct()
    fanned = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("target_day"),
        "user_id",
        "n",
    )
    merged = (
        fanned.join(F.broadcast(days), F.col("target_day") == days.day, "left_semi")
        .groupBy(F.col("target_day").alias("day"), "user_id")
        .agg(F.sum("n").cast("long").alias("n_7d"))
    )
    w = Window.partitionBy("day").orderBy(F.desc("n_7d"), F.asc("user_id"))
    return (
        merged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("day", "user_id", "n_7d", F.col("rnk").cast("long").alias("rnk"))
        .orderBy("day", "rnk")
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(SUM(value), 2) AS daily_value
        FROM events GROUP BY 1, 2
    ), trended AS (
        SELECT event_type, day, daily_value,
               ROUND(AVG(daily_value) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6) AS trend,
               CAST((day - DATE '1970-01-01') % 7 AS INT) AS dow
        FROM daily
    ), seasoned AS (
        SELECT event_type, day, daily_value, trend, dow,
               ROUND(AVG(daily_value - trend) OVER (
                   PARTITION BY event_type, dow), 6) AS seasonal
        FROM trended
    )
    SELECT event_type, day, daily_value, trend, dow, seasonal,
           ROUND(daily_value - trend - seasonal, 6) AS resid
    FROM seasoned
    ORDER BY event_type, day
    """,
    doc="Classical additive seasonal decomposition of the per-type daily "
    "event series: value = trend + seasonal + residual. Trend = "
    "7-day centered moving average (ragged at series edges — AVG "
    "over the available frame, same rule both engines); seasonal = "
    "mean of the detrended values per day-of-week (dow computed as "
    "epoch-days mod 7 — portable integer arithmetic, no locale-"
    "dependent weekday function); residual = what neither explains "
    "(the anomaly signal this feeds at scale). Daily sums are "
    "pre-rounded to 2dp to pin float accumulation order, components "
    "to 6dp. Scale shape: windows are PARTITIONED by event_type "
    "(and dow) — no global single-partition window; day-cardinality "
    "rows per type flow through two partitioned window passes, and "
    "the decomposition columns land next to the series for direct "
    "thresholding (|resid| > k*sigma) downstream.",
    tags=("timeseries", "window", "A3", "A7"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("daily_value"))
    w_trend = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    trended = daily.select(
        "event_type",
        "day",
        "daily_value",
        F.round(F.avg("daily_value").over(w_trend), 6).alias("trend"),
        (F.datediff("day", F.lit("1970-01-01")) % 7).cast("int").alias("dow"),
    )
    w_season = Window.partitionBy("event_type", "dow")
    seasoned = trended.select(
        "event_type",
        "day",
        "daily_value",
        "trend",
        "dow",
        F.round(
            F.avg(F.col("daily_value") - F.col("trend")).over(w_season), 6
        ).alias("seasonal"),
    )
    return seasoned.select(
        "event_type",
        "day",
        "daily_value",
        "trend",
        "dow",
        "seasonal",
        F.round(
            F.col("daily_value") - F.col("trend") - F.col("seasonal"), 6
        ).alias("resid"),
    ).orderBy("event_type", "day")


@register(
    "weekly_backlog_curve",
    oracle="""
    WITH ordered AS (
        SELECT CAST((CAST(o.o_orderdate AS DATE) - DATE '1970-01-01') // 7
                    AS BIGINT) AS week_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_ordered
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    ), shipped AS (
        SELECT CAST((CAST(l_shipdate AS DATE) - DATE '1970-01-01') // 7
                    AS BIGINT) AS week_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_shipped
        FROM lineitem
        GROUP BY 1
    ), merged AS (
        SELECT COALESCE(o.week_bucket, s.week_bucket) AS week_bucket,
               COALESCE(o.n_ordered, 0) AS n_ordered,
               COALESCE(s.n_shipped, 0) AS n_shipped
        FROM ordered o FULL OUTER JOIN shipped s
          ON o.week_bucket = s.week_bucket
    )
    SELECT week_bucket, n_ordered, n_shipped,
           CAST(SUM(n_ordered - n_shipped) OVER (
               ORDER BY week_bucket ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS open_backlog
    FROM merged
    ORDER BY week_bucket
    """,
    doc="Order-to-ship backlog burndown by week: line items enter the "
    "backlog in their ORDER week and leave in their SHIP week; the "
    "running difference of the two weekly counts is the open backlog "
    "at each week boundary (an event-sourced balance — the inventory/"
    "WIP curve every fulfillment dashboard tracks). Weeks are "
    "portable integer buckets (epoch-days div 7 — no locale week "
    "rules); the two weekly series FULL OUTER merge so ship-only and "
    "order-only weeks both appear; counts are integers so the "
    "cumulative sum is exact. Scale shape: two partial-aggregated "
    "counts (the orders join is FK co-partitioned), a week-"
    "cardinality merge, and one ordered cumulative window over WEEK "
    "rows (hundreds, not data-sized) — the same two-pass prefix-sum "
    "swap as vocab_coverage_cutoff applies if the spine ever grows.",
    tags=("timeseries", "warehouse", "J5", "A10", "W1"),
)
def weekly_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    week = lambda c: (  # noqa: E731
        F.floor(F.datediff(F.col(c).cast("date"), F.lit("1970-01-01")) / 7)
        .cast("bigint")
    )
    ordered = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(week("o_orderdate").alias("week_bucket"))
        .agg(F.count(F.lit(1)).alias("n_ordered"))
    )
    shipped = li.groupBy(week("l_shipdate").alias("week_bucket")).agg(
        F.count(F.lit(1)).alias("n_shipped")
    )
    merged = (
        ordered.join(shipped, "week_bucket", "full_outer")
        .select(
            "week_bucket",
            F.coalesce("n_ordered", F.lit(0)).alias("n_ordered"),
            F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"),
        )
    )
    w = Window.orderBy("week_bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return merged.select(
        "week_bucket",
        "n_ordered",
        "n_shipped",
        F.sum(F.col("n_ordered") - F.col("n_shipped"))
        .over(w)
        .cast("bigint")
        .alias("open_backlog"),
    ).orderBy("week_bucket")


@register(
    "ts_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(FLOOR(ROUND(SUM(value), 2) * 100 + 0.5) AS BIGINT)
                   AS value_cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(value_cents) AS BIGINT) AS total_cents
        FROM daily GROUP BY event_type
    ), cusum AS (
        SELECT d.event_type, d.day, s.n_days,
               CAST(SUM(s.n_days * d.value_cents - s.total_cents) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM daily d JOIN stats s ON d.event_type = s.event_type
    )
    SELECT event_type, n_days,
           day AS changepoint_day,
           c AS cusum_scaled
    FROM cusum
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY ABS(c) DESC, day) = 1
    ORDER BY event_type
    """,
    doc="CUSUM change-point detection per event-type daily series: the "
    "cumulative sum of deviations from the series mean peaks (in "
    "absolute value) at the most likely mean-shift point — the "
    "classic offline change detector behind monitoring alarms. All "
    "arithmetic is INTEGER-exact: daily values become cents, and "
    "deviations are scaled by n (n*x_d - total is the cent deviation "
    "times n, avoiding the fractional mean entirely), so the running "
    "sum and the argmax are bit-identical across engines — no float "
    "tolerance in a quantity that gets argmax'd. The reported "
    "cusum_scaled divided by 100*n_days gives the conventional "
    "dollar-scale CUSUM. Scale shape: one (type, day) aggregate, a "
    "type-partitioned cumulative window over day-cardinality rows, "
    "and a per-type argmax window — no global single-partition "
    "operation.",
    tags=("timeseries", "window", "A6", "A7"),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.floor(F.round(F.sum("value"), 2) * 100 + 0.5)
        .cast("bigint")
        .alias("value_cents")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("value_cents").cast("bigint").alias("total_cents"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n_days",
        F.sum(
            F.col("n_days") * F.col("value_cents") - F.col("total_cents")
        )
        .over(w_cum)
        .cast("bigint")
        .alias("c"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("c")).desc(), "day"
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("day").alias("changepoint_day"),
            F.col("c").alias("cusum_scaled"),
        )
        .orderBy("event_type")
    )


@register(
    "littles_law_audit",
    oracle="""
    WITH li AS (
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(o.o_orderdate AS DATE) AS d_in,
               CAST(l.l_shipdate AS DATE) AS d_out
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), span AS (
        SELECT CAST(MIN(d_in) AS DATE) AS t0, CAST(MAX(d_out) AS DATE) AS t1,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d_out - d_in) AS BIGINT) AS total_wait_days
        FROM li
    )
    SELECT n AS n_lines,
           CAST(t1 - t0 + 1 AS BIGINT) AS horizon_days,
           ROUND(CAST(n AS DOUBLE) / (t1 - t0 + 1), 6) AS lambda_per_day,
           ROUND(CAST(total_wait_days AS DOUBLE) / n, 6) AS avg_wait_days,
           ROUND(CAST(total_wait_days AS DOUBLE) / (t1 - t0 + 1), 6)
               AS avg_wip_littles
    FROM span
    """,
    doc="Little's law audit over the order-to-ship flow: L = lambda * W "
    "connects average work-in-progress (open line items), arrival "
    "rate, and average wait — and over a full horizon it is an "
    "IDENTITY, not an approximation: total wait-days = integral of "
    "WIP over time, so avg WIP = total_wait/horizon = (n/horizon) * "
    "(total_wait/n) = lambda * W by construction. The query measures "
    "all three from the data (integer day arithmetic, one "
    "aggregate), giving the fulfillment dashboard its sanity "
    "equation: measure any two, audit the third — a mismatch means "
    "lost/duplicated flow events, exactly what "
    "flu_pipeline_reconciliation catches for row counts. Scale "
    "shape: one FK-co-partitioned join and a single global "
    "aggregate; nothing grows with horizon length.",
    tags=("timeseries", "warehouse", "A7", "J5"),
)
def littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderdate").cast("date").alias("d_in"),
        F.col("l_shipdate").cast("date").alias("d_out"),
    )
    span = joined.agg(
        F.min("d_in").alias("t0"),
        F.max("d_out").alias("t1"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.datediff("d_out", "d_in")).cast("bigint")
        .alias("total_wait_days"),
    )
    horizon = F.datediff("t1", "t0") + 1
    return span.select(
        F.col("n").cast("bigint").alias("n_lines"),
        horizon.cast("bigint").alias("horizon_days"),
        F.round(F.col("n").cast("double") / horizon, 6).alias("lambda_per_day"),
        F.round(
            F.col("total_wait_days").cast("double") / F.col("n"), 6
        ).alias("avg_wait_days"),
        F.round(
            F.col("total_wait_days").cast("double") / horizon, 6
        ).alias("avg_wip_littles"),
    )


@register(
    "ts_holt_linear",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(SUM(value), 2) AS v
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ), series AS (
        SELECT event_type,
               list(v ORDER BY day) AS vals
        FROM daily GROUP BY event_type
    ), fitted AS (
        SELECT event_type,
               CAST(len(vals) AS BIGINT) AS n_days,
               list_reduce(
                   list_transform(vals, v -> [CAST(v AS DOUBLE), 0.0]),
                   (acc, e) -> [
                       0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                       0.3 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                              - acc[1]) + 0.7 * acc[2]
                   ]) AS state
        FROM series
    )
    SELECT event_type, n_days,
           ROUND(state[1], 6) AS level,
           ROUND(state[2], 6) AS trend,
           ROUND(state[1] + state[2], 6) AS forecast_next
    FROM fitted
    ORDER BY event_type
    """,
    doc="Holt's linear-trend (double exponential) smoothing per "
    "event-type daily series: level l' = a*x + (1-a)*(l+b), trend "
    "b' = g*(l'-l) + (1-g)*b with a=0.5, g=0.3, initialized at "
    "(first value, 0) — the one-step forecast l+b extends the "
    "forecasting family beyond seasonal-naive with an actual "
    "smoother. The recurrence is a SEQUENTIAL left fold over the "
    "day-ordered value array ([value, 0] pairs so the state rides "
    "as a 2-vector through both engines' reduce), and both engines "
    "inline the identical expression tree — per-element IEEE ops in "
    "the same order, so the fitted state is bit-comparable before "
    "the 6dp rounding. Scale shape: bounded series per key collect "
    "to arrays (the ts_ewma_daily contract); unbounded streams move "
    "the same recurrence into applyInPandasWithState where the "
    "2-number state is exactly what the state store keeps.",
    tags=("timeseries", "hof", "A7", "U4"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "array_sort(collect_list(struct(day, v)))"
        ).alias("pairs")
    )
    fitted = series.select(
        "event_type",
        F.size("pairs").cast("bigint").alias("n_days"),
        F.expr(
            "aggregate(slice(pairs.v, 2, size(pairs) - 1), "
            "array(cast(pairs.v[0] as double), cast(0.0 as double)), "
            "(acc, x) -> array("
            "0.5 * x + 0.5 * (acc[0] + acc[1]), "
            "0.3 * ((0.5 * x + 0.5 * (acc[0] + acc[1])) - acc[0]) "
            "+ 0.7 * acc[1]))"
        ).alias("state"),
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.round(F.col("state")[0], 6).alias("level"),
        F.round(F.col("state")[1], 6).alias("trend"),
        F.round(F.col("state")[0] + F.col("state")[1], 6).alias("forecast_next"),
    ).orderBy("event_type")


@register(
    "ts_interarrival_ks",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
               LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS prev_s
        FROM events
    ), gaps AS (
        SELECT event_type,
               CAST(ts_s - prev_s AS DOUBLE) AS gap
        FROM seq WHERE prev_s IS NOT NULL AND ts_s > prev_s
    ), rate AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               ROUND(1.0 / AVG(gap), 8) AS lambda
        FROM gaps GROUP BY event_type
    ), ecdf AS (
        SELECT g.event_type, g.gap, r.n_gaps, r.lambda,
               ROW_NUMBER() OVER (
                   PARTITION BY g.event_type ORDER BY g.gap
               ) AS rk
        FROM gaps g JOIN rate r ON g.event_type = r.event_type
    )
    SELECT event_type, n_gaps, lambda,
           ROUND(MAX(GREATEST(
               ABS(CAST(rk AS DOUBLE) / n_gaps
                   - (1.0 - exp(-lambda * gap))),
               ABS(CAST(rk - 1 AS DOUBLE) / n_gaps
                   - (1.0 - exp(-lambda * gap)))
           )), 6) AS ks_stat
    FROM ecdf
    GROUP BY event_type, n_gaps, lambda
    ORDER BY event_type
    """,
    doc="Kolmogorov-Smirnov goodness-of-fit of per-type interarrival "
    "gaps against the exponential(lambda-hat) null, lambda-hat = "
    "1/mean gap (the Poisson-process health check behind 'is this "
    "event stream bursty or memoryless' — a high KS stat on clicks "
    "vs signups quantifies the burstiness the burst-collapse "
    "operator then removes). The KS statistic is the max over "
    "sample points of the ECDF-vs-CDF gap, evaluated on BOTH sides "
    "of each step (rk/n and (rk-1)/n — the one-sided version "
    "understates D); ranks come from a per-type ordered window, "
    "ties on integer-second gaps are benign (same CDF value), and "
    "lambda is pre-rounded to 8dp so the exp() inputs are engine-"
    "stable. Scale shape: lag window + per-type rank window (both "
    "partitioned), then a max-aggregate — no sort leaves its "
    "partition; the critical-value compare (1.36/sqrt n) is a "
    "driver-side scalar.",
    tags=("timeseries", "eval", "A7", "W1"),
)
def ts_interarrival_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    )
    sec = F.floor(F.unix_micros(F.col("ts")) / 1000000).cast("bigint")
    w_lag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        sec.alias("ts_s"),
        F.lag(sec).over(w_lag).alias("prev_s"),
    )
    gaps = seq.filter(
        F.col("prev_s").isNotNull() & (F.col("ts_s") > F.col("prev_s"))
    ).select(
        "event_type",
        (F.col("ts_s") - F.col("prev_s")).cast("double").alias("gap"),
    )
    rate = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(1.0 / F.avg("gap"), 8).alias("lambda"),
    )
    w_rk = Window.partitionBy("event_type").orderBy("gap")
    ecdf = gaps.join(F.broadcast(rate), "event_type").select(
        "event_type",
        "gap",
        "n_gaps",
        "lambda",
        F.row_number().over(w_rk).alias("rk"),
    )
    cdf = 1.0 - F.exp(-F.col("lambda") * F.col("gap"))
    dev = F.greatest(
        F.abs(F.col("rk").cast("double") / F.col("n_gaps") - cdf),
        F.abs((F.col("rk") - 1).cast("double") / F.col("n_gaps") - cdf),
    )
    return (
        ecdf.groupBy("event_type", "n_gaps", "lambda")
        .agg(F.round(F.max(dev), 6).alias("ks_stat"))
        .orderBy("event_type")
    )


#: shared-text OLS slope over windowed moments (exact integers in, one
#: deterministic double expression out on both engines)
_ROLL_SLOPE = (
    "(CAST(n_win AS DOUBLE) * CAST(sxy_w AS DOUBLE)"
    " - CAST(sx_w AS DOUBLE) * CAST(sy_w AS DOUBLE))"
    " / (CAST(n_win AS DOUBLE) * CAST(sxx_w AS DOUBLE)"
    " - CAST(sx_w AS DOUBLE) * CAST(sx_w AS DOUBLE))"
)


@register(
    "ts_rolling_slope",
    oracle=f"""
    WITH daily AS (
        SELECT d, x, datediff('day', DATE '1990-01-01', d) AS t
        FROM (
            SELECT o_orderdate AS d,
                   SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS x
            FROM orders GROUP BY o_orderdate
        )
    ), wins AS (
        SELECT d,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
               SUM(t) OVER w AS sx_w,
               SUM(x) OVER w AS sy_w,
               SUM(CAST(t AS HUGEINT) * x) OVER w AS sxy_w,
               SUM(CAST(t AS HUGEINT) * t) OVER w AS sxx_w
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT d AS day, n_win, ROUND({_ROLL_SLOPE}, 6) AS slope_cents_per_day
    FROM wins
    WHERE n_win = 28
    ORDER BY day
    """,
    doc="Trailing 28-day OLS trend of daily order revenue — the "
    "windowed-sufficient-statistics pattern: the rolling window "
    "carries the five OLS moments (n, Σt, Σy, Σty, Σt²) as exact "
    "integer sums, and the slope is one shared-text float expression "
    "per day; no per-window refit, no self-join. t = days since a "
    "fixed epoch (integer), y = exact cents, window frame in "
    "observation space (ROWS, gap-agnostic), emitted only for full "
    "windows. Scale shape: one date-keyed aggregation shuffles the "
    "fact; the rolling pass runs on the O(#days) series, which is "
    "time-bounded — the same query at 100 TB still windows over a few "
    "thousand rows.",
    tags=("timeseries", "stats", "regression", "A7", "W1"),
)
def ts_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = (
        orders.groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")
            ).alias("x")
        )
        .withColumn(
            "t", F.datediff(F.col("d"), F.lit("1990-01-01")).cast("bigint")
        )
    )
    w = Window.orderBy("d").rowsBetween(-27, 0)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    wins = daily.select(
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_win"),
        F.sum("t").over(w).alias("sx_w"),
        F.sum("x").over(w).alias("sy_w"),
        F.sum(dec("t") * F.col("x")).over(w).alias("sxy_w"),
        F.sum(dec("t") * F.col("t")).over(w).alias("sxx_w"),
    )
    return (
        wins.filter(F.col("n_win") == 28)
        .selectExpr(
            "d AS day",
            "n_win",
            f"ROUND({_ROLL_SLOPE}, 6) AS slope_cents_per_day",
        )
        .orderBy("day")
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH base AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               COALESCE(CAST(ROUND(value * 100, 0) AS BIGINT), 0) AS cents
        FROM events
    ), c AS (
        SELECT user_id, MIN(day) AS cohort_day FROM base GROUP BY user_id
    ), sizes AS (
        SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM c GROUP BY cohort_day
    ), rev AS (
        SELECT c.cohort_day, CAST(b.day - c.cohort_day AS INT) AS age,
               CAST(SUM(b.cents) AS BIGINT) AS cents
        FROM base b JOIN c ON b.user_id = c.user_id
        GROUP BY 1, 2
    ), cum AS (
        SELECT cohort_day, age,
               CAST(SUM(cents) OVER (
                   PARTITION BY cohort_day ORDER BY age
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_cents
        FROM rev
    )
    SELECT cum.cohort_day, cum.age, s.cohort_users,
           cum.cum_cents,
           ROUND(CAST(cum.cum_cents AS DOUBLE) / 100.0 / s.cohort_users, 6)
               AS ltv_per_user
    FROM cum JOIN sizes s ON cum.cohort_day = s.cohort_day
    ORDER BY cum.cohort_day, cum.age
    """,
    doc="Cohort lifetime-value curve — the revenue sibling of "
    "events_cohort_retention: users cohorted by first-activity day, "
    "per-(cohort, age) revenue as exact int64 cents, cumulative LTV via "
    "a cohort-partitioned running sum (partitions bounded by the "
    "calendar, never single-partition), normalized per cohort user. "
    "Scale shape: one user-keyed cohort aggregate broadcast back into "
    "the event scan, one (cohort, age) aggregate, windowing over the "
    "calendar-bounded curve frame only.",
    tags=("timeseries", "events", "warehouse", "A10", "W1"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.coalesce(
            F.round(F.col("value") * 100, 0).cast("bigint"), F.lit(0)
        ).alias("cents"),
    )
    cohorts = base.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    rev = (
        base.join(cohorts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("int")
            .alias("age"),
        )
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn(
        "cum_cents", F.sum("cents").over(w).cast("bigint")
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "age",
            "cohort_users",
            "cum_cents",
            F.round(
                F.col("cum_cents").cast("double")
                / 100.0
                / F.col("cohort_users"),
                6,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "age")
    )


@register(
    "events_new_vs_returning",
    oracle="""
    WITH base AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               COALESCE(CAST(ROUND(value * 100, 0) AS BIGINT), 0) AS cents
        FROM events
    ), c AS (
        SELECT user_id, MIN(day) AS first_day FROM base GROUP BY user_id
    )
    SELECT b.day,
           CAST(COUNT(DISTINCT CASE WHEN c.first_day = b.day
                                    THEN b.user_id END) AS BIGINT)
               AS new_users,
           CAST(COUNT(DISTINCT CASE WHEN c.first_day < b.day
                                    THEN b.user_id END) AS BIGINT)
               AS returning_users,
           CAST(SUM(CASE WHEN c.first_day = b.day THEN b.cents ELSE 0 END)
                AS BIGINT) AS new_cents,
           CAST(SUM(CASE WHEN c.first_day < b.day THEN b.cents ELSE 0 END)
                AS BIGINT) AS returning_cents,
           ROUND(CAST(SUM(CASE WHEN c.first_day < b.day
                               THEN b.cents ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(b.cents), 0), 6) AS returning_share
    FROM base b JOIN c ON b.user_id = c.user_id
    GROUP BY b.day
    ORDER BY b.day
    """,
    doc="New-vs-returning decomposition per day — the standard growth-"
    "accounting dashboard row: users and exact int64-cent revenue split "
    "by whether the activity day is the user's first, plus the "
    "returning-revenue share. One user-keyed first-day aggregate joined "
    "back into the scan, one day-keyed conditional aggregation; all "
    "splits exact integers, one terminal division.",
    tags=("timeseries", "events", "warehouse", "A10"),
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.coalesce(
            F.round(F.col("value") * 100, 0).cast("bigint"), F.lit(0)
        ).alias("cents"),
    )
    firsts = base.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = F.col("first_day") == F.col("day")
    is_ret = F.col("first_day") < F.col("day")
    return (
        base.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.countDistinct(F.when(is_new, F.col("user_id")))
            .cast("bigint")
            .alias("new_users"),
            F.countDistinct(F.when(is_ret, F.col("user_id")))
            .cast("bigint")
            .alias("returning_users"),
            F.sum(F.when(is_new, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("new_cents"),
            F.sum(F.when(is_ret, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("returning_cents"),
            F.round(
                F.sum(F.when(is_ret, F.col("cents")).otherwise(0)).cast(
                    "double"
                )
                / F.nullif(F.sum("cents"), F.lit(0)),
                6,
            ).alias("returning_share"),
        )
        .orderBy("day")
    )


_XC_BRAND_A = "Brand#4"
_XC_BRAND_B = "Brand#2"
_XC_LAGS = list(range(-4, 5))


@register(
    "ts_cross_correlation",
    oracle=f"""
    WITH weekly AS (
        SELECT p.p_brand AS brand,
               CAST(epoch(CAST(o.o_orderdate AS DATE)) AS BIGINT)
                   // 604800 AS wk,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT) AS rev_c
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_brand IN ('{_XC_BRAND_A}', '{_XC_BRAND_B}')
        GROUP BY 1, 2
    ), a AS (SELECT wk, rev_c FROM weekly WHERE brand = '{_XC_BRAND_A}'),
    b AS (SELECT wk, rev_c FROM weekly WHERE brand = '{_XC_BRAND_B}'),
    lags AS (SELECT unnest(ARRAY[{", ".join(map(str, _XC_LAGS))}]) AS lag),
    aligned AS (
        SELECT lg.lag, a.rev_c AS x, b.rev_c AS y
        FROM lags lg
        JOIN a ON TRUE
        JOIN b ON b.wk = a.wk + lg.lag
    ), moments AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38, 0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38, 0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38, 0))
                        * CAST(y AS DECIMAL(38, 0))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(38, 0))
                        * CAST(x AS DECIMAL(38, 0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38, 0))
                        * CAST(y AS DECIMAL(38, 0))) AS DOUBLE) AS syy
        FROM aligned GROUP BY lag
    )
    SELECT lag, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS xcorr
    FROM moments
    ORDER BY lag
    """,
    doc=f"Lagged cross-correlation between two weekly revenue series "
    f"({_XC_BRAND_A} vs {_XC_BRAND_B}): Pearson r at lags -4..+4 weeks — "
    "the lead/lag detector behind cannibalization and demand-transfer "
    "analysis (a peak off lag 0 means one series anticipates the "
    "other). Weeks index as integer epoch-days//7, alignment is an "
    "equi-join on (week + lag), and all five moments accumulate as "
    "exact integer-cent DECIMALs before ONE double conversion — the "
    "stats_corr_covar exactness pattern extended across series and "
    "lags. Series are week-cardinality aggregates, so the lag fan-out "
    "is bounded by |weeks| x |lags|, independent of fact size.",
    tags=("timeseries", "stats", "A7", "A11"),
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    weekly = (
        li.join(
            F.broadcast(
                part.filter(F.col("p_brand").isin(_XC_BRAND_A, _XC_BRAND_B))
            ),
            li.l_partkey == part.p_partkey,
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "p_brand",
            (
                F.unix_timestamp(F.col("o_orderdate").cast("date")).cast("long")
                / 604800
            )
            .cast("long")
            .alias("wk"),
            cents.alias("c"),
        )
        .groupBy("p_brand", "wk")
        .agg(F.sum("c").cast("long").alias("rev_c"))
    )
    a = weekly.filter(F.col("p_brand") == _XC_BRAND_A).select(
        F.col("wk").alias("a_wk"), F.col("rev_c").alias("x")
    )
    b = weekly.filter(F.col("p_brand") == _XC_BRAND_B).select(
        F.col("wk").alias("b_wk"), F.col("rev_c").alias("y")
    )
    lags = spark.range(len(_XC_LAGS)).select(
        (F.col("id") + _XC_LAGS[0]).cast("int").alias("lag")
    )
    aligned = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b_wk") == F.col("a_wk") + F.col("lag"))
        .select("lag", F.col("x").cast("decimal(38,0)").alias("xd"),
                F.col("y").cast("decimal(38,0)").alias("yd"))
    )
    m = aligned.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xd").cast("double").alias("sx"),
        F.sum("yd").cast("double").alias("sy"),
        F.sum(F.col("xd") * F.col("yd")).cast("double").alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).cast("double").alias("sxx"),
        F.sum(F.col("yd") * F.col("yd")).cast("double").alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select("lag", "n", F.round(r, 6).alias("xcorr")).orderBy("lag")
