"""Temporal / non-equi join suite: as-of, band range join, interval join.

The reference's joins are all equi-joins (SURVEY.md §2.3); these queries
supply the non-equi surface a time-series / feature-store workload needs,
each with a DuckDB oracle (DuckDB has native ASOF JOIN — a strong
independent check of the union+window implementation).

Scale notes (100 TB):
- as-of: one hash shuffle on the join keys (operators/joins.asof_join);
  no range-join blow-up.
- band lookup: tiny literal band table → broadcast nested-loop join; the
  build side is rows-of-constants, never a shuffle.
- interval join: equi user key + range containment → sort-merge join with
  the range as a co-located post-filter — never a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.operators.joins import asof_join
from flu_data_pipeline_spark.plans.registry import register
from flu_data_pipeline_spark.plans.window_queries import SESSIONS_CTE_SQL, sessionized

# acctbal bands: [lo, hi) — literal dimension, broadcastable by construction
BANDS: list[tuple[str, float, float]] = [
    ("negative", -1000.0, 0.0),
    ("low", 0.0, 2500.0),
    ("mid", 2500.0, 5000.0),
    ("high", 5000.0, 7500.0),
    ("top", 7500.0, 10000.0),
]


@register(
    "asof_purchase_click",
    oracle="""
    WITH clicks AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
               MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
    ), purchases AS (
        SELECT user_id, event_id, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts_s,
           ROUND(p.value, 2) AS purchase_value,
           c.click_event_id,
           p.ts_s - c.ts_s AS asof_lag
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts_s >= c.ts_s
    """,
    doc="As-of join: for each purchase, the most recent click by the same "
    "user at-or-before it. Spark side is the union+window single-shuffle "
    "as-of (operators/joins.py); DuckDB side is native ASOF LEFT JOIN — "
    "two independent algorithms must agree exactly. Clicks pre-deduped "
    "per (user, second) by max event_id to pin tie semantics.",
    tags=("join", "asof", "streaming"),
    bench=True,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.unix_timestamp("ts").alias("ts_s"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_s")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.round("value", 2).alias("purchase_value"), "ts_s"
    )
    joined = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts_s",
        right_ts="ts_s",
        right_cols=["click_event_id"],
    )
    return joined.select(
        "event_id", "user_id", "ts_s", "purchase_value", "click_event_id", "asof_lag"
    )


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS band, {lo} AS lo, {hi} AS hi" for n, lo, hi in BANDS
)


@register(
    "range_band_join",
    oracle=f"""
    WITH bands AS ({_BANDS_SQL})
    SELECT b.band,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(AVG(s.s_acctbal), 6) AS avg_acctbal
    FROM supplier s JOIN bands b
      ON s.s_acctbal >= b.lo AND s.s_acctbal < b.hi
    GROUP BY b.band
    """,
    doc="Range (band-lookup) join: suppliers bucketed into literal "
    "acctbal bands via non-equi predicates. The band table is a handful "
    "of constants → broadcast nested-loop join, the right physical plan "
    "for dimension-band lookups at any fact size.",
    tags=("join", "range"),
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    bands = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    return (
        supplier.join(
            F.broadcast(bands),
            (supplier.s_acctbal >= bands.lo) & (supplier.s_acctbal < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 6).alias("avg_acctbal"),
        )
    )


@register(
    "interval_session_errors",
    oracle=f"""
    WITH {SESSIONS_CTE_SQL},
    big AS (
        SELECT user_id, session_idx, n_events,
               session_start_s, session_start_s + duration_s AS session_end_s
        FROM sessions WHERE n_events >= 3
    ), errors AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events WHERE event_type = 'error'
    )
    SELECT b.user_id, b.session_idx, b.n_events,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_errors
    FROM big b
    LEFT JOIN errors e
      ON e.user_id = b.user_id
     AND e.ts_s >= b.session_start_s AND e.ts_s <= b.session_end_s
    GROUP BY b.user_id, b.session_idx, b.n_events
    """,
    doc="Interval-containment join: error events landing inside ≥3-event "
    "session windows of the same user. Equi user key + range predicate "
    "→ co-located join with the containment as a post-filter (no "
    "cartesian); the pattern for joining points to intervals at scale "
    "when a partition key exists.",
    tags=("join", "range", "sessionize"),
)
def interval_session_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = sessionized(spark, sf_dir)
    big = sessions.filter(F.col("n_events") >= 3).select(
        "user_id",
        "session_idx",
        "n_events",
        "session_start_s",
        (F.col("session_start_s") + F.col("duration_s")).alias("session_end_s"),
    )
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user_id"),
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
    )
    return (
        big.join(
            errors,
            (F.col("e_user_id") == F.col("user_id"))
            & (F.col("ts_s") >= F.col("session_start_s"))
            & (F.col("ts_s") <= F.col("session_end_s")),
            "left",
        )
        .groupBy("user_id", "session_idx", "n_events")
        .agg(F.count("event_id").alias("n_errors"))
    )


@register(
    "asof_tolerance",
    oracle="""
    WITH clicks AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
               MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
    ), purchases AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events WHERE event_type = 'purchase'
    ), matched AS (
        SELECT p.event_id, p.user_id, p.ts_s,
               c.click_event_id, p.ts_s - c.ts_s AS lag_s
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts_s >= c.ts_s
    )
    SELECT event_id, user_id, ts_s,
           CASE WHEN lag_s <= 3600 THEN click_event_id END AS click_event_id,
           CASE WHEN lag_s <= 3600 THEN lag_s END AS asof_lag
    FROM matched
    """,
    doc="As-of join with a 1-hour tolerance (pandas merge_asof "
    "tolerance= semantics): matches farther back than 3600s are nulled "
    "— attribution windows, staleness bounds for feature lookups.",
    tags=("join", "asof"),
)
def asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_s")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_s"
    )
    return asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts_s",
        right_ts="ts_s",
        right_cols=["click_event_id"],
        tolerance=3600,
    ).select("event_id", "user_id", "ts_s", "click_event_id", "asof_lag")


@register(
    "join_full_outer_recon",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS price
        FROM orders WHERE o_orderstatus = 'F'
    ), b AS (
        SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS price
        FROM orders WHERE o_totalprice > 100000
    )
    SELECT CASE WHEN a.k IS NULL THEN 'b_only'
                WHEN b.k IS NULL THEN 'a_only'
                WHEN a.price = b.price THEN 'match'
                ELSE 'mismatch' END AS recon_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(COALESCE(a.price, b.price)), 2) AS total_price
    FROM a FULL OUTER JOIN b ON a.k = b.k
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Full-outer reconciliation — the dataset-diff pattern (source vs "
    "target audit after a migration/load): every key classified as "
    "match / mismatch / one-sided in a single full outer join, "
    "aggregated to a recon summary. Completes the engine's join-type "
    "surface (inner/left/semi/anti/null-safe/as-of/range/full).",
    tags=("join", "full-outer", "J5", "A7"),
)
def join_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("k_a"), F.round("o_totalprice", 2).alias("price_a")
    )
    b = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderkey").alias("k_b"), F.round("o_totalprice", 2).alias("price_b")
    )
    joined = a.join(b, a.k_a == b.k_b, "full_outer")
    status = (
        F.when(F.col("k_a").isNull(), "b_only")
        .when(F.col("k_b").isNull(), "a_only")
        .when(F.col("price_a") == F.col("price_b"), "match")
        .otherwise("mismatch")
    )
    return (
        joined.groupBy(status.alias("recon_status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce("price_a", "price_b")), 2).alias("total_price"),
        )
        .orderBy("recon_status")
    )


@register(
    "regional_trade_revenue",
    oracle="""
    SELECT n_name AS nation,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND s_nationkey = c_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, nation
    """,
    doc="TPC-H Q5-shape regional trade volume: 6-way join where revenue "
    "only counts when the supplier and customer share a nation. Join "
    "strategy by size class: region/nation are explicit broadcasts, "
    "the region filter prunes customers BEFORE the orders join (smaller "
    "build side), the date filter pushes into the orders scan, and the "
    "same-nation condition rides the supplier equi-join (never a "
    "post-join filter over a wider join). lineitem joins last so the "
    "biggest table shuffles exactly once, on l_orderkey.",
    tags=("join", "J6", "A7", "A10", "O6"),
    bench=True,
)
def regional_trade_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    customer = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
        )
        .select("o_orderkey", "o_custkey")
    )
    # region+date pruned orders⋈customer first: the build side entering the
    # lineitem join is ~1/5 · 1/6 of orders, not all of it
    # SHUFFLE_HASH: oc is the date+region-pruned side (~1/30 of orders) —
    # hash build beats SMJ's two sorts (measured 1.2× at sf0.1) and the
    # build side shrinks with shuffle.partitions, so it scales; an
    # explicit broadcast would be faster HERE but oc grows with the fact
    # at 100 TB, so it is deliberately not broadcast.
    oc = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey", "n_name")
        .hint("SHUFFLE_HASH")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    lis = li.join(
        supplier, F.col("l_suppkey") == F.col("s_suppkey")
    )  # supplier ≤ dims scale; AQE upgrades to broadcast under threshold
    return (
        lis.join(
            oc,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


@register(
    "product_profit_by_nation",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity) * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, yr
    ORDER BY nation, yr
    """,
    doc="TPC-H Q9-shape product-line profit by supplier nation and order "
    "year (supply cost proxied as 0.6·p_retailprice·l_quantity — the "
    "testdata has no partsupp table). The LIKE-filtered part (~13% "
    "selectivity) broadcasts and prunes lineitem FIRST, so only "
    "matching line items reach the orders join; supplier/nation "
    "broadcast; orders joins on the already-reduced fact. Profit is "
    "summed in integer cents (floor per row — floor of an identical "
    "IEEE double is engine-deterministic; half-rounding of negative "
    "profits is not) so the aggregate is exact under any sum order.",
    tags=("join", "J6", "A7", "A10", "F9"),
    bench=True,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    # integer-cents sum: exact under any partial-aggregation order
    profit_cents = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("bigint")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        # orders is fact-sized at scale: never broadcast; SHUFFLE_HASH
        # avoids SMJ sorts (measured 1.2× at sf0.1), build side scales
        # with shuffle.partitions
        .join(
            orders.hint("SHUFFLE_HASH"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy(F.col("n_name").alias("nation"), "yr")
        .agg((F.sum(profit_cents).cast("double") / 100.0).alias("profit"))
        .orderBy("nation", "yr")
    )


_HOUR_US = 3_600_000_000
_WIN_LEN_US = 5_400_000_000  # 90-minute window after each day's first event


@register(
    "join_range_bin_windows",
    oracle=f"""
    WITH win AS (
        SELECT CAST(ts AS DATE) AS day,
               MIN(epoch_us(ts)) AS w_start,
               MIN(epoch_us(ts)) + {_WIN_LEN_US} AS w_end
        FROM events GROUP BY 1
    )
    SELECT w.day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           ROUND(SUM(COALESCE(e.value, 0.0)), 2) AS sum_value
    FROM win w
    JOIN (SELECT user_id, value, epoch_us(ts) AS tsu FROM events) e
      ON e.tsu >= w.w_start AND e.tsu <= w.w_end
    GROUP BY w.day
    ORDER BY w.day
    """,
    doc=f"Keyless range join via binning — the scale rewrite for interval "
    "containment with NO equi key (events x global time windows, here "
    "each day's first-90-minute activity window): a naive theta join is "
    "a nested-loop over |events| x |windows|; instead both sides map to "
    f"hour buckets ({_HOUR_US // 1_000_000}s — chosen >= typical window "
    "length so each window explodes to <= 2 buckets), the join becomes "
    "an EQUI-join on the bucket id (hash-partitionable, AQE-skew-"
    "splittable), and the exact range predicate filters within buckets. "
    "Bucket sizing rule: bucket ~ max interval length, so each interval "
    "covers O(1) buckets and per-bucket row counts stay bounded. The "
    "DuckDB oracle runs the plain theta join — same result, different "
    "physical strategy, which is the point.",
    tags=("join", "range", "J6", "A8"),
    bench=True,
)
def join_range_bin_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("tsu"),
        F.to_date("ts").alias("day"),
    )
    win = (
        ev.groupBy("day")
        .agg(F.min("tsu").alias("w_start"))
        .select(
            "day",
            "w_start",
            (F.col("w_start") + F.lit(_WIN_LEN_US)).alias("w_end"),
        )
    )
    # explode each window onto every hour bucket it covers — at most
    # ceil(window/bucket) + 1 = 3 buckets for a 90-min window over
    # 60-min buckets (F.sequence covers the actual bucket range)
    win_b = win.select(
        "day",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                (F.col("w_start") / _HOUR_US).cast("long"),
                (F.col("w_end") / _HOUR_US).cast("long"),
            )
        ).alias("bucket"),
    )
    ev_b = ev.select(
        "user_id",
        "value",
        "tsu",
        (F.col("tsu") / _HOUR_US).cast("long").alias("bucket"),
    )
    joined = ev_b.join(win_b, "bucket").filter(
        (F.col("tsu") >= F.col("w_start")) & (F.col("tsu") <= F.col("w_end"))
    )
    return (
        joined.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias(
                "sum_value"
            ),
        )
        .orderBy("day")
    )
