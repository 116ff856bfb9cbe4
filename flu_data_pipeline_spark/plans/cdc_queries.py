"""Change-data-capture: snapshot diff between two versions of a table.

The reference pipeline is full-refresh (``dags/flu_data_airflow_v2.py``
drops and reloads every table daily), which at 100 TB is untenable — a
production replacement ships deltas. This module computes the
insert/update/delete set between two snapshots so downstream consumers
(and the idempotent sink in ``sources/writers.py``) can apply changes
incrementally.

Scale notes (100 TB): the diff shuffles BOTH snapshots once on the
primary key and compares a single 64-bit row fingerprint
(``xxhash64`` over the change-tracked columns) instead of comparing
columns pairwise — the wide payload never participates in the join
condition, and unchanged rows (the overwhelming majority in a daily
diff) are dropped before any further processing. With both snapshots
bucketed by PK on disk, the exchange disappears entirely and the diff
is a zero-shuffle zip of co-located buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register

#: Deterministic synthetic snapshots derived from ``orders`` so both
#: engines see identical versions: v_old drops keys ≡0 (mod 97) (rows
#: "inserted" later), v_new drops keys ≡0 (mod 89) ("deleted" rows) and
#: bumps o_totalprice by 10% for keys ≡0 (mod 7) ("updated" rows).
_OLD_PRED = "o_orderkey % 97 <> 0"
_NEW_PRED = "o_orderkey % 89 <> 0"
#: The bump is left UNROUNDED on purpose: IEEE-754 multiply is
#: bit-identical in Spark and DuckDB, while each engine's ROUND(x, 2)
#: differs at representation boundaries (observed: 164250.955 → .96 vs
#: .95). Raw doubles compare exactly; display rounding is a sink concern.
_NEW_PRICE = (
    "CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END"
)


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH v_old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE {_OLD_PRED}
    ), v_new AS (
        SELECT o_orderkey, o_orderstatus, {_NEW_PRICE} AS o_totalprice
        FROM orders WHERE {_NEW_PRED}
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_totalprice AS old_price,
           n.o_totalprice AS new_price
    FROM v_old o FULL OUTER JOIN v_new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus <> n.o_orderstatus
       OR o.o_totalprice <> n.o_totalprice
    """,
    doc="CDC snapshot diff: full-outer join of two table versions on the "
    "primary key, classifying each changed row as insert / update / "
    "delete and emitting (old, new) values for updates. The engine "
    "compares one xxhash64 fingerprint of the change-tracked columns "
    "rather than N column equality tests, so adding tracked columns "
    "widens the hash input, not the join. Replaces the reference's "
    "drop-and-reload refresh (flu_data_airflow_v2.py:481-547) with the "
    "delta a 100 TB pipeline would actually ship. Snapshots are "
    "deterministic modulo-key derivations of orders so both engines "
    "diff identical versions.",
    tags=("cdc", "join", "J7", "S6"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v_old = orders.filter(F.expr(_OLD_PRED)).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v_new = orders.filter(F.expr(_NEW_PRED)).select(
        "o_orderkey",
        "o_orderstatus",
        F.expr(_NEW_PRICE).alias("o_totalprice"),
    )

    # 64-bit row fingerprint over tracked columns: the join compares ONE
    # long, never the payload. Null-safe: hash inputs are concatenated
    # with a field separator after null normalization.
    def fingerprint(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "row_fp",
            F.xxhash64(
                F.coalesce(F.col("o_orderstatus"), F.lit("\x00")),
                F.col("o_totalprice"),
            ),
        )

    o = fingerprint(v_old).alias("o")
    n = fingerprint(v_new).alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    return joined.filter(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.row_fp") != F.col("n.row_fp"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.col("o.o_totalprice").alias("old_price"),
        F.col("n.o_totalprice").alias("new_price"),
    )


@register(
    "gdpr_delete_cascade",
    oracle="""
    WITH del_cust AS (
        SELECT c_custkey FROM customer
        WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 100
    ), del_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
    ), del_items AS (
        SELECT l_orderkey FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
    )
    SELECT table_name, n_affected, n_total,
           ROUND(CAST(n_affected AS DOUBLE) / n_total * 100.0, 6)
               AS pct_affected
    FROM (
        SELECT 'customer' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM del_cust) AS n_affected,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_total
        UNION ALL
        SELECT 'orders',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM del_orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
        UNION ALL
        SELECT 'lineitem',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM del_items),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
    )
    ORDER BY table_name
    """,
    doc="Right-to-erasure impact plan: given a deletion predicate on the "
    "subject table (stand-in: one market segment below a balance "
    "threshold), walk the FK cascade customer -> orders -> lineitem "
    "and report affected row counts and table percentages — the "
    "blast-radius estimate a privacy-ops runbook requires BEFORE "
    "issuing deletes, and the row-count reconciliation it checks "
    "after. Scale shape: each hop is a LEFT SEMI join on the parent's "
    "surviving key set (never materializing payload columns), exactly "
    "the shape Spark's runtime bloom-filter join optimizes; the "
    "per-table counts are 1-row aggregates. At 100 TB the same plan "
    "drives DELETE ... WHERE EXISTS against each table in FK order.",
    tags=("warehouse", "dq", "privacy", "J7", "A7"),
)
def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_cust = cust.filter(
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") < 100)
    ).select("c_custkey")
    del_orders = orders.join(
        del_cust, orders.o_custkey == del_cust.c_custkey, "left_semi"
    ).select("o_orderkey")
    del_items = li.join(
        del_orders, li.l_orderkey == del_orders.o_orderkey, "left_semi"
    ).select("l_orderkey")

    def row(name: str, affected: DataFrame, total: DataFrame) -> DataFrame:
        return (
            affected.agg(F.count(F.lit(1)).cast("bigint").alias("n_affected"))
            .crossJoin(
                total.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
            )
            .select(
                F.lit(name).alias("table_name"), "n_affected", "n_total"
            )
        )

    out = (
        row("customer", del_cust, cust)
        .unionByName(row("orders", del_orders, orders))
        .unionByName(row("lineitem", del_items, li))
    )
    return out.select(
        "table_name",
        "n_affected",
        "n_total",
        F.round(
            F.col("n_affected").cast("double") / F.col("n_total") * 100.0, 6
        ).alias("pct_affected"),
    ).orderBy("table_name")


from flu_data_pipeline_spark.functions.hashing import hash64, hash64_sql  # noqa: E402


@register(
    "cdc_changelog_compaction",
    oracle=f"""
    WITH log AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id, value,
               CASE WHEN {hash64_sql('CAST(event_id AS VARCHAR)')} % 10 = 0
                    THEN 'D' ELSE 'U' END AS op
        FROM events
    ), ranked AS (
        SELECT user_id, tsu, event_id, value, op,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY tsu DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        FROM log
    )
    SELECT user_id,
           CAST(n_changes AS BIGINT) AS n_changes,
           op AS last_op,
           CAST(op = 'D' AS INT) AS tombstoned,
           CASE WHEN op = 'D' THEN NULL ELSE tsu END AS live_ts_us,
           CASE WHEN op = 'D' THEN NULL
                ELSE ROUND(COALESCE(value, 0.0), 2) END AS live_value
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Changelog compaction — the Debezium-feed -> table materialization "
    "primitive: events replayed as per-entity change records (op "
    "synthesized deterministically: ~10% deletes by portable hash of the "
    "event id, rest upserts), compacted to one row per key by keeping "
    "the latest (ts, event_id) record; a trailing delete tombstones the "
    "key (live columns null) but stays in the output so consumers can "
    "propagate the deletion. Implemented as a single max-of-struct "
    "aggregation (count rides the same agg) — ONE key shuffle with "
    "map-side combine, no window sort buffer; log-compacted stores do "
    "exactly this merge per segment. Tie-break pinned by unique "
    "event_id.",
    tags=("cdc", "incremental", "D2", "A6", "S6"),
)
def cdc_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        F.unix_micros("ts").alias("tsu"),
        "event_id",
        "value",
        F.when(
            hash64(F.col("event_id").cast("string")) % 10 == 0, F.lit("D")
        )
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    last = F.max(
        F.struct("tsu", "event_id", "op", F.coalesce("value", F.lit(0.0)).alias("value"))
    ).alias("m")
    return (
        log.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_changes"), last)
        .select(
            "user_id",
            "n_changes",
            F.col("m.op").alias("last_op"),
            (F.col("m.op") == "D").cast("int").alias("tombstoned"),
            F.when(F.col("m.op") == "D", F.lit(None)).otherwise(
                F.col("m.tsu")
            ).alias("live_ts_us"),
            F.when(F.col("m.op") == "D", F.lit(None)).otherwise(
                F.round(F.col("m.value"), 2)
            ).alias("live_value"),
        )
        .orderBy("user_id")
    )
