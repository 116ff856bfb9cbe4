"""Declarative data-quality constraint battery (Deequ-style).

The reference enforces integrity via Postgres DDL (PK/FK constraints,
``dags/flu_data_airflow_v2.py:481-547``) and the engine mirrors those as
load-time checks (``sources/writers.py``). This module generalizes them
into the constraint REPORT a production pipeline gates on before
publishing a table: each constraint is one row (name, observed value,
pass/fail) so the gate is a single ``forall passed`` over the result.

Scale notes (100 TB): all row-level constraints (completeness, domain,
range) compile into ONE conditional-aggregation pass over the fact scan —
adding a constraint adds a column to the same pass, not a new job. The
uniqueness check is a groupBy on the PK projection; referential integrity
is a distinct-key anti-join (keys only, never payloads). That is the
whole cost model: one scan + two key-shuffles, independent of how many
row-level rules are registered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


@register(
    "dq_constraint_report",
    oracle="""
    WITH row_checks AS (
        SELECT
            CAST(COUNT(*) AS DOUBLE) AS n_rows,
            CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) AS null_qty,
            CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                          THEN 1 ELSE 0 END) AS DOUBLE) AS bad_flag,
            CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                          THEN 1 ELSE 0 END) AS DOUBLE) AS bad_disc,
            CAST(SUM(CASE WHEN l_extendedprice < l_quantity
                          THEN 1 ELSE 0 END) AS DOUBLE) AS price_lt_qty
        FROM lineitem
    ), pk AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS pk_dups FROM (
            SELECT l_orderkey, l_linenumber FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
        )
    ), fk AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS fk_orphans FROM (
            SELECT DISTINCT l.l_orderkey FROM lineitem l
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        )
    )
    SELECT c.constraint, c.observed, c.passed FROM (
        SELECT 'lineitem.row_count_gt_0' AS constraint,
               n_rows AS observed, n_rows > 0 AS passed FROM row_checks
        UNION ALL
        SELECT 'lineitem.l_quantity_complete', null_qty, null_qty = 0
        FROM row_checks
        UNION ALL
        SELECT 'lineitem.l_returnflag_in_domain', bad_flag, bad_flag = 0
        FROM row_checks
        UNION ALL
        SELECT 'lineitem.l_discount_in_range', bad_disc, bad_disc = 0
        FROM row_checks
        UNION ALL
        SELECT 'lineitem.extprice_ge_quantity', price_lt_qty,
               price_lt_qty = 0 FROM row_checks
        UNION ALL
        SELECT 'lineitem.pk_unique', pk_dups, pk_dups = 0 FROM pk
        UNION ALL
        SELECT 'lineitem.orderkey_fk_valid', fk_orphans, fk_orphans = 0
        FROM fk
    ) c
    """,
    doc="Deequ-style constraint report over lineitem: completeness, "
    "domain, range, and cross-column rules fold into ONE conditional-"
    "aggregation scan; PK uniqueness is a key-only groupBy and the "
    "orders FK an anti-join of distinct keys. Result = one row per "
    "constraint (name, observed violation count, passed) — the gate a "
    "pipeline evaluates before publishing. Extends the reference's "
    "Postgres DDL guarantees (flu_data_airflow_v2.py:481-547) into a "
    "queryable report. Note: the synthetic testdata genuinely violates "
    "pk_unique (duplicate (l_orderkey, l_linenumber) pairs) — the report "
    "surfaces it as a failed constraint and the oracle agrees on the "
    "violation count, which is precisely the point of the report.",
    tags=("quality", "S7"),
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    # one pass: every row-level rule is a conditional sum on the same scan
    row_checks = li.agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("int"))
        .cast("double")
        .alias("null_qty"),
        F.sum((~F.col("l_returnflag").isin("A", "N", "R")).cast("int"))
        .cast("double")
        .alias("bad_flag"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("int")
        )
        .cast("double")
        .alias("bad_disc"),
        F.sum((F.col("l_extendedprice") < F.col("l_quantity")).cast("int"))
        .cast("double")
        .alias("price_lt_qty"),
    )
    pk_dups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .count()
        .filter("count > 1")
        .agg(F.count(F.lit(1)).cast("double").alias("pk_dups"))
    )
    fk_orphans = (
        li.select("l_orderkey")
        .distinct()
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("double").alias("fk_orphans"))
    )

    def row(src: DataFrame, name: str, col: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("constraint"),
            F.col(col).alias("observed"),
            (
                F.col(col) > 0 if name.endswith("row_count_gt_0") else F.col(col) == 0
            ).alias("passed"),
        )

    return (
        row(row_checks, "lineitem.row_count_gt_0", "n_rows")
        .unionByName(row(row_checks, "lineitem.l_quantity_complete", "null_qty"))
        .unionByName(row(row_checks, "lineitem.l_returnflag_in_domain", "bad_flag"))
        .unionByName(row(row_checks, "lineitem.l_discount_in_range", "bad_disc"))
        .unionByName(
            row(row_checks, "lineitem.extprice_ge_quantity", "price_lt_qty")
        )
        .unionByName(row(pk_dups, "lineitem.pk_unique", "pk_dups"))
        .unionByName(row(fk_orphans, "lineitem.orderkey_fk_valid", "fk_orphans"))
    )


@register(
    "dq_k_anonymity",
    oracle="""
    WITH grp AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
               CAST(COUNT(*) AS BIGINT) AS grp_size
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, acctbal_band, grp_size
    FROM grp
    WHERE grp_size < 5
    ORDER BY grp_size, c_nationkey, c_mktsegment, acctbal_band
    """,
    doc="k-anonymity audit (k=5) over the quasi-identifier tuple "
    "(nation, market segment, account-balance band): every equivalence "
    "class smaller than k is a re-identification risk — the privacy "
    "gate a curation pipeline runs before releasing joined/derived "
    "tables (companion to curation_pii_scrub, which handles direct "
    "identifiers). One groupBy on the quasi-identifier tuple "
    "(map-side combined), then a size filter; at 100 TB the class "
    "census is tiny next to the scan that feeds it. Banding the "
    "continuous attribute (floor/1000) is the standard generalization "
    "step that makes k-anonymity reachable at all.",
    tags=("dq", "curation", "A10", "A9", "privacy"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    grp = (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
                "acctbal_band"
            ),
        )
        .agg(F.count(F.lit(1)).alias("grp_size"))
    )
    return (
        grp.filter(F.col("grp_size") < 5)
        .select("c_nationkey", "c_mktsegment", "acctbal_band", "grp_size")
        .orderBy("grp_size", "c_nationkey", "c_mktsegment", "acctbal_band")
    )


@register(
    "dq_l_diversity",
    oracle="""
    WITH cls AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        GROUP BY 1, 2, 3
    ), agg AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(SUM(n) AS BIGINT) AS grp_size,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_sensitive,
               CAST(MAX(n) AS BIGINT) AS max_band_n
        FROM cls GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, grp_size, n_distinct_sensitive,
           ROUND(max_band_n / grp_size, 6) AS dominant_share,
           n_distinct_sensitive < 5 AS violates_l
    FROM agg
    ORDER BY c_nationkey, c_mktsegment
    """,
    doc="l-diversity audit (l=5) over the same quasi-identifier classes "
    "as dq_k_anonymity, treating the account-balance band as the "
    "SENSITIVE attribute: a class can satisfy k-anonymity yet leak — "
    "if all k members share one sensitive value, re-identification "
    "within the class reveals it (homogeneity attack). Reports EVERY "
    "class with its sensitive-value diversity, the dominant value's "
    "share (an exact integer ratio), and a violates-l flag — the audit "
    "table stays class-count-sized and non-degenerate at every scale. "
    "Two stacked map-side-"
    "combined aggregations — (QI, sensitive) census then per-QI "
    "rollup — nothing data-sized shuffles twice. Together with "
    "k-anonymity and PII scrub this is the release gate trio for "
    "derived-table publication.",
    tags=("dq", "curation", "A10", "A9", "privacy"),
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cls = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    agg = cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("bigint").alias("grp_size"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_sensitive"),
        F.max("n").cast("bigint").alias("max_band_n"),
    )
    return (
        agg.select(
            "c_nationkey",
            "c_mktsegment",
            "grp_size",
            "n_distinct_sensitive",
            F.round(F.col("max_band_n") / F.col("grp_size"), 6).alias(
                "dominant_share"
            ),
            (F.col("n_distinct_sensitive") < 5).alias("violates_l"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )
