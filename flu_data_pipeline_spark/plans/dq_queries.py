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
from flu_data_pipeline_spark.functions.hashing import hash64, hash64_sql
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


@register(
    "dq_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, e.value, m.med,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m ON m.event_type = e.event_type
        WHERE e.value IS NOT NULL
    ), mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(dev.med), 6) AS median_value,
           ROUND(MAX(mad.mad), 6) AS mad,
           CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON mad.event_type = dev.event_type
    GROUP BY dev.event_type
    ORDER BY dev.event_type
    """,
    doc="Robust outlier audit via median absolute deviation: per event "
    "type, the exact median, the exact MAD (median of |x - median|), "
    "and how many rows sit beyond 3 MADs — the robust alternative to "
    "z-scores (events_daily_zscore), immune to the outliers it hunts "
    "(mean/stddev are dragged by the very points being flagged). Two "
    "exact interpolated-percentile passes (Spark percentile == DuckDB "
    "quantile_cont, proven by percentiles_by_type) with the median "
    "broadcast back between them; the 3-MAD comparison is the same "
    "IEEE arithmetic on both engines. At 100 TB exact per-group "
    "percentiles sort within groups — swap in approx_percentile "
    "(t-digest) for the scale path; the 3-MAD flag logic is unchanged.",
    tags=("dq", "percentile", "A7", "A11"),
)
def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                (F.col("adev") > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


#: Benford first-digit expected shares, log10(1 + 1/d) as fixed literals
#: (identical double constants on both engines — no runtime log).
_BENFORD = {
    1: 0.301029995663981, 2: 0.176091259055681, 3: 0.124938736608300,
    4: 0.096910013008056, 5: 0.079181246047625, 6: 0.066946789630613,
    7: 0.057991946977687, 8: 0.051152522447381, 9: 0.045757490560675,
}
_BENFORD_SQL = "CASE " + " ".join(
    f"WHEN digit = {d} THEN {p!r}" for d, p in _BENFORD.items()
) + " END"


@register(
    "dq_benford_digits",
    oracle=f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM lineitem WHERE l_extendedprice >= 1
    ), cnt AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt)
    SELECT digit, n,
           ROUND(n / CAST(total AS DOUBLE), 6) AS observed_share,
           {_BENFORD_SQL} AS benford_share,
           ROUND((n / CAST(total AS DOUBLE) - {_BENFORD_SQL})
                 * (n / CAST(total AS DOUBLE) - {_BENFORD_SQL})
                 / {_BENFORD_SQL}, 6) AS chi2_term
    FROM cnt CROSS JOIN tot
    ORDER BY digit
    """,
    doc="Benford first-digit audit over extended prices: observed share "
    "per leading digit vs the Benford expectation log10(1+1/d) — the "
    "classic fabricated-data / unit-mixup tripwire for financial "
    "columns (TPC-H prices are qty x unit-price products, which DO "
    "approximately Benford). Expected shares are compile-time literal "
    "doubles (no runtime log, so both engines compare against "
    "bit-identical constants); the first digit comes from exact "
    "int64 -> string truncation, never float formatting; shares and "
    "chi2 terms are one IEEE expression over exact counts, emitted "
    "per digit (9 rows) for the same sum-order-free reason as "
    "curation_association_chi2. One scan, one 9-group aggregate, one "
    "1-row total broadcast.",
    tags=("dq", "A7", "A10"),
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") >= 1
    )
    cnt = li.select(
        F.substring(
            F.floor(F.col("l_extendedprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").cast("bigint").alias("total"))
    benford = F.when(F.col("digit") == 1, F.lit(_BENFORD[1]))
    for d in range(2, 10):
        benford = benford.when(F.col("digit") == d, F.lit(_BENFORD[d]))
    obs = F.col("n") / F.col("total").cast("double")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed_share"),
            benford.alias("benford_share"),
            F.round((obs - benford) * (obs - benford) / benford, 6).alias(
                "chi2_term"
            ),
        )
        .orderBy("digit")
    )


@register(
    "dp_noisy_release",
    oracle=f"""
    WITH counts AS (
        SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS true_count
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ), noised AS (
        SELECT n_name, true_count,
               ({hash64_sql("n_name || ':dp-seed'")} % 100000) / 100000.0
                   - 0.499995 AS u
        FROM counts
    )
    SELECT n_name, true_count,
           ROUND(-1.0 * SIGN(u) * ln(1.0 - 2.0 * ABS(u)), 6) AS noise,
           ROUND(true_count - 1.0 * SIGN(u) * ln(1.0 - 2.0 * ABS(u)), 6)
               AS noisy_count,
           1.0 AS epsilon
    FROM noised
    ORDER BY n_name
    """,
    doc="Differentially-private count release (Laplace mechanism) over "
    "per-nation customer counts: noise ~ Laplace(sensitivity/eps) with "
    "sensitivity 1 (one customer changes one count by 1) and eps = 1, "
    "drawn by inverse-CDF  -b*sign(u)*ln(1-2|u|)  from a uniform "
    "u in (-0.5, 0.5). The uniform is DERIVED FROM THE PORTABLE HASH "
    "of the release key + a fixed seed — deterministic and identical "
    "in both engines (a seeded release, the reproducible-pipeline "
    "practice for audited DP publishing; a production system rotates "
    "the seed per release epoch). The epsilon column makes the "
    "privacy-budget spend part of the release artifact itself — the "
    "accounting ledger joins on it. Complements the k-anonymity / "
    "l-diversity / PII-scrub gates: those suppress, this perturbs. "
    "Scale shape: noise is a per-GROUP scalar expression after the "
    "count aggregation — zero extra shuffles, group-cardinality "
    "output.",
    tags=("dq", "privacy", "A10", "J6"),
)
def dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    counts = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = (
        hash64(F.concat(F.col("n_name"), F.lit(":dp-seed"))) % 100000
    ) / 100000.0 - 0.499995
    noise = -1.0 * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))
    return counts.select(
        "n_name",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.lit(1.0).alias("epsilon"),
    ).orderBy("n_name")


@register(
    "join_cardinality_audit",
    oracle="""
    WITH ol AS (
        SELECT 'orders-lineitem' AS join_name,
               (SELECT COUNT(*) FROM orders) AS n_left,
               (SELECT COUNT(*) FROM lineitem) AS n_right,
               GREATEST((SELECT COUNT(DISTINCT o_orderkey) FROM orders),
                        (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem))
                   AS max_ndv,
               (SELECT COUNT(*) FROM orders o
                JOIN lineitem l ON o.o_orderkey = l.l_orderkey) AS actual
    ), co AS (
        SELECT 'customer-orders',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM orders),
               GREATEST((SELECT COUNT(DISTINCT c_custkey) FROM customer),
                        (SELECT COUNT(DISTINCT o_custkey) FROM orders)),
               (SELECT COUNT(*) FROM customer c
                JOIN orders o ON c.c_custkey = o.o_custkey)
    ), pl AS (
        SELECT 'part-lineitem',
               (SELECT COUNT(*) FROM part),
               (SELECT COUNT(*) FROM lineitem),
               GREATEST((SELECT COUNT(DISTINCT p_partkey) FROM part),
                        (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)),
               (SELECT COUNT(*) FROM part p
                JOIN lineitem l ON p.p_partkey = l.l_partkey)
    ), unioned AS (
        SELECT * FROM ol UNION ALL SELECT * FROM co
        UNION ALL SELECT * FROM pl
    )
    SELECT join_name,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(max_ndv AS BIGINT) AS max_ndv,
           CAST((n_left * n_right) // max_ndv AS BIGINT) AS estimated,
           CAST(actual AS BIGINT) AS actual,
           ROUND(CAST(actual AS DOUBLE)
                 / ((n_left * n_right) // max_ndv), 6)
               AS actual_over_est
    FROM unioned
    ORDER BY join_name
    """,
    doc="Join-cardinality estimation audit — the textbook CBO formula "
    "|A join B| ~ |A|*|B| / max(ndv_A(k), ndv_B(k)) checked against "
    "the ACTUAL join output for the three FK joins of the star "
    "schema. actual/estimated near 1 validates the uniformity "
    "assumption the optimizer's join ordering rests on; large "
    "ratios flag key skew or correlation, which is exactly when "
    "hand hints (broadcast, shuffle-hash, salting — skew_queries) "
    "earn their keep and when ANALYZE histograms (the CBO stats "
    "test) matter. Integer-exact: counts and NDVs are exact "
    "distinct counts, the estimate uses integer division. Scale "
    "shape: per join, two count aggregates, two distinct-counts, "
    "and the join's own count — each a standard shuffle; at "
    "warehouse scale the NDVs come from ANALYZE stats instead of "
    "recomputation, making the audit metadata-only.",
    tags=("dq", "A8", "A11", "J6"),
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    def audit(name, left, right, lk, rk):
        stats = left.agg(
            F.count(F.lit(1)).alias("n_left"),
            F.countDistinct(lk).alias("ndv_l"),
        ).crossJoin(
            right.agg(
                F.count(F.lit(1)).alias("n_right"),
                F.countDistinct(rk).alias("ndv_r"),
            )
        ).crossJoin(
            left.join(right, F.col(lk) == F.col(rk))
            .agg(F.count(F.lit(1)).alias("actual"))
        )
        max_ndv = F.greatest("ndv_l", "ndv_r")
        # floor division on both engines (DuckDB // / Spark floor):
        # a plain double divide + cast would truncate on one side and
        # round on the other when the estimate is not integral
        est = F.floor(F.col("n_left") * F.col("n_right") / max_ndv).cast(
            "bigint"
        )
        return stats.select(
            F.lit(name).alias("join_name"),
            F.col("n_left").cast("bigint").alias("n_left"),
            F.col("n_right").cast("bigint").alias("n_right"),
            max_ndv.cast("bigint").alias("max_ndv"),
            est.alias("estimated"),
            F.col("actual").cast("bigint").alias("actual"),
            F.round(F.col("actual").cast("double") / est, 6)
            .alias("actual_over_est"),
        )

    return (
        audit("orders-lineitem", orders, lineitem, "o_orderkey", "l_orderkey")
        .unionByName(
            audit("customer-orders", customer, orders, "c_custkey", "o_custkey")
        )
        .unionByName(
            audit("part-lineitem", part, lineitem, "p_partkey", "l_partkey")
        )
        .orderBy("join_name")
    )


#: candidate functional dependencies to audit: (name, table, determinant,
#: dependent). Mix of FDs that hold by construction (brand encodes mfgr,
#: supplier pins nation) and ones expected to fail (type does not pin
#: brand) so the audit exercises both outcomes.
_FD_CANDIDATES = (
    ("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
    ("part_type_to_brand", "part", "p_type", "p_brand"),
    ("supplier_to_nation", "supplier", "s_suppkey", "s_nationkey"),
    ("customer_nation_to_segment", "customer", "c_nationkey", "c_mktsegment"),
)


def _fd_check_sql(name: str, table: str, det: str, dep: str) -> str:
    return f"""
        SELECT '{name}' AS fd_name,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(MAX(nd) AS BIGINT) AS max_distinct_dep,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
                    AS BOOLEAN) AS holds
        FROM (
            SELECT {det}, COUNT(DISTINCT {dep}) AS nd
            FROM {table} GROUP BY {det}
        )"""


@register(
    "dq_functional_dependency",
    oracle=" UNION ALL ".join(
        _fd_check_sql(*c) for c in _FD_CANDIDATES
    )
    + " ORDER BY fd_name",
    doc="Functional-dependency audit (profiling-suite staple, the check "
    "behind schema-normalization and silent-corruption alarms): for "
    "each candidate X -> Y, group by X and count groups where Y takes "
    "more than one value. Candidates mix FDs that hold by construction "
    "(a nation pins its region; a supplier key pins its nation) "
    "with ones that must fail (type does not determine brand), so both "
    "outcomes are exercised. Scale shape: each check is one "
    "groupBy(X) count-distinct with map-side partial aggregation — "
    "the violating-group COUNT is the alarm wired into ingest; at "
    "100 TB the same audit runs per-partition and unions, since an FD "
    "holding per partition AND on the (X, Y) distinct union holds "
    "globally.",
    tags=("dq", "A8", "A10", "S7"),
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, table, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        grouped = t.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        check = grouped.agg(
            F.lit(name).alias("fd_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.max("nd").cast("bigint").alias("max_distinct_dep"),
            (
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)) == 0
            ).alias("holds"),
        )
        out = check if out is None else out.unionByName(check)
    return out.orderBy("fd_name")


@register(
    "drift_psi",
    oracle="""
    WITH bounds AS (
        SELECT MIN(datediff('day', DATE '1990-01-01', CAST(ts AS DATE)))
                   AS lo,
               MAX(datediff('day', DATE '1990-01-01', CAST(ts AS DATE)))
                   AS hi
        FROM events
    ), pts AS (
        SELECT CAST(LEAST(19, FLOOR(value / 25.0)) AS INT) AS bin,
               datediff('day', DATE '1990-01-01', CAST(ts AS DATE))
                   >= (lo + hi) / 2 AS post
        FROM events CROSS JOIN bounds
        WHERE value IS NOT NULL
    ), bins AS (
        SELECT b.bin,
               CAST(COALESCE(SUM(CASE WHEN NOT post THEN 1 END), 0)
                    AS BIGINT) AS n_pre,
               CAST(COALESCE(SUM(CASE WHEN post THEN 1 END), 0) AS BIGINT)
                   AS n_post
        FROM (SELECT unnest(range(0, 20)) AS bin) b
        LEFT JOIN pts ON pts.bin = b.bin
        GROUP BY b.bin
    ), tot AS (
        SELECT CAST(SUM(n_pre) AS BIGINT) AS np,
               CAST(SUM(n_post) AS BIGINT) AS nq
        FROM bins
    ), scored AS (
        SELECT bin, n_pre, n_post,
               (CAST(n_pre AS DOUBLE) + 0.5) / (np + 10.0) AS p,
               (CAST(n_post AS DOUBLE) + 0.5) / (nq + 10.0) AS q
        FROM bins CROSS JOIN tot
    )
    SELECT bin, n_pre, n_post,
           ROUND(p, 6) AS share_pre, ROUND(q, 6) AS share_post,
           ROUND((q - p) * LN(q / p), 6) AS psi_contrib
    FROM scored
    ORDER BY bin
    """,
    doc="Population stability index of the event-value distribution "
    "between the first and second half of the data window — THE "
    "industry-standard model-input drift alarm (PSI < 0.1 stable, "
    "0.1-0.25 moderate shift, > 0.25 retrain). 20 fixed-width value "
    "bins (top bin open-ended), both halves' shares Laplace-smoothed "
    "(+0.5 per bin) so empty bins stay finite, per-bin contribution "
    "(q - p) ln(q/p) >= 0 emitted as rows — the total PSI is their "
    "sum, and per-bin rows show WHERE the drift lives, which the "
    "scalar alone hides. The bin spine is a generated 20-row frame, "
    "so bins missing from the data still appear. Scale shape: "
    "broadcast 1-row day bounds onto the scan, one 20-group "
    "aggregate; at 100 TB the same query runs per feature column as "
    "the nightly drift sweep.",
    tags=("dq", "stats", "timeseries", "A7", "A10"),
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("value", "ts")
    ev = ev.select(
        "value",
        F.expr("datediff(CAST(ts AS DATE), DATE '1990-01-01')").alias("day"),
    )
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    pts = (
        ev.crossJoin(F.broadcast(bounds))
        .filter(F.col("value").isNotNull())
        .selectExpr(
            "CAST(LEAST(19, FLOOR(value / 25.0)) AS INT) AS bin",
            "day >= (lo + hi) / 2 AS post",
        )
    )
    spine = ev.sparkSession.range(0, 20).select(
        F.col("id").cast("int").alias("bin")
    )
    counted = pts.groupBy("bin").agg(
        F.sum(F.when(~F.col("post"), 1)).alias("_np"),
        F.sum(F.when(F.col("post"), 1)).alias("_nq"),
    )
    bins = (
        F.broadcast(spine)
        .join(counted, "bin", "left")
        .select(
            "bin",
            F.coalesce("_np", F.lit(0)).cast("bigint").alias("n_pre"),
            F.coalesce("_nq", F.lit(0)).cast("bigint").alias("n_post"),
        )
    )
    tot = bins.agg(
        F.sum("n_pre").cast("bigint").alias("np"),
        F.sum("n_post").cast("bigint").alias("nq"),
    )
    scored = bins.crossJoin(F.broadcast(tot)).selectExpr(
        "bin",
        "n_pre",
        "n_post",
        "(CAST(n_pre AS DOUBLE) + 0.5) / (np + 10.0) AS p",
        "(CAST(n_post AS DOUBLE) + 0.5) / (nq + 10.0) AS q",
    )
    return scored.selectExpr(
        "bin",
        "n_pre",
        "n_post",
        "ROUND(p, 6) AS share_pre",
        "ROUND(q, 6) AS share_post",
        "ROUND((q - p) * LN(q / p), 6) AS psi_contrib",
    ).orderBy("bin")


_CANARIES = ("spark", "canary7x", "order value")


@register(
    "dq_canary_scan",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN contains(lower(text), '{_CANARIES[0]}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS hits_0,
           CAST(SUM(CASE WHEN contains(lower(text), '{_CANARIES[1]}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS hits_1,
           CAST(SUM(CASE WHEN contains(lower(text), '{_CANARIES[2]}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS hits_2,
           CAST(SUM(CASE WHEN contains(lower(text), '{_CANARIES[0]}')
                          OR contains(lower(text), '{_CANARIES[1]}')
                          OR contains(lower(text), '{_CANARIES[2]}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS hits_any
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Canary / contamination scan: per source, how many documents "
    "contain any of a fixed set of marker strings — the benchmark-"
    "contamination and data-poisoning tripwire run before training "
    "(canary7x stands in for an inserted secret; a real run loads the "
    "canary list from the eval suites). Plain substring containment "
    "(contains on lowercased text) — no regex engine in the hot path; "
    "one map-side pass, per-source counters only in the shuffle. "
    "Complements split_leakage_audit (fingerprint-level) with "
    "needle-level detection.",
    tags=("dq", "curation", "text", "A10"),
)
def dq_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    flags = [
        F.when(F.contains(lowered, F.lit(c)), 1).otherwise(0).alias(f"f{i}")
        for i, c in enumerate(_CANARIES)
    ]
    base = docs.select("source", *flags)
    any_hit = sum(F.col(f"f{i}") for i in range(len(_CANARIES)))
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(f"f{i}").cast("long").alias(f"hits_{i}")
                for i in range(len(_CANARIES))
            ],
            F.sum(F.when(any_hit > 0, 1).otherwise(0))
            .cast("long")
            .alias("hits_any"),
        )
        .orderBy("source")
    )
