"""Rank-based statistics without single-partition global windows.

The common trap for exact rank statistics (Mann-Whitney U, Spearman rho)
on a cluster is `ROW_NUMBER() OVER (ORDER BY value)` — a total order over
the whole relation collapses onto one task. These queries instead use the
classic two-stage distributed ranking:

1. aggregate rows to the DISTINCT-VALUE level (counts per value);
2. run the two-stage distributed prefix sum over that frame
   (`operators/ranking.py global_cumsum`: range shuffle, windows
   PARTITIONED by shuffle partition, and a one-row-per-partition
   offsets frame merged by a triangular broadcast join), so every
   distinct value gets its exact global `cum_before` without ANY
   single-partition pass — at any level, for any value range.

Average ranks for ties are kept integer-exact by carrying 2x the rank
(`2*cum_before + n + 1` = twice the average rank of a tie group), and
all moment sums go through DECIMAL(38,0) (DuckDB: HUGEINT), so the final
float statistic is computed once, identically on both engines, from
bit-identical integers.

Not in the reference (its stats end at group means,
dags/flu_data_airflow_v2.py:418-460); standard hypothesis-testing /
profiling surface for a warehouse at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.operators.ranking import global_cumsum
from flu_data_pipeline_spark.plans.registry import register


def _with_cum_before(
    vals: DataFrame, bucket: Column, order_col: str, n_col: str
) -> DataFrame:
    """Two-stage distributed prefix sum: add ``cum_before`` = number of
    rows with a strictly smaller ``order_col`` value.

    ``vals`` is a distinct-value frame (one row per value). Delegates to
    ``operators/ranking.py global_cumsum`` (range shuffle + partitioned
    windows + a partition-count offsets frame), so NO single-partition
    window runs at any level — the earlier form here kept a global
    window over range-bucket totals, whose cardinality is a data
    contract rather than a plan property; this form's offsets frame is
    one row per shuffle partition regardless of the value range. The
    ``bucket`` argument is retained for call-site compatibility and is
    no longer consulted (the range partitioner buckets internally).
    """
    del bucket  # superseded by global_cumsum's range partitioner
    return global_cumsum(
        vals, [F.col(order_col)], n_col, "__cum_incl"
    ).withColumn(
        "cum_before", F.col("__cum_incl") - F.col(n_col)
    ).drop("__cum_incl")


@register(
    "mannwhitney_rank_sum",
    oracle="""
    WITH vals AS (
        SELECT value,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        GROUP BY value
    ), ranked AS (
        SELECT ca, cb, ca + cb AS n,
               COALESCE(SUM(ca + cb) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM vals
    ), m AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(cb) AS BIGINT) AS n_b,
               SUM(ca * (2 * cum_before + n + 1)) AS r2_a,
               SUM(cb * (2 * cum_before + n + 1)) AS r2_b,
               SUM(CAST(n AS HUGEINT) * n * n - n) AS ties
        FROM ranked
    )
    SELECT n_a AS n_click, n_b AS n_purchase,
           (CAST(r2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (n_a + 1)) / 2.0
               AS u_click,
           (CAST(r2_b AS DOUBLE) - CAST(n_b AS DOUBLE) * (n_b + 1)) / 2.0
               AS u_purchase,
           ROUND(((CAST(r2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (n_a + 1))
                      / 2.0
                  - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
                 / SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                        * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                           - CAST(ties AS DOUBLE)
                             / (CAST(n_a + n_b AS DOUBLE)
                                * (CAST(n_a + n_b AS DOUBLE) - 1.0)))),
                 6) AS z_u
    FROM m
    """,
    doc="Exact Mann-Whitney U rank-sum test (click vs purchase event "
    "values), tie-corrected z statistic. Ranking is the two-stage "
    "distributed prefix sum (module docstring): rows collapse to "
    "distinct values, buckets give global offsets, windows stay "
    "bucket-partitioned — no single-partition ORDER BY over the fact. "
    "Rank sums carry 2x ranks as DECIMAL(38,0) so U and the "
    "tie-corrected z come out of bit-identical integers on both "
    "engines; U itself can be half-integer under ties, hence DOUBLE. "
    "Scale shape: one distinct-value shuffle + one tiny bucket frame; "
    "the value-level frame is what shuffles, never raw events.",
    tags=("stats", "experiment", "A11", "W1"),
)
def mannwhitney_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    vals = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "ca"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("cb"),
    )
    vals = vals.withColumn("n", F.col("ca") + F.col("cb"))
    ranked = _with_cum_before(vals, F.floor("value"), "value", "n")
    m = ranked.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(
            (
                F.col("ca") * (2 * F.col("cum_before") + F.col("n") + 1)
            ).cast("decimal(38,0)")
        ).alias("r2_a"),
        F.sum(
            (
                F.col("cb") * (2 * F.col("cum_before") + F.col("n") + 1)
            ).cast("decimal(38,0)")
        ).alias("r2_b"),
        F.sum(
            F.col("n").cast("decimal(38,0)") * F.col("n") * F.col("n")
            - F.col("n")
        ).alias("ties"),
    )
    # Final scalar math as ONE expression text mirrored in the oracle —
    # identical op tree over identical exact integers => identical double.
    return m.selectExpr(
        "n_a AS n_click",
        "n_b AS n_purchase",
        "(CAST(r2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (n_a + 1)) / 2.0"
        " AS u_click",
        "(CAST(r2_b AS DOUBLE) - CAST(n_b AS DOUBLE) * (n_b + 1)) / 2.0"
        " AS u_purchase",
        "ROUND(((CAST(r2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (n_a + 1))"
        " / 2.0"
        " - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)"
        " / SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0"
        " * ((CAST(n_a + n_b AS DOUBLE) + 1.0)"
        " - CAST(ties AS DOUBLE)"
        " / (CAST(n_a + n_b AS DOUBLE)"
        " * (CAST(n_a + n_b AS DOUBLE) - 1.0)))), 6) AS z_u",
    )


@register(
    "spearman_rho_ranks",
    oracle="""
    WITH qr AS (
        SELECT l_quantity AS q, COUNT(*) AS c FROM lineitem
        GROUP BY l_quantity
    ), qr2 AS (
        SELECT q, 2 * COALESCE(SUM(c) OVER (ORDER BY q
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
            AS r2x
        FROM qr
    ), pr AS (
        SELECT l_extendedprice AS p, COUNT(*) AS c FROM lineitem
        GROUP BY l_extendedprice
    ), pr2 AS (
        SELECT p, 2 * COALESCE(SUM(c) OVER (ORDER BY p
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
            AS r2y
        FROM pr
    ), j AS (
        SELECT r2x, r2y FROM lineitem
        JOIN qr2 ON l_quantity = q
        JOIN pr2 ON l_extendedprice = p
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(r2x) AS sx, SUM(r2y) AS sy,
               SUM(CAST(r2x AS HUGEINT) * r2x) AS sxx,
               SUM(CAST(r2y AS HUGEINT) * r2y) AS syy,
               SUM(CAST(r2x AS HUGEINT) * r2y) AS sxy
        FROM j
    )
    SELECT n AS n_rows,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS rho_spearman
    FROM m
    """,
    doc="Exact Spearman rank correlation (l_quantity vs l_extendedprice) "
    "with average ranks for ties — Pearson on 2x-ranks (affine scaling "
    "cancels in rho). Quantity has <=50 distinct values (tiny window); "
    "price ranks use the two-stage distributed prefix sum, then the rank "
    "maps join back to the fact (quantity map broadcast, price map a "
    "value-keyed shuffle join). All five moments are DECIMAL(38,0) "
    "sums (HUGEINT in the oracle) so rho is one deterministic float "
    "expression over exact integers. Scale shape: two distinct-value "
    "shuffles + one fact join; no global ORDER BY, no rank window over "
    "raw rows.",
    tags=("stats", "A11", "W1"),
)
def spearman_rho_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    qr = li.groupBy(F.col("l_quantity").alias("q")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # quantity side through the same two-stage prefix as the price side
    # (<=50 distinct values makes ANY form cheap; using global_cumsum
    # here keeps the module's no-single-partition-window claim total)
    qr2 = _with_cum_before(qr, F.col("q"), "q", "c").select(
        "q",
        (2 * F.col("cum_before") + F.col("c") + 1).alias("r2x"),
    )
    pr = li.groupBy(F.col("l_extendedprice").alias("p")).agg(
        F.count(F.lit(1)).alias("c")
    )
    pr2 = _with_cum_before(
        pr, F.floor(F.col("p") / 1000.0), "p", "c"
    ).select("p", (2 * F.col("cum_before") + F.col("c") + 1).alias("r2y"))
    j = (
        li.join(F.broadcast(qr2), li.l_quantity == qr2.q)
        .join(pr2, li.l_extendedprice == pr2.p)
        .select("r2x", "r2y")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r2x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("r2y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("r2x").cast("decimal(38,0)") * F.col("r2x")).alias("sxx"),
        F.sum(F.col("r2y").cast("decimal(38,0)") * F.col("r2y")).alias("syy"),
        F.sum(F.col("r2x").cast("decimal(38,0)") * F.col("r2y")).alias("sxy"),
    )
    return m.selectExpr(
        "n AS n_rows",
        "ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho_spearman",
    )


_ACF_LAGS = (1, 2, 3, 7, 14)


@register(
    "ts_acf_lags",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders GROUP BY o_orderdate
    ), lagged AS (
        SELECT x,
               lag(x, 1) OVER (ORDER BY d) AS xl1,
               lag(x, 2) OVER (ORDER BY d) AS xl2,
               lag(x, 3) OVER (ORDER BY d) AS xl3,
               lag(x, 7) OVER (ORDER BY d) AS xl7,
               lag(x, 14) OVER (ORDER BY d) AS xl14
        FROM daily
    ), m AS (
        SELECT CAST(COUNT(x) AS BIGINT) AS n, SUM(x) AS sx,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * xl1) AS a1,
               SUM(CASE WHEN xl1 IS NOT NULL THEN x END) AS b1,
               SUM(xl1) AS c1, CAST(COUNT(xl1) AS BIGINT) AS n1,
               SUM(CAST(x AS HUGEINT) * xl2) AS a2,
               SUM(CASE WHEN xl2 IS NOT NULL THEN x END) AS b2,
               SUM(xl2) AS c2, CAST(COUNT(xl2) AS BIGINT) AS n2,
               SUM(CAST(x AS HUGEINT) * xl3) AS a3,
               SUM(CASE WHEN xl3 IS NOT NULL THEN x END) AS b3,
               SUM(xl3) AS c3, CAST(COUNT(xl3) AS BIGINT) AS n3,
               SUM(CAST(x AS HUGEINT) * xl7) AS a7,
               SUM(CASE WHEN xl7 IS NOT NULL THEN x END) AS b7,
               SUM(xl7) AS c7, CAST(COUNT(xl7) AS BIGINT) AS n7,
               SUM(CAST(x AS HUGEINT) * xl14) AS a14,
               SUM(CASE WHEN xl14 IS NOT NULL THEN x END) AS b14,
               SUM(xl14) AS c14, CAST(COUNT(xl14) AS BIGINT) AS n14
        FROM lagged
    ), mu AS (
        SELECT *, CAST(sx AS DOUBLE) / n AS mu,
               CAST(sxx AS DOUBLE) AS sxxd
        FROM m
    )
    SELECT 1 AS lag, n1 AS n_pairs,
           ROUND((CAST(a1 AS DOUBLE)
                  - mu * (CAST(b1 AS DOUBLE) + CAST(c1 AS DOUBLE))
                  + CAST(n1 AS DOUBLE) * mu * mu)
                 / (sxxd - CAST(n AS DOUBLE) * mu * mu), 6) AS acf
    FROM mu
    UNION ALL
    SELECT 2, n2,
           ROUND((CAST(a2 AS DOUBLE)
                  - mu * (CAST(b2 AS DOUBLE) + CAST(c2 AS DOUBLE))
                  + CAST(n2 AS DOUBLE) * mu * mu)
                 / (sxxd - CAST(n AS DOUBLE) * mu * mu), 6)
    FROM mu
    UNION ALL
    SELECT 3, n3,
           ROUND((CAST(a3 AS DOUBLE)
                  - mu * (CAST(b3 AS DOUBLE) + CAST(c3 AS DOUBLE))
                  + CAST(n3 AS DOUBLE) * mu * mu)
                 / (sxxd - CAST(n AS DOUBLE) * mu * mu), 6)
    FROM mu
    UNION ALL
    SELECT 7, n7,
           ROUND((CAST(a7 AS DOUBLE)
                  - mu * (CAST(b7 AS DOUBLE) + CAST(c7 AS DOUBLE))
                  + CAST(n7 AS DOUBLE) * mu * mu)
                 / (sxxd - CAST(n AS DOUBLE) * mu * mu), 6)
    FROM mu
    UNION ALL
    SELECT 14, n14,
           ROUND((CAST(a14 AS DOUBLE)
                  - mu * (CAST(b14 AS DOUBLE) + CAST(c14 AS DOUBLE))
                  + CAST(n14 AS DOUBLE) * mu * mu)
                 / (sxxd - CAST(n AS DOUBLE) * mu * mu), 6)
    FROM mu
    ORDER BY lag
    """,
    doc="Autocorrelation of the daily order-revenue series at lags "
    "1/2/3/7/14 (observation-space lags over the date-ordered series). "
    "Daily totals are exact integer cents; the per-lag cross sums and "
    "the global moments are HUGEINT/DECIMAL(38,0), so each r_k is one "
    "deterministic float formula (standard biased estimator, global "
    "mean) over exact integers. Scale shape: one date-keyed shuffle "
    "aggregates the fact; every window/aggregate after that runs on "
    "the O(#days) series — day cardinality is time-bounded, not "
    "data-volume-bounded, so the unpartitioned lag window is safe at "
    "any scale.",
    tags=("timeseries", "stats", "A7", "W1"),
)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "x", *[F.lag("x", k).over(w).alias(f"xl{k}") for k in _ACF_LAGS]
    )
    aggs = [
        F.count("x").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    ]
    for k in _ACF_LAGS:
        aggs += [
            F.sum(F.col("x").cast("decimal(38,0)") * F.col(f"xl{k}")).alias(
                f"a{k}"
            ),
            F.sum(
                F.when(F.col(f"xl{k}").isNotNull(), F.col("x"))
            ).alias(f"b{k}"),
            F.sum(f"xl{k}").alias(f"c{k}"),
            F.count(f"xl{k}").cast("bigint").alias(f"n{k}"),
        ]
    m = lagged.agg(*aggs)
    mu = m.selectExpr(
        "*", "CAST(sx AS DOUBLE) / n AS mu", "CAST(sxx AS DOUBLE) AS sxxd"
    )
    acf_cols = []
    for k in _ACF_LAGS:
        acf_cols.append(
            f"ROUND((CAST(a{k} AS DOUBLE)"
            f" - mu * (CAST(b{k} AS DOUBLE) + CAST(c{k} AS DOUBLE))"
            f" + CAST(n{k} AS DOUBLE) * mu * mu)"
            f" / (sxxd - CAST(n AS DOUBLE) * mu * mu), 6) AS acf{k}"
        )
    scored = mu.selectExpr("*", *acf_cols)
    return scored.selectExpr(
        "stack(5, "
        + ", ".join(f"{k}, n{k}, acf{k}" for k in _ACF_LAGS)
        + ") AS (lag, n_pairs, acf)"
    ).orderBy("lag")


@register(
    "ks_two_sample",
    oracle="""
    WITH vals AS (
        SELECT value,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS cb
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        GROUP BY value
    ), cums AS (
        SELECT value,
               SUM(ca) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_a,
               SUM(cb) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_b
        FROM vals
    ), tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(cb) AS BIGINT) AS n_b
        FROM vals
    ), diffs AS (
        SELECT value,
               ABS(CAST(cum_a AS DOUBLE) / n_a
                   - CAST(cum_b AS DOUBLE) / n_b) AS d
        FROM cums CROSS JOIN tot
    )
    SELECT n_a AS n_click, n_b AS n_purchase,
           ROUND(d, 6) AS ks_d,
           value AS at_value,
           ROUND(d * SQRT(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 6)
               AS ks_stat
    FROM diffs CROSS JOIN tot
    ORDER BY d DESC, value
    LIMIT 1
    """,
    doc="Two-sample Kolmogorov-Smirnov test (click vs purchase event "
    "values): D = max |F_a(v) - F_b(v)| over the union of observed "
    "values, plus the sqrt(n_a n_b / (n_a + n_b))-scaled statistic — "
    "the distribution-shape complement to the Mann-Whitney location "
    "test (KS also catches equal-median/different-spread shifts). "
    "ECDFs come from cumulative counts at the DISTINCT-VALUE level "
    "(the same two-stage distributed prefix as the rank tests — "
    "global_cumsum, multi-column form); cross-row MAX is "
    "order-independent, and the argmax "
    "value is pinned by (d DESC, value). Scale shape: one distinct-"
    "value shuffle, tiny bucket frame, one broadcast total — raw "
    "events never enter a window.",
    tags=("stats", "experiment", "A11", "W1"),
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    vals = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "ca"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("cb"),
    )
    # inclusive cumulative counts for BOTH groups via ONE two-stage
    # distributed prefix (multi-column global_cumsum: one range
    # shuffle, one checkpoint, one offsets join — module docstring).
    cums = global_cumsum(
        vals, [F.col("value")], ["ca", "cb"], ["cum_a", "cum_b"]
    ).select("value", "cum_a", "cum_b")
    tot = vals.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    diffs = cums.crossJoin(F.broadcast(tot)).select(
        "value",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a").cast("double") / F.col("n_a")
            - F.col("cum_b").cast("double") / F.col("n_b")
        ).alias("d"),
    )
    return (
        diffs.orderBy(F.desc("d"), "value")
        .limit(1)
        .selectExpr(
            "n_a AS n_click",
            "n_b AS n_purchase",
            "ROUND(d, 6) AS ks_d",
            "value AS at_value",
            "ROUND(d * SQRT(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 6)"
            " AS ks_stat",
        )
    )


@register(
    "anova_f_groups",
    oracle="""
    WITH pts AS (
        SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
               SUM(y) AS s_g, SUM(CAST(y AS HUGEINT) * y) AS ss_g
        FROM pts GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n, SUM(s_g) AS s,
               SUM(ss_g) AS ss, CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ), terms AS (
        SELECT list(CAST(ss_g * n_g - CAST(s_g AS HUGEINT) * s_g
                         AS DOUBLE) / n_g
                    ORDER BY event_type) AS w_terms
        FROM g
    ), folded AS (
        SELECT list_reduce(w_terms, (x, y) -> x + y) AS ssw FROM terms
    ), parts AS (
        SELECT k, n,
               CAST(ss * n - CAST(s AS HUGEINT) * s AS DOUBLE) / n - ssw
                   AS ssb,
               ssw
        FROM folded CROSS JOIN tot
    )
    SELECT k AS n_groups, n AS n_rows,
           ssb AS ss_between,
           ssw AS ss_within,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat
    FROM parts
    """,
    doc="One-way ANOVA F statistic for event value across the five event "
    "types — completing the hypothesis-testing battery (z-test for "
    "proportions, Mann-Whitney for location, KS for shape, chi-square "
    "for association, F for multi-group means). Determinism is the "
    "hard part: each group's within-SS is the EXACT integer numerator "
    "ss_g*n_g - s_g^2 over one division, the k terms fold SEQUENTIALLY "
    "via an ordered-array reduce (plain k-element SUMs and even "
    "windowed cumulative sums differ in the last ulp across engines — "
    "DuckDB accumulates window sums pairwise — and the between-SS "
    "cancellation amplifies that ulp), and total SS uses the same "
    "exact-numerator form. One groupBy(event_type) pass over the "
    "fact; k-row math after. The sufficient statistics merge across "
    "partitions, so the F test is incrementally maintainable.",
    tags=("stats", "experiment", "A7", "A11"),
)
def anova_f_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    pts = ev.selectExpr(
        "event_type", "CAST(FLOOR(value * 100) AS BIGINT) AS y"
    )
    g = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s_g"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("ss_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    terms = g.selectExpr(
        "event_type",
        "CAST(ss_g * n_g - s_g * s_g AS DOUBLE) / n_g AS w_term",
    )
    folded = terms.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list("
            "struct(event_type, w_term))), p -> p.w_term), "
            "CAST(0.0 AS DOUBLE), (x, y) -> x + y)"
        ).alias("ssw")
    )
    parts = folded.crossJoin(F.broadcast(tot)).selectExpr(
        "k",
        "n",
        "CAST(ss * n - s * s AS DOUBLE) / n - ssw AS ssb",
        "ssw",
    )
    return parts.selectExpr(
        "k AS n_groups",
        "n AS n_rows",
        # raw doubles: both engines produce bit-identical values, and
        # engine-side ROUND diverges above 2^52 (DuckDB rounds doubles
        # via a scaled float multiply; Spark via exact BigDecimal) — the
        # harness's own 6dp canonicalization compares them safely.
        "ssb AS ss_between",
        "ssw AS ss_within",
        "ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat",
    )


@register(
    "stump_best_split",
    oracle="""
    WITH pts AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE value IS NOT NULL
    ), vals AS (
        SELECT value, CAST(SUM(pos) AS BIGINT) AS cp,
               CAST(SUM(1 - pos) AS BIGINT) AS cn
        FROM pts GROUP BY value
    ), cums AS (
        SELECT value,
               SUM(cp) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lp,
               SUM(cn) OVER (ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ln_
        FROM vals
    ), tot AS (
        SELECT CAST(SUM(cp) AS BIGINT) AS p, CAST(SUM(cn) AS BIGINT) AS q
        FROM vals
    ), scored AS (
        SELECT value, lp, ln_, p, q,
               (CAST(lp + ln_ AS DOUBLE) / (p + q))
               * (1.0 - (CAST(lp AS DOUBLE) / (lp + ln_))
                        * (CAST(lp AS DOUBLE) / (lp + ln_))
                      - (CAST(ln_ AS DOUBLE) / (lp + ln_))
                        * (CAST(ln_ AS DOUBLE) / (lp + ln_)))
               + (CAST(p - lp + q - ln_ AS DOUBLE) / (p + q))
               * (1.0 - (CAST(p - lp AS DOUBLE) / (p - lp + q - ln_))
                        * (CAST(p - lp AS DOUBLE) / (p - lp + q - ln_))
                      - (CAST(q - ln_ AS DOUBLE) / (p - lp + q - ln_))
                        * (CAST(q - ln_ AS DOUBLE) / (p - lp + q - ln_)))
                   AS gini_split
        FROM cums CROSS JOIN tot
        WHERE lp + ln_ < p + q
    )
    , best AS (
        SELECT * FROM scored ORDER BY gini_split, value LIMIT 1
    )
    SELECT p + q AS n_rows, p AS n_pos, value AS best_value,
           lp + ln_ AS n_left, p + q - lp - ln_ AS n_right,
           ROUND(1.0 - (CAST(p AS DOUBLE) / (p + q))
                       * (CAST(p AS DOUBLE) / (p + q))
                     - (CAST(q AS DOUBLE) / (p + q))
                       * (CAST(q AS DOUBLE) / (p + q)), 6) AS gini_parent,
           ROUND(gini_split, 6) AS gini_split,
           ROUND(1.0 - (CAST(p AS DOUBLE) / (p + q))
                       * (CAST(p AS DOUBLE) / (p + q))
                     - (CAST(q AS DOUBLE) / (p + q))
                       * (CAST(q AS DOUBLE) / (p + q))
                 - gini_split, 6) AS gini_gain
    FROM best
    """,
    doc="Distributed decision-stump learner: the best threshold on the "
    "value column for predicting purchase vs other, by weighted Gini "
    "impurity — the inner loop of every tree/GBM trainer, expressed "
    "as a query. Candidate splits are the distinct values; left/right "
    "class counts at EVERY candidate come from one cumulative count "
    "pass (the two-stage distributed prefix, global_cumsum — this is "
    "exactly how distributed tree learners scan thresholds without "
    "re-partitioning per candidate). Impurities are per-row float "
    "expressions over exact integers; the argmin is pinned on "
    "(RAW impurity, value) — ordered BEFORE rounding on both engines, "
    "since an outer ORDER BY would resolve to the rounded output alias "
    "in SQL and tie-break differently. Scale shape: one distinct-value "
    "shuffle + a "
    "tiny bucket frame; candidate evaluation never touches raw rows.",
    tags=("stats", "eval", "A11", "W1", "O3"),
)
def stump_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    pts = ev.selectExpr(
        "value",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos",
    )
    vals = pts.groupBy("value").agg(
        F.sum("pos").cast("bigint").alias("cp"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("cn"),
    )
    # left-side class counts at EVERY candidate split via ONE two-stage
    # distributed prefix (multi-column global_cumsum).
    cums = global_cumsum(
        vals, [F.col("value")], ["cp", "cn"], ["lp", "ln_"]
    ).select("value", "lp", "ln_")
    tot = vals.agg(
        F.sum("cp").cast("bigint").alias("p"),
        F.sum("cn").cast("bigint").alias("q"),
    )
    scored = (
        cums.crossJoin(F.broadcast(tot))
        .filter(F.expr("lp + ln_ < p + q"))
        .selectExpr(
            "value",
            "lp",
            "ln_",
            "p",
            "q",
            "(CAST(lp + ln_ AS DOUBLE) / (p + q))"
            " * (1.0 - (CAST(lp AS DOUBLE) / (lp + ln_))"
            " * (CAST(lp AS DOUBLE) / (lp + ln_))"
            " - (CAST(ln_ AS DOUBLE) / (lp + ln_))"
            " * (CAST(ln_ AS DOUBLE) / (lp + ln_)))"
            " + (CAST(p - lp + q - ln_ AS DOUBLE) / (p + q))"
            " * (1.0 - (CAST(p - lp AS DOUBLE) / (p - lp + q - ln_))"
            " * (CAST(p - lp AS DOUBLE) / (p - lp + q - ln_))"
            " - (CAST(q - ln_ AS DOUBLE) / (p - lp + q - ln_))"
            " * (CAST(q - ln_ AS DOUBLE) / (p - lp + q - ln_)))"
            " AS gini_split",
        )
    )
    return (
        scored.orderBy("gini_split", "value")
        .limit(1)
        .selectExpr(
            "p + q AS n_rows",
            "p AS n_pos",
            "value AS best_value",
            "lp + ln_ AS n_left",
            "p + q - lp - ln_ AS n_right",
            "ROUND(1.0 - (CAST(p AS DOUBLE) / (p + q))"
            " * (CAST(p AS DOUBLE) / (p + q))"
            " - (CAST(q AS DOUBLE) / (p + q))"
            " * (CAST(q AS DOUBLE) / (p + q)), 6) AS gini_parent",
            "ROUND(gini_split, 6) AS gini_split",
            "ROUND(1.0 - (CAST(p AS DOUBLE) / (p + q))"
            " * (CAST(p AS DOUBLE) / (p + q))"
            " - (CAST(q AS DOUBLE) / (p + q))"
            " * (CAST(q AS DOUBLE) / (p + q))"
            " - gini_split, 6) AS gini_gain",
        )
    )


@register(
    "trimmed_mean_exact",
    oracle="""
    WITH pts AS (
        SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ), vals AS (
        SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pts GROUP BY cents
    ), cums AS (
        SELECT cents, cnt,
               SUM(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               COALESCE(SUM(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM vals
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) // 10
                   AS k
        FROM vals
    ), incl AS (
        SELECT cents,
               GREATEST(CAST(0 AS HUGEINT),
                        LEAST(cum, n - k) - GREATEST(cum_before, k))
                   AS cnt_incl
        FROM cums CROSS JOIN tot
    )
    SELECT n AS n_rows, k AS n_trimmed_each_side,
           CAST(n - 2 * k AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(cnt_incl * cents) AS DOUBLE)
                 / (100.0 * (n - 2 * k)), 6) AS trimmed_mean
    FROM incl CROSS JOIN tot
    GROUP BY n, k
    """,
    doc="Exact 10%-two-sided trimmed mean of event value — the robust "
    "location estimate (drop the k lowest and k highest ROWS, k = "
    "n/10) computed WITHOUT any global sort: per distinct value, the "
    "kept-row count is the overlap of the value's rank interval "
    "[cum_before, cum) with the kept interval [k, n-k) — "
    "max(0, min(cum, n-k) - max(cum_before, k)) — which handles "
    "tie groups straddling either cut with zero special-casing. "
    "Cumulative ranks come from the two-stage distributed prefix "
    "(global_cumsum); every quantity is an exact integer until the single "
    "final division. Scale shape: one distinct-value shuffle, no "
    "global sort, no per-row rank.",
    tags=("stats", "A11", "W1"),
)
def trimmed_mean_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    pts = ev.selectExpr("CAST(FLOOR(value * 100) AS BIGINT) AS cents")
    vals = pts.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # rank intervals per distinct value via the two-stage distributed
    # prefix (global_cumsum): cum inclusive, cum_before = cum - cnt.
    cums = global_cumsum(vals, [F.col("cents")], "cnt", "cum").select(
        "cents",
        "cnt",
        "cum",
        (F.col("cum") - F.col("cnt")).alias("cum_before"),
    )
    tot = vals.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr("CAST(SUM(cnt) AS BIGINT) DIV 10").alias("k"),
    )
    incl = cums.crossJoin(F.broadcast(tot)).selectExpr(
        "cents",
        "n",
        "k",
        "GREATEST(CAST(0 AS BIGINT),"
        " LEAST(cum, n - k) - GREATEST(cum_before, k)) AS cnt_incl",
    )
    return incl.groupBy("n", "k").agg(
        F.sum(F.col("cnt_incl").cast("decimal(38,0)") * F.col("cents")).alias(
            "_s"
        )
    ).selectExpr(
        "n AS n_rows",
        "k AS n_trimmed_each_side",
        "CAST(n - 2 * k AS BIGINT) AS n_kept",
        "ROUND(CAST(_s AS DOUBLE) / (100.0 * (n - 2 * k)), 6)"
        " AS trimmed_mean",
    )


@register(
    "kendall_tau_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS discordant
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    tx AS (
        SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n1
        FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)
    ),
    ty AS (
        SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n2
        FROM (SELECT COUNT(*) AS t FROM daily GROUP BY y)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
    SELECT nn.n AS n_days, p.concordant, p.discordant, tx.n1 AS ties_x_pairs,
           ty.n2 AS ties_y_pairs,
           ROUND(CAST(p.concordant - p.discordant AS DOUBLE)
                 / sqrt(CAST((nn.n * (nn.n - 1) / 2 - tx.n1) AS DOUBLE)
                        * CAST((nn.n * (nn.n - 1) / 2 - ty.n2) AS DOUBLE)),
                 6) AS tau_b
    FROM pairs p, tx, ty, nn
    """,
    doc="Kendall tau-b rank correlation between two integer daily series "
    "(orders per day, distinct customers per day). Everything up to the "
    "final statistic is exact int64: concordant/discordant pair counts "
    "over the day-level aggregate, tie corrections n1/n2 from per-value "
    "group sizes (no pair join needed for ties), tau_b = (C-D)/"
    "sqrt((n0-n1)(n0-n2)) computed once from bit-identical integers "
    "(products < 2^53, exact in double). Scale shape: the raw fact "
    "aggregates to calendar-bounded daily rows FIRST; the O(n^2) pair "
    "stage runs on that bounded frame via a broadcast nested-loop "
    "self-join (~2.9M cheap comparisons at n=2400 days) — for an "
    "unbounded pairing key, swap in the merge-sort inversion count "
    "(O(n log n)) the same aggregate feeds.",
    tags=("stats", "rank"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.countDistinct("o_custkey").cast("bigint").alias("y"),
        )
    )
    a = daily.select(
        F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    sgn = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    pairs = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(F.when(sgn > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("concordant"),
            F.sum(F.when(sgn < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("discordant"),
        )
    )
    n1 = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) div 2")).cast("bigint").alias("n1")
        )
    )
    n2 = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) div 2")).cast("bigint").alias("n2")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    n0 = F.expr("n * (n - 1) div 2")
    return (
        pairs.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").alias("n_days"),
            "concordant",
            "discordant",
            F.col("n1").alias("ties_x_pairs"),
            F.col("n2").alias("ties_y_pairs"),
            F.round(
                (F.col("concordant") - F.col("discordant")).cast("double")
                / F.sqrt(
                    (n0 - F.col("n1")).cast("double")
                    * (n0 - F.col("n2")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )
