"""TPC-H gap battery: the classic warehouse query shapes not yet covered
by the registry (Q6, Q7, Q10, Q12, Q17, Q18, Q19, Q22 — Q1/Q3/Q4/Q5/Q8/
Q9/Q13/Q14/Q21 shapes already exist as pricing_summary, top_revenue_orders,
subq_exists_late_ship, regional_trade_revenue, market_share_by_year,
product_profit_by_nation, custdist_orders_per_customer, promo_revenue_share
and subq_multi_exists_waiting; Q2/Q11/Q16/Q20 need a partsupp table the
test data does not ship). Constants are adapted to the synthetic data's
value domains (nations NATION_0..24, brands Brand#N, dates 1995-2001).

These extend the reference's warehouse surface (SURVEY §2 extensions);
the reference itself has no multi-fact analytics beyond its four report
queries (api/app.py:120-260). Every plan is written for the 100 TB case:
aggregation pushed below joins where the grouping key determines the
join key, dimension sides broadcast explicitly, and filters placed so
they reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


def _rev4() -> Column:
    """Discounted line revenue, fixed-pointed to 4 decimals as int64.

    l_extendedprice has 2 decimal digits and l_discount 2, so
    extendedprice*(1-discount) has at most 4 — FLOOR(rev*1e4) of the
    bit-identical IEEE product is the exact value on both engines, and
    int64 sums are order-insensitive (promo_revenue_share idiom)."""
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000)
                         AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): pure scan-filter-"
    "aggregate with zero joins — the predicate-pushdown benchmark. All "
    "three predicates (date range, discount band, quantity cap) reach "
    "the parquet reader as PushedFilters, so row groups outside the "
    "ship-year are never decoded; the aggregate is a single partial→"
    "final sum with no shuffle of data rows (one row per task). The "
    "discount literals parse to identical doubles on both engines, so "
    "the BETWEEN is exact. Revenue is fixed-pointed per row "
    "(FLOOR(rev*1e4) of a bit-identical IEEE product) and summed as "
    "exact int64 — immune to float sum-order divergence between "
    "engines.",
    tags=("warehouse", "tpch", "P6", "A7"),
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev4 = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast(
        "long"
    )
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev4).cast("bigint") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                         AND DATE '1997-12-31'
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping between a nation pair): the "
    "join-ordering benchmark. The nation filter is applied to the TWO "
    "dimension paths BEFORE the fact joins — supplier and customer are "
    "each semi-reduced to the two nations by a broadcast of the 2-row "
    "filtered nation dim, so the big lineitem⋈orders join only carries "
    "rows that can still qualify. Supplier and the reduced customer "
    "side are broadcast; the only all-to-all shuffle is lineitem⋈orders "
    "on orderkey. The pair-disjunction is evaluated post-join on the "
    "two small nation name columns.",
    tags=("warehouse", "tpch", "J6", "A7", "A10"),
    bench=True,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*pair)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date").between("1996-01-01", "1997-12-31")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            (F.sum(_rev4()).cast("bigint") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    WITH rev AS (
        SELECT o.o_custkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS r4
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R'
          AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
        GROUP BY o.o_custkey
    )
    SELECT c.c_custkey, c.c_name, rev.r4 / 10000.0 AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
    FROM rev
    JOIN customer c ON c.c_custkey = rev.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY rev.r4 DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): top 20 customers by "
    "lost revenue in one quarter. The revenue aggregate runs BELOW the "
    "customer join — o_custkey determines the group, so the fact side "
    "shrinks to at most one row per customer before any dimension is "
    "touched; customer attributes and the nation name then attach via "
    "broadcast of the tiny aggregated side (a quarter of customers), "
    "never a shuffle of the customer table. Top-k compiles to "
    "TakeOrderedAndProject; ordering and ties are pinned on the exact "
    "int64 fixed-point revenue (custkey tiebreak), so a 1-ulp float "
    "divergence can never swap the rank-20 boundary.",
    tags=("warehouse", "tpch", "J6", "A7", "O2", "O3"),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev4()).cast("bigint").alias("r4"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        F.broadcast(rev)
        .join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            (F.col("r4") / 10000.0).alias("revenue"),
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
            F.col("r4"),
        )
        .orderBy(F.desc("r4"), F.asc("c_custkey"))
        .limit(20)
        .drop("r4")
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (shipping-mode priority, adapted: the synthetic "
    "lineitem has no l_shipmode, so the cohort split is late shipments "
    "— shipped >90 days after order — bucketed by line status). "
    "Conditional aggregation (SUM of CASE) folds both priority cohorts "
    "into ONE pass over the joined rows instead of two filtered "
    "subqueries; the only shuffle is the orderkey equi-join (the "
    "date inequality rides along as a post-join predicate on the "
    "already-matched pairs).",
    tags=("warehouse", "tpch", "J6", "A7"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH brand_lines AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) / 100.0 / 7.0 AS avg_yearly
    FROM (
        SELECT l_quantity, l_extendedprice,
               AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        FROM brand_lines
    )
    WHERE l_quantity < 0.5 * avg_qty
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue, adapted to the "
    "available part columns: brand filter only). The brand predicate "
    "reduces part to ~4% before anything touches the fact table, and "
    "that reduced dim broadcasts into lineitem — the correlated "
    "per-part average then runs as a window over ONLY the surviving "
    "~4% of lines (one shuffle of the filtered subset on partkey), "
    "not a full-table aggregate + re-join. Quantities are integral "
    "doubles, so sums and the avg division are exact IEEE ops on both "
    "engines and the 0.5*avg comparison cannot diverge on ulps.",
    tags=("warehouse", "tpch", "J6", "A7", "W1"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    )
    w = Window.partitionBy("l_partkey")
    return (
        brand_lines.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
                .cast("bigint")
                / 100.0
                / 7.0
            ).alias("avg_yearly"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(big.total_qty, 2) AS total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers): orders whose total "
    "line quantity exceeds 300. The HAVING aggregate runs first and is "
    "extremely selective (~0.3% of orders), so the surviving keys are "
    "broadcast into orders and the enriched result broadcast again "
    "into customer — after the one unavoidable lineitem shuffle on "
    "orderkey (map-side combined to one row per order), no further "
    "all-to-all movement happens at any scale where the filter stays "
    "selective. Top-100 by price compiles to TakeOrderedAndProject.",
    tags=("warehouse", "tpch", "J6", "A7", "A9", "O2"),
    bench=True,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "three OR'd brand/size/quantity conjunctions spanning both tables. "
    "The part-only implication of the disjunction (brand ∈ {12,23,34}) "
    "is applied as a pre-join filter — Catalyst cannot always derive "
    "this itself from a cross-table OR, so the plan states it "
    "explicitly, shrinking the broadcast dim ~8× before the hash join "
    "on partkey; the full disjunction then evaluates post-join. This "
    "is the textbook 'hoist the common implicate out of the OR' "
    "rewrite that keeps disjunctive star-joins broadcast-able at "
    "scale.",
    tags=("warehouse", "tpch", "J6", "A7", "P6"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    brands = ("Brand#12", "Brand#23", "Brand#34")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand").isin(*brands))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            (F.sum(_rev4()).cast("bigint") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    WITH cutoff AS (
        SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND CAST(o.o_orderdate AS DATE) >= DATE '1999-01-01'
      )
    GROUP BY n.n_name
    ORDER BY nation
    """,
    doc="TPC-H Q22 shape (global sales opportunity, adapted: the "
    "synthetic customer has no phone column, so the cohort is grouped "
    "by nation and 'dormant' means no order since 1999 instead of no "
    "order ever — this data has zero order-less customers). Three "
    "plan pieces, each shuffle-minimal: the positive-balance average "
    "is a 1-row broadcast scalar; the dormancy test is a left-anti "
    "join against orders pre-filtered to the recent window (the "
    "filter shrinks the anti side ~60% before the shuffle); the "
    "nation name attaches via broadcast. Catalyst pushes the "
    "acctbal > avg filter below the anti-join, so only rich "
    "customers shuffle at all.",
    tags=("warehouse", "tpch", "J7", "A7", "subquery"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cutoff = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("1999-01-01").cast("date")
    )
    nation = load_table(spark, sf_dir, "nation")
    rich = cust.crossJoin(F.broadcast(cutoff)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        recent.select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        dormant.join(F.broadcast(nation), dormant.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("nation")
    )
