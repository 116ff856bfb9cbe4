"""Subquery surface: EXISTS / NOT EXISTS / IN / scalar subqueries.

The reference has no subqueries (its four report SQLs are flat joins —
api/app.py:215-378), but a complete SQL engine surface needs them. Each
query here goes through ``spark.sql`` deliberately: the value of this
module is Catalyst's *decorrelation* — EXISTS/IN rewrite to left-semi
joins, NOT EXISTS to left-anti, correlated scalar subqueries to a
left-outer aggregate join (RewritePredicateSubquery /
RewriteCorrelatedScalarSubquery). At 100 TB these rewrites are the
difference between a hash join and a per-row re-scan; expressing the
query declaratively gets them for free.

Float policy per registry docstring: SUMs rounded 2dp in-query both
sides; counts cast BIGINT in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Register ``name`` as temp view ``sq_<name>`` (idempotent) and return
    the view name — lets the SQL text stay engine-portable."""
    view = f"sq_{name}"
    load_table(spark, sf_dir, name).createOrReplaceTempView(view)
    return view


@register(
    "subq_exists_late_ship",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Correlated EXISTS (TPC-H Q4 shape): orders having any line "
    "shipped >60 days after order date, counted per priority. Catalyst "
    "rewrites to a left-semi hash join on o_orderkey with the date "
    "predicate as join condition — no per-row subquery execution.",
    tags=("subquery", "J7"),
    bench=True,
)
def subq_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _view(spark, sf_dir, "orders")
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM {o} o
        WHERE EXISTS (
            SELECT 1 FROM {li} l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "subq_not_exists_idle",
    oracle="""
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_idle
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc="NOT EXISTS with an extra predicate → left-anti join: customers "
    "with no large order (>300k), per market segment. Column pruning "
    "keeps the anti-join build side to the two referenced columns.",
    tags=("subquery", "J7", "D3"),
)
def subq_not_exists_idle(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c.c_mktsegment, COUNT(*) AS n_idle
        FROM {c} c
        WHERE NOT EXISTS (
            SELECT 1 FROM {o} o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


@register(
    "subq_in_segment",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Uncorrelated IN subquery → left-semi join against the filtered "
    "customer keys; the mktsegment filter is pushed to the customer "
    "scan before the join build.",
    tags=("subquery", "J7"),
)
def subq_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _view(spark, sf_dir, "orders")
    c = _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM {o}
        WHERE o_custkey IN (
            SELECT c_custkey FROM {c} WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@register(
    "subq_scalar_halfavg",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
    doc="Correlated scalar AVG subquery (TPC-H Q17 shape): lines of one "
    "brand with below-half-average quantity for their part. Catalyst "
    "decorrelates to a per-part aggregate joined back — one shuffle on "
    "partkey instead of a re-scan per outer row. The half-average "
    "threshold is exact across engines (quantities are small integers; "
    "their double sum is order-independent).",
    tags=("subquery", "A7"),
)
def subq_scalar_halfavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _view(spark, sf_dir, "lineitem")
    p = _view(spark, sf_dir, "part")
    return spark.sql(
        f"""
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM {li} l
        JOIN {p} p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
          AND l.l_quantity < (
              SELECT 0.5 * AVG(l2.l_quantity) FROM {li} l2
              WHERE l2.l_partkey = p.p_partkey
          )
        """
    )


@register(
    "subq_scalar_per_nation",
    oracle="""
    SELECT n.n_name AS nation,
           (SELECT ROUND(MAX(s.s_acctbal), 6) FROM supplier s
            WHERE s.s_nationkey = n.n_nationkey) AS max_acctbal
    FROM nation n
    ORDER BY n.n_name
    """,
    doc="Correlated scalar subquery in the projection: each nation's max "
    "supplier balance (null for supplier-less nations — the left-outer "
    "aggregate join the rewrite produces preserves them).",
    tags=("subquery", "A7"),
)
def subq_scalar_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _view(spark, sf_dir, "nation")
    s = _view(spark, sf_dir, "supplier")
    return spark.sql(
        f"""
        SELECT n.n_name AS nation,
               (SELECT ROUND(MAX(s.s_acctbal), 6) FROM {s} s
                WHERE s.s_nationkey = n.n_nationkey) AS max_acctbal
        FROM {n} n
        ORDER BY n.n_name
        """
    )


@register(
    "subq_above_global_avg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_above
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery: orders above the global average "
    "price. The single-row aggregate is computed once and broadcast "
    "into the filter (no join). Boundary note: prices carry 2 decimals "
    "while the mean has ~15 significant digits, so a cross-engine ulp "
    "difference cannot flip the comparison.",
    tags=("subquery", "A7"),
)
def subq_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT COUNT(*) AS n_above
        FROM {o}
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM {o})
        """
    )


@register(
    "subq_multi_exists_waiting",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape (waiting-supplier): EXISTS and NOT EXISTS over "
    "the same fact in one query — the NOT EXISTS correlates on two "
    "outer relations (l1's orderkey and o's orderdate). Catalyst plans "
    "the pair as a left-semi join stacked on a left-anti join, both on "
    "orderkey, reusing the exchange; the adversarial case for "
    "decorrelation since a naive engine re-scans lineitem per row. "
    "Top-10 pinned by (numwait DESC, name).",
    tags=("subquery", "J7", "A7", "O3"),
)
def subq_multi_exists_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _view(spark, sf_dir, "supplier")
    li = _view(spark, sf_dir, "lineitem")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM {s} s
        JOIN {li} l1 ON s.s_suppkey = l1.l_suppkey
        JOIN {o} o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          AND EXISTS (
              SELECT 1 FROM {li} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM {li} l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
        """
    )


@register(
    "subq_max_revenue_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier view): per-supplier revenue "
    "aggregate compared against a scalar MAX over the same aggregate — "
    "Spark computes the CTE once and reuses it for both the join and "
    "the subquery (ReuseExchange), so the fact is scanned once. "
    "Revenue rounded 2dp before the equality so the max-comparison is "
    "exact cross-engine.",
    tags=("subquery", "A7"),
)
def subq_max_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _view(spark, sf_dir, "supplier")
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        WITH rev AS (
            SELECT l_suppkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
            FROM {li} GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM {s} s JOIN rev r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s.s_suppkey
        """
    )
