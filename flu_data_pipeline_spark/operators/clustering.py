"""Iterative clustering (Lloyd's k-means) as a Spark-first operator.

The reference class for "iterative algorithm on a distributed engine":
each iteration is one declarative assignment+aggregation pass; the only
driver-side data is the k×dim centroid matrix (collected per iteration —
k·dim doubles, NOT a hot-path collect), re-broadcast into the next pass
as literal arrays, exactly how MLlib's own KMeans drives Lloyd's.

Determinism contract (so a SQL oracle can replay it bit-for-bit):
- init = embeddings of the k smallest ids, components rounded to 6dp;
- distance = left-fold of (x_i - c_i)^2 in array order, double math;
- argmin ties break to the lowest cluster index;
- new centroids = per-dimension AVG rounded to 6dp in-engine (rounding
  quashes ulp-level sum-order differences between engines/partitionings);
- empty clusters keep their previous centroid.

Scale notes (100 TB): centroids travel as a k-row BROADCAST DataFrame —
the assignment plan contains ONE distance-fold expression regardless of
k (a per-centroid literal-array formulation was tried first and spent
~7 s/iteration in plan analysis at k=8; it also caps k at what the
expression tree tolerates). Per pass: broadcast-nested-loop against k
rows (map-only), per-row argmin via min(struct(dist, cluster)) — a
partial-aggregating groupBy on the id — then one groupBy(cluster, dim)
average. Iterations add passes, not shuffled state; only the k×dim
centroid matrix ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def sqdist(vec: Column, centroid: Column) -> Column:
    """Σ (x_i - c_i)² as a native left-fold in array order (double math)."""
    return F.aggregate(
        F.zip_with(
            vec,
            centroid,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def centroid_df(spark: SparkSession, centroids: list[list[float]]):
    """k-row (cluster, c) DataFrame from a centroid matrix."""
    return spark.createDataFrame(
        [(ci, [float(x) for x in c]) for ci, c in enumerate(centroids)],
        "cluster int, c array<double>",
    )


def assign_best(
    df: DataFrame, vec_col: str, id_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, cluster, dist) of the nearest centroid per row. Ties go to the
    lowest cluster index: min over struct(dist, cluster) is lexicographic,
    identical to the oracle's ``ORDER BY dist, cluster`` pick."""
    spark = df.sparkSession
    cdf = centroid_df(spark, centroids)
    return (
        df.select(id_col, vec_col)
        .join(F.broadcast(cdf))
        .select(
            id_col,
            "cluster",
            sqdist(F.col(vec_col), F.col("c")).alias("dist"),
        )
        .groupBy(id_col)
        .agg(F.min(F.struct("dist", "cluster")).alias("best"))
        .select(
            id_col,
            F.col("best.cluster").alias("cluster"),
            F.col("best.dist").alias("dist"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
    round_dp: int = 6,
    init_every: int | None = None,
) -> list[list[float]]:
    """Run ``iters`` Lloyd iterations; returns the centroid matrix.

    Deterministic init, two modes:
    - default: the ``k`` rows with the smallest ids;
    - ``init_every=s``: every row with ``id % s == 0`` — k then GROWS
      WITH THE CORPUS (k ≈ N/s), the data-adaptive form SemDeDup-style
      cluster-bounded algorithms need (fixed k makes within-cluster
      pair work quadratic in N). The modular rule keeps the init
      expressible as a static WHERE clause in the SQL oracle, where a
      data-dependent LIMIT could not be.

    Components rounded to ``round_dp``. Each iteration collects exactly
    k·dim rounded doubles to the driver (the centroid matrix) — the
    canonical Spark iterative-algorithm shape.
    """
    init = (
        df.filter((F.col(id_col) % init_every) == 0)
        if init_every is not None
        else df.orderBy(id_col).limit(k)
    )
    init_rows = (
        init.orderBy(id_col)
        .select(F.transform(vec_col, lambda x: F.round(x.cast("double"), round_dp)).alias("c"))
        .collect()
    )
    centroids = [list(r["c"]) for r in init_rows]
    k = len(centroids)  # actual count (init_every mode derives it from data)
    for _ in range(iters):
        best = assign_best(df, vec_col, id_col, centroids)
        new = (
            df.join(best.select(id_col, "cluster"), id_col)
            .select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg(F.col("x").cast("double")), round_dp).alias("av"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["av"]
        centroids = [
            [by_cluster[ci][d] for d in range(len(centroids[ci]))]
            if ci in by_cluster
            else centroids[ci]  # empty cluster keeps previous centroid
            for ci in range(k)
        ]
    return centroids


# --------------------------------------------------------------------------
# Unrolled DuckDB oracle: the same iterations as plain SQL CTE chain
# --------------------------------------------------------------------------

_SQDIST_SQL = (
    "list_reduce(list_transform(range(1, {dim} + 1), "
    "i -> (CAST({v}[i] AS DOUBLE) - {c}[i]) * (CAST({v}[i] AS DOUBLE) - {c}[i])), "
    "(x, y) -> x + y)"
)


def kmeans_oracle_sql(
    table: str,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    round_dp: int = 6,
    init_every: int | None = None,
) -> str:
    """DuckDB CTE chain replaying :func:`kmeans_fit` exactly: same init
    (``init_every`` selects the modular-id adaptive-k mode), same fold
    order, same tie-break (ORDER BY dist, cluster), same 6dp centroid
    rounding, same empty-cluster carry-over. Yields the final
    per-vector assignment as ``asg{iters}(id, cluster, dist)``."""
    sq = _SQDIST_SQL
    init_src = (
        f"(SELECT * FROM {table} WHERE {id_col} % {init_every} = 0)"
        if init_every is not None
        else f"(SELECT * FROM {table} ORDER BY {id_col} LIMIT {k})"
    )
    parts = [
        f"""c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cluster,
               list_transform({vec_col},
                              x -> round(CAST(x AS DOUBLE), {round_dp})) AS c
        FROM {init_src}
    )"""
    ]
    for it in range(iters):
        dist = sq.format(dim=dim, v=f"e.{vec_col}", c=f"c{it}.c")
        parts.append(f"""asg{it + 1} AS (
        SELECT e.{id_col} AS id, c{it}.cluster, {dist} AS dist
        FROM {table} e CROSS JOIN c{it}
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY e.{id_col} ORDER BY {dist}, c{it}.cluster) = 1
    )""")
        if it + 1 < iters:
            parts.append(f"""avg{it + 1} AS (
        SELECT a.cluster, t.i,
               round(AVG(CAST(e.{vec_col}[t.i] AS DOUBLE)), {round_dp}) AS av
        FROM asg{it + 1} a
        JOIN {table} e ON e.{id_col} = a.id
        CROSS JOIN (SELECT unnest(range(1, {dim} + 1)) AS i) t
        GROUP BY a.cluster, t.i
    )""")
            parts.append(f"""c{it + 1} AS (
        SELECT p.cluster,
               COALESCE(n.c, p.c) AS c
        FROM c{it} p LEFT JOIN (
            SELECT cluster, list(av ORDER BY i) AS c
            FROM avg{it + 1} GROUP BY cluster
        ) n ON n.cluster = p.cluster
    )""")
    return "WITH " + ",\n    ".join(parts)
