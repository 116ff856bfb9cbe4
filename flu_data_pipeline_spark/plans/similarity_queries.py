"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Extension mandate (BASELINE.json): brute-force cosine top-k as the exact
baseline, plus near-dup pair detection. Dot products are computed natively
(``F.zip_with`` + ``F.aggregate`` — JVM-side fold over the array, no
Python). Elements are cast float→double *before* multiplying so Spark and
DuckDB follow the identical IEEE sequence (left fold in array order).

Scale path: brute force is O(Q×N) — fine when Q (queries) is small and N
is partitioned; the LSH-bucketed variant (random-hyperplane signatures via
the portable hash family) bounds candidate sets for large Q. See
``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a native left-fold (double accumulation, array order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB-side cosine between two list<float> columns, double math, left fold
def _cos_sql(a: str, b: str) -> str:
    d = (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )
    na = (
        f"sqrt(list_reduce(list_transform({a}, "
        f"v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))"
    )
    nb = (
        f"sqrt(list_reduce(list_transform({b}, "
        f"v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))"
    )
    return f"({d} / ({na} * {nb}))"


@register(
    "ann_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id, embedding FROM embeddings)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND({_cos_sql('q.embedding', 'c.embedding')}, 6) AS cos_sim
    FROM q JOIN c ON q.vec_id <> c.vec_id
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.vec_id
        ORDER BY {_cos_sql('q.embedding', 'c.embedding')} DESC, c.vec_id
    ) <= 5
    """,
    doc="Brute-force cosine top-5 for 5 query vectors: broadcast the tiny "
    "query side, scan candidates once, per-query ranked window with "
    "(cos DESC, id) tie-break. Exact baseline for the LSH variants.",
    tags=("similarity",),
    bench=True,
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    cos = cosine(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))
    )


@register(
    "embedding_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.label = b.label
      AND {_cos_sql('a.embedding', 'b.embedding')} >= 0.95
    """,
    doc="Embedding-cosine near-dup pairs: blocking on label (the coarse "
    "cluster key) bounds the pairwise comparison to within-block — the "
    "blocked-dedup pattern; threshold 0.95.",
    tags=("similarity", "dedup"),
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
    )
    cos = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(
            b,
            (F.col("vec_a") < F.col("vec_b"))
            & (F.col("label_a") == F.col("label_b")),
        )
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.95)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path: candidates limited to one hash bucket)
# ---------------------------------------------------------------------------

from flu_data_pipeline_spark.operators.similarity import (  # noqa: E402
    lsh_bucket,
    lsh_bucket_sql,
)


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {lsh_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id, embedding, bucket FROM bucketed WHERE vec_id < 5),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_cos_sql('q.embedding', 'c.embedding')} AS cos_raw
        FROM q JOIN bucketed c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cos_sim
    FROM pairs
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
    ) <= 3
    """,
    doc="ANN via random-hyperplane LSH: 4 deterministic hyperplanes -> "
    "16 buckets; candidates share the query's bucket; exact cosine re-rank "
    "within the bucket (top-3). Signature computed in one scan projection; "
    "the join shuffles only on the bucket key.",
    tags=("similarity", "lsh"),
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    cos = cosine(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(
            c,
            (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"))
    )
