"""Deduplication suite over the ``documents`` corpus.

Extension mandate (BASELINE.json): exact dedup, n-gram Jaccard near-dup,
MinHash+LSH, SimHash — each as an oracle-checked query. Hash-dependent
operators use the portable md5-prefix hash
(:mod:`flu_data_pipeline_spark.functions.hashing`) so DuckDB computes
identical values.

Scale notes (100 TB): exact dedup is a hash groupBy on md5(text) — one
shuffle of (hash, id), never of full text. Jaccard/MinHash avoid the O(n²)
pairwise comparison by exploding to (feature, doc) and self-joining on the
feature — candidate generation cost is bounded by feature-bucket sizes
(LSH bands for minhash), which is the standard distributed near-dup design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.plans.registry import register


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup via hash-groupBy: canonical representative = min "
    "doc_id per md5(text). Only (hash, id) shuffles — text stays columnar "
    "at the scan.",
    tags=("dedup", "D1"),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingles(col, n: int = 3):
    """Word n-gram shingle array from raw text (lowercased, \\s+ split)."""
    tokens = F.split(F.lower(F.trim(col)), r"\s+")
    # slide an n-window over the token array; Spark-native, no UDF
    return F.filter(
        F.transform(
            tokens,
            lambda _, i: F.when(
                i + n <= F.size(tokens),
                F.concat_ws(" ", F.slice(tokens, i + 1, n)),
            ),
        ),
        lambda x: x.isNotNull(),
    )


# DuckDB equivalent of _shingles for the oracle side
_SHINGLES_SQL = """
    list_filter(
      list_transform(
        range(1, len(regexp_split_to_array(lower(trim(text)), '\\s+')) + 1),
        i -> CASE WHEN i + {n} - 1 <= len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                  THEN array_to_string(
                         regexp_split_to_array(lower(trim(text)), '\\s+')[i : i + {n} - 1],
                         ' ')
             END),
      x -> x IS NOT NULL)
"""


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH shingled AS (
        SELECT doc_id, DISTINCT_SHINGLE AS shingle
        FROM (
            SELECT doc_id, unnest({_SHINGLES_SQL.format(n=3)}) AS DISTINCT_SHINGLE
            FROM documents
        )
        GROUP BY doc_id, DISTINCT_SHINGLE
    ), sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM shingled GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM shingled a JOIN shingled b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (sa.n_shingles + sb.n_shingles - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE)
          / (sa.n_shingles + sb.n_shingles - i.n_common) >= 0.2
    """,
    doc="N-gram (3-word shingle) Jaccard near-dup: explode distinct "
    "shingles → self-join on shingle (inverted index, no O(n²) cross "
    "join) → |A∩B| / (|A|+|B|-|A∩B|) ≥ 0.2. The shingle join is the "
    "classic distributed candidate-pair generation.",
    tags=("dedup",),
    bench=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shingled = (
        docs.select("doc_id", F.explode(_shingles(F.col("text"), 3)).alias("shingle"))
        .distinct()
    )
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
