"""Multimodal-column queries over ``documents`` (text payload stands in for
arbitrary media bytes — the plumbing is identical)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.multimodal.binary_ops import attach_binary, decode_stub
from flu_data_pipeline_spark.plans.registry import register


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum_md5
    FROM documents
    """,
    doc="Binary-column metadata projection: blob size + checksum computed "
    "native-side; metadata-only queries never read blob bytes at scale "
    "(separate struct column → pruned scan).",
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum_md5").alias("checksum_md5"),
    )


@register(
    "multimodal_decode_features",
    oracle=None,  # Arrow-batched pandas decode stub: not SQL-expressible
    doc="mapInPandas batch 'decode' (stubbed codec, real Arrow plumbing): "
    "blob+meta in, (id, modality, n_bytes, feature array) out. The rows-"
    "only check validates schema + batch shape end to end. The registered "
    "result projects the array into sortable scalar columns (n_dims + "
    "JSON form) so rows-only canonicalization (pandas sort) works; "
    "library users get the raw array via decode_stub.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    feats = decode_stub(docs, "doc_id", strict=False)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        F.size("feature").alias("n_dims"),
        F.to_json(F.col("feature")).alias("feature_json"),
    )
