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


#: The stub "decoder" emits feature[i] = (hex_pair_i(md5(blob)) + n_bytes)
#: % 251 (multimodal/binary_ops.py:decode_stub) — deterministic from the
#: blob, so the whole mapInPandas path has an exact SQL twin: the oracle
#: recomputes every feature value from md5(text) with integer arithmetic.
_DECODE_DIM = 8
_DECODE_FEATURE_SQL = ", ".join(
    "CAST((CAST('0x' || substr(md5(text), {lo}, 2) AS INT) "
    "+ octet_length(encode(text))) % 251 AS DOUBLE) AS f{i}".format(
        lo=2 * i + 1, i=i
    )
    for i in range(_DECODE_DIM)
)


@register(
    "multimodal_decode_features",
    oracle=f"""
    SELECT doc_id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           {_DECODE_DIM} AS n_dims,
           {_DECODE_FEATURE_SQL}
    FROM documents
    """,
    doc="mapInPandas batch 'decode' (stubbed codec, real Arrow plumbing): "
    "blob+meta in, (id, modality, n_bytes, feature array) out. The Spark "
    "side runs the genuine Arrow-batched decode UDF end to end; because "
    "the stub's fake features are a pure function of md5(blob)+length, "
    "the oracle recomputes them in SQL — so the batch plumbing is hash-"
    "compared exactly, not just rows-counted. The registered result "
    "projects the array into scalar f0..f7 columns (sortable, and "
    "float32→float64 exact since every value is an integer < 251); "
    "library users get the raw array via decode_stub.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    feats = decode_stub(docs, "doc_id", strict=False, feature_dim=_DECODE_DIM)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        F.size("feature").alias("n_dims"),
        *[
            F.col("feature")[i].cast("double").alias(f"f{i}")
            for i in range(_DECODE_DIM)
        ],
    )
