"""Multimodal-column queries over ``documents`` (text payload stands in for
arbitrary media bytes — the plumbing is identical)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "multimodal_cas_chunks",
    oracle="""
    WITH chunks AS (
        SELECT d.doc_id,
               md5(substr(d.text, i * 64 + 1, 64)) AS chunk_hash,
               length(substr(d.text, i * 64 + 1, 64)) AS chunk_len
        FROM documents d,
             UNNEST(range(0, CAST(CEIL(length(d.text) / 64.0) AS BIGINT)))
                 AS t(i)
    )
    SELECT chunk_hash,
           CAST(MAX(chunk_len) AS INT) AS chunk_len,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST((COUNT(*) - 1) * MAX(chunk_len) AS BIGINT) AS bytes_saved
    FROM chunks
    GROUP BY chunk_hash
    HAVING COUNT(*) > 1
    QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, chunk_hash) <= 25
    ORDER BY n_copies DESC, chunk_hash
    """,
    doc="Content-addressable-storage chunk dedup over the blob column — "
    "the fixed-size-chunking dedup every large blob store runs: each "
    "blob (UTF-8 text payload, same bytes as attach_binary's blob "
    "column) is cut into 64-byte chunks, chunks are addressed by "
    "md5, and duplicate chunk groups report copy count, distinct "
    "referencing docs, and bytes saved by storing one copy "
    "(dedup-ratio accounting). Top-25 hottest chunks pinned on "
    "(copies, hash). Chunk indices come from a per-row "
    "range(ceil(len/64)) lateral — map-side fan-out proportional to "
    "payload bytes, exactly like the real chunker. Scale shape: "
    "chunk rows carry (16-byte hash, 8-byte id) into ONE "
    "groupBy(chunk_hash) shuffle — payload bytes never shuffle; at "
    "100 TB this is the standard CAS-ingest profile (hash locally, "
    "dedupe by hash key). Content-defined (rolling-hash) chunking "
    "swaps the index generator, not the plan.",
    tags=("multimodal", "dedup", "A10", "O3"),
    bench=True,
)
def multimodal_cas_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    # chunk the DECODED payload text (same bytes as the blob — ASCII
    # corpus) so the oracle can recompute hashes with DuckDB's md5
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, cast(ceil(length(text) / 64.0) as int) - 1), "
                "i -> struct(md5(substring(text, i * 64 + 1, 64)) AS chunk_hash, "
                "length(substring(text, i * 64 + 1, 64)) AS chunk_len))"
            )
        ).alias("c"),
    ).select("doc_id", "c.chunk_hash", "c.chunk_len")
    agg = (
        chunks.groupBy("chunk_hash")
        .agg(
            F.max("chunk_len").cast("int").alias("chunk_len"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            ((F.count(F.lit(1)) - 1) * F.max("chunk_len"))
            .cast("bigint")
            .alias("bytes_saved"),
        )
        .filter(F.col("n_copies") > 1)
    )
    w = Window.orderBy(F.desc("n_copies"), "chunk_hash")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .drop("rn")
        .orderBy(F.desc("n_copies"), "chunk_hash")
    )


@register(
    "multimodal_frame_sample_plan",
    oracle="""
    WITH blobs AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(GREATEST(octet_length(encode(text)) // 32, 1) AS BIGINT)
                   AS n_frames
        FROM documents
    ), plans AS (
        SELECT doc_id, n_bytes, n_frames,
               unnest(range(0, LEAST(n_frames, 4))) AS k
        FROM blobs
    )
    SELECT doc_id, n_frames,
           CAST(k AS INT) AS sample_idx,
           CAST(k * n_frames // LEAST(n_frames, 4) AS BIGINT) AS frame_no,
           CAST(k * n_frames // LEAST(n_frames, 4) * 32 AS BIGINT)
               AS byte_offset
    FROM plans
    ORDER BY doc_id, sample_idx
    LIMIT 200
    """,
    doc="Deterministic frame-sampling schedule for video-like blobs — "
    "the PLANNING half of multimodal decode, split from the decode "
    "itself (decode_stub) the way real pipelines do: per blob, a "
    "frame count from the container model (32 bytes/frame here; a "
    "real demuxer reads the index atom), then k<=4 uniformly-spaced "
    "frame numbers via integer floor arithmetic (k*n_frames//k_max — "
    "no float stride, so the schedule is bit-stable across engines "
    "and runs) with their byte offsets for ranged reads. At 100 TB "
    "this table is what makes decode cheap: the mapInPandas decoder "
    "receives (blob-range, frame_no) work items and the storage "
    "layer serves RANGED reads instead of full blobs — the schedule "
    "is metadata-only and never touches payload bytes. Scale shape: "
    "pure map-side arithmetic + a bounded <=4-row-per-blob lateral.",
    tags=("multimodal", "F2", "O7"),
)
def multimodal_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    blobs = docs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.greatest(
            F.floor(F.col("meta.n_bytes") / 32).cast("bigint"), F.lit(1)
        ).alias("n_frames"),
    )
    plans = blobs.select(
        "doc_id",
        "n_frames",
        F.explode(F.expr("sequence(0, least(n_frames, 4) - 1)")).alias("k"),
    )
    frame_no = F.floor(
        F.col("k") * F.col("n_frames") / F.least(F.col("n_frames"), F.lit(4))
    ).cast("bigint")
    return (
        plans.select(
            "doc_id",
            "n_frames",
            F.col("k").cast("int").alias("sample_idx"),
            frame_no.alias("frame_no"),
            (frame_no * 32).cast("bigint").alias("byte_offset"),
        )
        .orderBy("doc_id", "sample_idx")
        .limit(200)
    )


_PHASH_AVG_SQL = (
    "("
    + " + ".join(
        "CAST((CAST('0x' || substr(md5(text), {lo}, 2) AS INT) "
        "+ octet_length(encode(text))) % 251 AS DOUBLE)".format(lo=2 * i + 1)
        for i in range(_DECODE_DIM)
    )
    + f") / {_DECODE_DIM}"
)

_PHASH_BITS_SQL = " + ".join(
    "CASE WHEN CAST((CAST('0x' || substr(md5(text), {lo}, 2) AS INT) "
    "+ octet_length(encode(text))) % 251 AS DOUBLE) >= avg_f "
    "THEN {bit} ELSE 0 END".format(lo=2 * i + 1, bit=1 << i)
    for i in range(_DECODE_DIM)
)


@register(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, text, {_PHASH_AVG_SQL} AS avg_f FROM documents
    ),
    hashed AS (
        SELECT doc_id, CAST({_PHASH_BITS_SQL} AS INT) AS phash FROM feat
    )
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_blobs,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
    FROM hashed
    GROUP BY phash
    HAVING COUNT(*) > 1
    ORDER BY n_blobs DESC, phash
    LIMIT 25
    """,
    doc="Perceptual-hash near-dup detection across binary blobs — the "
    "pHash-bucket dedup image/audio stores run: each blob's decoded "
    f"feature vector (the {_DECODE_DIM}-dim deterministic stub decode, "
    "same arithmetic as multimodal_decode_features) is reduced to a "
    "sign bitmap against its own feature mean (the average-hash "
    "construction), and blobs sharing a bitmap form dedup candidate "
    "groups (top-25 by size, min-id representative). With a real "
    "codec the features would be DCT/mel coefficients; the Spark "
    "plumbing — decode, per-row bitmap, hash-bucket groupBy — is "
    "identical. Scale shape: bitmap computed in the scan projection, "
    "ONE 8-bit-key aggregation; blob bytes never shuffle.",
    tags=("multimodal", "dedup", "A10", "O3"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    feats = decode_stub(docs, "doc_id", strict=False, feature_dim=_DECODE_DIM)
    avg_f = (
        sum(F.col("feature")[i].cast("double") for i in range(_DECODE_DIM))
        / _DECODE_DIM
    )
    bits = sum(
        F.when(
            F.col("feature")[i].cast("double") >= F.col("avg_f"), 1 << i
        ).otherwise(0)
        for i in range(_DECODE_DIM)
    )
    return (
        feats.withColumn("avg_f", avg_f)
        .select("doc_id", bits.cast("int").alias("phash"))
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blobs"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .filter(F.col("n_blobs") > 1)
        .orderBy(F.desc("n_blobs"), F.asc("phash"))
        .limit(25)
    )


_PACK_BUDGET = 64 * 1024  # target shard payload: 64 KiB of blob bytes


@register(
    "multimodal_bytes_shard_pack",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               'text' AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               SUM(CAST(octet_length(encode(text)) AS BIGINT)) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_bytes
        FROM documents
    ), packed AS (
        SELECT modality, n_bytes,
               CAST((cum_bytes - n_bytes) // {_PACK_BUDGET} AS BIGINT)
                   AS shard_idx
        FROM sized
    )
    SELECT modality, shard_idx,
           CAST(COUNT(*) AS BIGINT) AS n_blobs,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes
    FROM packed
    GROUP BY modality, shard_idx
    ORDER BY modality, shard_idx
    """,
    doc=f"Byte-budget shard packing for blob export: blobs in stable "
    f"doc_id order pack greedily into ~{_PACK_BUDGET // 1024} KiB shards "
    "(shard = pre-blob cumulative bytes div budget — each shard fills "
    "past the budget by at most one blob, the tar/WebDataset writer "
    "rule). Plans SIZE-balanced media shards where count-balanced "
    "sharding (export_shard_plan) would skew on fat videos vs thin "
    "thumbnails. Only metadata (doc_id, n_bytes) flows through the "
    "cumulative window — blob bytes stay in the scan; at 100 TB the "
    "global running sum runs per modality-partition first with "
    "per-partition offsets broadcast back (two passes over counters, "
    "zero over payload).",
    tags=("multimodal", "layout", "A10", "O3"),
)
def multimodal_bytes_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(load_table(spark, sf_dir, "documents"))
    sized = docs.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        # two-level running sum: a global ORDER BY window would drag every
        # row to one partition; instead cumsum within doc_id-range chunks
        # (distributed) + per-chunk offsets (chunk-count rows, tiny)
        F.expr("doc_id div 1024").alias("chunk"),
    )
    chunk_off = (
        sized.groupBy("chunk")
        .agg(F.sum("n_bytes").alias("chunk_bytes"))
        .select(
            "chunk",
            (
                F.sum("chunk_bytes").over(
                    Window.orderBy("chunk").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                )
            ).alias("offset"),
        )
        .na.fill({"offset": 0})
    )
    w_intra = Window.partitionBy("chunk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = (
        sized.join(F.broadcast(chunk_off), "chunk")
        .select(
            "modality",
            "n_bytes",
            (
                (
                    F.col("offset")
                    + F.sum("n_bytes").over(w_intra)
                    - F.col("n_bytes")
                )
                / _PACK_BUDGET
            )
            .cast("long")
            .alias("shard_idx"),
        )
    )
    return (
        packed.groupBy("modality", "shard_idx")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
        )
        .orderBy("modality", "shard_idx")
    )
