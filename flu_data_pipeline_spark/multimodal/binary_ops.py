"""Multimodal column plumbing (extension mandate, BASELINE.json).

Images / audio / video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly layout, Arrow
batch shape through ``mapInPandas`` — is real and tested; the actual codec
step is STUBBED (``decode_stub``) because no image/audio libraries exist in
this container: it either raises ``NotImplementedError`` (strict mode) or
produces a deterministic fake feature vector (test mode), with the exact
UDF signature a real decoder would have.

Design notes for 100 TB:
- blobs stay in parquet binary columns; metadata is a separate small
  struct column so metadata-only queries never touch blob bytes (column
  pruning skips them at the scan);
- decode runs inside ``mapInPandas`` — one Arrow batch in, one out, no
  per-row Python; batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- partition by (modality, date) so a modality-specific job prunes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every blob
MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType(), True),  # image|audio|video|text
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum_md5", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("modality", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", modality: str = "text") -> DataFrame:
    """Wrap a payload column as (blob binary, meta struct) — the canonical
    multimodal row shape. Metadata is computed native-side (no Python)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("text/plain; charset=utf-8").alias("mime"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.md5(blob).alias("checksum_md5"),
        ),
    )


def decode_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    strict: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """Batch 'decode' through ``mapInPandas`` with the real UDF shape.

    strict=True raises NotImplementedError (no codec libs in this
    container); strict=False emits a deterministic fake feature vector
    derived from blob length + checksum bytes, so the distributed plumbing
    (Arrow batches, schema, partitioning) is exercised end to end.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; plug a real decoder in here"
                )
            # A zero-row Arrow batch yields a column-less frame from
            # pd.DataFrame([]) — meta["n_bytes"] would KeyError; there
            # is nothing to decode, so skip the batch.
            if pdf.empty:
                continue
            # Vectorized fake-feature derivation: a real decoder would
            # also operate on whole Arrow columns per batch (e.g. a
            # batched model forward), never per-row Python — keep the
            # exemplar shaped the way a copier should copy it.
            meta = pd.DataFrame(list(pdf["meta"]))
            n = meta["n_bytes"].astype("int64")
            feats = pd.DataFrame(
                {
                    i: (
                        meta["checksum_md5"]
                        .str.slice(i * 2, i * 2 + 2)
                        .apply(int, base=16)
                        + n
                    )
                    % 251
                    for i in range(feature_dim)
                }
            ).astype("float64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "modality": meta["modality"],
                    "n_bytes": n,
                    "feature": feats.values.tolist(),
                }
            )

    return df.mapInPandas(_decode, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_offset", T.LongType(), True),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def frame_sample_stub(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 4, strict: bool = False
) -> DataFrame:
    """UDTF-style 1→N frame sampling through ``mapInPandas``: each blob row
    yields ``n_frames`` evenly spaced 'frames'. The real decoder (ffmpeg /
    PIL) is STUBBED — frames here are deterministic byte slices at the
    sampled offsets — but the distributed shape is exact: Arrow batches
    in, a multiplied row count out, blob bytes never leave the executor.

    At scale: frame explosion multiplies rows n_frames×; keep the frame
    output partitioned by the id so a downstream per-video groupBy
    (e.g. pooled features) needs no extra shuffle.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "frame sampling requires video codec libraries not "
                    "present in this environment; plug ffmpeg/PIL in here"
                )
            if pdf.empty:
                continue
            # Column-wise 1→n_frames explosion: all numeric columns are
            # numpy ops over the whole batch; only the final byte slice
            # touches Python objects (bytes slicing has no vector form),
            # one slice per OUTPUT row — no per-row Series construction.
            blobs = pdf["blob"].to_numpy(dtype=object)
            lens = np.fromiter(
                (len(b) if b is not None else 0 for b in blobs),
                dtype=np.int64,
                count=len(blobs),
            )
            n = np.maximum(lens, 1)
            idx = np.tile(np.arange(n_frames, dtype=np.int32), len(blobs))
            offs = (idx.astype(np.int64) * np.repeat(n, n_frames)) // n_frames
            rep_blobs = np.repeat(blobs, n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        pdf[id_col].to_numpy(), n_frames
                    ),
                    "frame_idx": idx,
                    "frame_offset": offs,
                    "frame_bytes": [
                        bytes(b or b"")[o : o + 16]
                        for b, o in zip(rep_blobs, offs)
                    ],
                }
            )

    return df.mapInPandas(_sample, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
        T.StructField("n_bytes_out", T.LongType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    target_w: int = 16,
    target_h: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Image-resize plumbing through ``mapInPandas``: blob in, fixed-size
    blob out. The codec (PIL/opencv) is STUBBED — the fake 'resize' is a
    nearest-neighbor stride over the source bytes producing EXACTLY
    ``target_w * target_h`` bytes (a grayscale stand-in), which is the
    real operator's contract: constant output size regardless of input
    size. Arrow batches in/out; bytes never leave the executor.

    At scale: resize is the canonical pre-training image normalization —
    constant output size makes downstream batch memory predictable, and
    running it blob-local (no shuffle before or after; same partitioning
    in = out) keeps it a pure map stage.
    """

    target_n = target_w * target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image resize requires codec libraries not present in "
                    "this environment; plug PIL/opencv in here"
                )
            if pdf.empty:
                continue
            # Column-shaped resize: the stride gather is one numpy
            # fancy-index per blob over a shared arange — the batch
            # analogue of a real resize kernel (whole-image array op),
            # no per-row Series construction.
            grid = np.arange(target_n, dtype=np.int64)

            def _strided(b) -> bytes:
                src = np.frombuffer(bytes(b) or b"\x00", dtype=np.uint8)
                return src[(grid * len(src)) // target_n].tobytes()

            resized = [_strided(b) for b in pdf["blob"].to_numpy(object)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "out_w": np.full(len(pdf), target_w, dtype=np.int32),
                    "out_h": np.full(len(pdf), target_h, dtype=np.int32),
                    "n_bytes_out": np.full(
                        len(pdf), target_n, dtype=np.int64
                    ),
                    "resized": resized,
                }
            )

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("chunk_idx", T.IntegerType(), True),
        T.StructField("start_byte", T.LongType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("chunk", T.BinaryType(), True),
    ]
)


def audio_chunk_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    chunk_bytes: int = 400,
    hop_bytes: int = 240,
    strict: bool = False,
) -> DataFrame:
    """Overlapping audio chunking (1→N) through ``mapInPandas``: each blob
    yields windows of ``chunk_bytes`` every ``hop_bytes`` (overlap =
    chunk - hop), tail window kept if non-empty — the exact shape of
    real STFT/ASR framing, with the codec STUBBED (one byte stands in
    for one sample; a real reader would decode PCM first).

    At scale the multiplier is len/hop, so hop — not corpus size —
    controls output volume; chunks stay partitioned by the id for
    downstream per-utterance pooling without a shuffle.
    """

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio chunking requires codec libraries not present "
                    "in this environment; plug soundfile/torchaudio in here"
                )
            if pdf.empty:
                continue
            # Column-wise variable-fanout chunking: chunk counts, ids,
            # indices, offsets, and sample counts are whole-batch numpy
            # arithmetic (ceil-div fanout = the old loop's semantics:
            # zero chunks for an empty blob, tail window kept); only
            # the byte slices touch Python objects, one per output row.
            blobs = pdf["blob"].to_numpy(dtype=object)
            lens = np.fromiter(
                (len(b) if b is not None else 0 for b in blobs),
                dtype=np.int64,
                count=len(blobs),
            )
            n_chunks = -(-lens // hop_bytes)  # ceil; 0 when len == 0
            total = int(n_chunks.sum())
            rep = np.repeat(np.arange(len(blobs)), n_chunks)
            # per-output chunk index: position minus the start of its row
            starts_of_row = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
            cidx = np.arange(total) - np.repeat(starts_of_row, n_chunks)
            start_byte = cidx * hop_bytes
            n_samples = np.minimum(
                chunk_bytes, lens[rep] - start_byte
            ).astype(np.int32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy()[rep],
                    "chunk_idx": cidx.astype(np.int32),
                    "start_byte": start_byte,
                    "n_samples": n_samples,
                    "chunk": [
                        bytes(blobs[r])[s : s + chunk_bytes]
                        for r, s in zip(rep, start_byte)
                    ],
                }
            )

    return df.mapInPandas(_chunk, CHUNK_SCHEMA)


def decode_stub_arrow(
    df: DataFrame,
    id_col: str = "doc_id",
    strict: bool = False,
    feature_dim: int = 8,
) -> DataFrame:
    """Arrow-native twin of :func:`decode_stub` via ``mapInArrow``.

    For binary payloads this is the faster Python boundary: RecordBatches
    arrive zero-copy (no pandas object-dtype boxing of the blob bytes,
    which for media-sized blobs dominates the pandas path), the decode
    loop reads buffers directly, and the output batch is built
    column-wise. Same deterministic stub semantics as decode_stub —
    feature[i] = (checksum hex pair i + n_bytes) % 251 — asserted equal
    in tests, so either boundary can serve the registry query.
    """
    import pyarrow as pa

    def _decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; plug a real decoder in here"
                )
            # Box only the columns the stub reads — to_pydict() on the
            # full batch would materialize every blob's bytes into
            # Python objects, defeating the Arrow path's point.
            metas = batch.column("meta").to_pylist()
            ids = batch.column(id_col).to_pylist()
            feats = [
                [
                    float(
                        (int(m["checksum_md5"][i * 2 : i * 2 + 2], 16)
                         + int(m["n_bytes"])) % 251
                    )
                    for i in range(feature_dim)
                ]
                for m in metas
            ]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "modality": pa.array(
                        [m["modality"] for m in metas], pa.string()
                    ),
                    "n_bytes": pa.array(
                        [int(m["n_bytes"]) for m in metas], pa.int64()
                    ),
                    "feature": pa.array(feats, pa.list_(pa.float32())),
                }
            )

    return df.mapInArrow(_decode, DECODED_SCHEMA)
