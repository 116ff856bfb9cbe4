"""Multimodal plumbing: blob+meta shape, metadata pruning, decode stub
batch semantics (deterministic fake features; strict mode raises)."""

from __future__ import annotations

import hashlib

import pytest
from py4j.protocol import Py4JJavaError

from flu_data_pipeline_spark.catalog import load_table
from flu_data_pipeline_spark.multimodal.binary_ops import attach_binary, decode_stub

from .conftest import SF_SMOKE


def test_attach_binary_meta(spark):
    docs = attach_binary(load_table(spark, SF_SMOKE, "documents").limit(20))
    row = docs.select("text", "blob", "meta").first()
    assert bytes(row["blob"]) == row["text"].encode("utf-8")
    assert row["meta"]["n_bytes"] == len(row["text"].encode("utf-8"))
    assert row["meta"]["checksum_md5"] == hashlib.md5(row["text"].encode()).hexdigest()
    assert row["meta"]["modality"] == "text"


def test_decode_stub_features(spark):
    docs = attach_binary(load_table(spark, SF_SMOKE, "documents").limit(50))
    out = decode_stub(docs, "doc_id", strict=False)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same input → same features on re-run
    rows2 = decode_stub(docs, "doc_id", strict=False).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_decode_stub_strict_raises(spark):
    docs = attach_binary(load_table(spark, SF_SMOKE, "documents").limit(5))
    with pytest.raises((Py4JJavaError, Exception)) as exc:
        decode_stub(docs, "doc_id", strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "media decode" in str(exc.value)


def test_frame_sample_stub(spark):
    from flu_data_pipeline_spark.multimodal.binary_ops import frame_sample_stub

    docs = attach_binary(load_table(spark, SF_SMOKE, "documents").limit(25))
    frames = frame_sample_stub(docs, "doc_id", n_frames=4)
    rows = frames.collect()
    assert len(rows) == 100  # 1 -> 4 multiplication
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r["doc_id"]: bytes(r["blob"]) for r in docs.select("doc_id", "blob").collect()}
    for doc_id, fr in by_doc.items():
        assert sorted(f["frame_idx"] for f in fr) == [0, 1, 2, 3]
        blob = originals[doc_id]
        for f in fr:
            off = f["frame_offset"]
            assert bytes(f["frame_bytes"]) == blob[off : off + 16]


def test_resize_stub_constant_output(spark):
    from flu_data_pipeline_spark.multimodal.binary_ops import resize_stub

    docs = attach_binary(load_table(spark, SF_SMOKE, "documents").limit(30))
    out = resize_stub(docs, "doc_id", target_w=8, target_h=8).collect()
    assert len(out) == 30
    # resize contract: constant output size regardless of input size
    assert all(r["n_bytes_out"] == 64 and len(bytes(r["resized"])) == 64 for r in out)
    # nearest-neighbor stride is deterministic and sourced from the blob
    originals = {
        r["doc_id"]: bytes(r["blob"]) for r in docs.select("doc_id", "blob").collect()
    }
    for r in out:
        blob = originals[r["doc_id"]]
        n = len(blob)
        expect = bytes(blob[(i * n) // 64] for i in range(64))
        assert bytes(r["resized"]) == expect


def test_audio_chunk_stub_overlap(spark):
    from flu_data_pipeline_spark.multimodal.binary_ops import audio_chunk_stub

    docs = attach_binary(load_table(spark, SF_SMOKE, "documents").limit(20))
    chunks = audio_chunk_stub(docs, "doc_id", chunk_bytes=100, hop_bytes=60).collect()
    originals = {
        r["doc_id"]: bytes(r["blob"]) for r in docs.select("doc_id", "blob").collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(originals)
    for doc_id, ch in by_doc.items():
        blob = originals[doc_id]
        ch.sort(key=lambda r: r["chunk_idx"])
        # count matches the hop formula (tail kept if non-empty)
        expected_n = len(range(0, max(len(blob), 1), 60))
        assert len(ch) == expected_n
        for i, r in enumerate(ch):
            assert r["start_byte"] == i * 60
            assert bytes(r["chunk"]) == blob[i * 60 : i * 60 + 100]
        # consecutive chunks overlap by chunk - hop = 40 bytes
        for a, b in zip(ch, ch[1:]):
            if a["n_samples"] == 100:
                assert bytes(a["chunk"])[60:] == bytes(b["chunk"])[: a["n_samples"] - 60]


def test_decode_arrow_twin_matches_pandas(spark):
    """mapInArrow and mapInPandas decode paths produce identical rows —
    either Python boundary can back the registry query; Arrow is the
    fast path for binary payloads (no object-dtype boxing)."""
    from flu_data_pipeline_spark.catalog import load_table
    from flu_data_pipeline_spark.multimodal.binary_ops import (
        attach_binary,
        decode_stub,
        decode_stub_arrow,
    )

    docs = attach_binary(load_table(spark, SF_SMOKE, "documents").limit(100))
    a = sorted(
        (r["doc_id"], r["n_bytes"], tuple(r["feature"]))
        for r in decode_stub(docs).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_bytes"], tuple(r["feature"]))
        for r in decode_stub_arrow(docs).collect()
    )
    assert a == b and len(a) == 100
