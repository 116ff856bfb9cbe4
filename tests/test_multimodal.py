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
