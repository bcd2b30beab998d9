"""Multimodal binary-column plumbing: decode stub determinism, frame
fan-out shape, real-decoder gating."""

import hashlib

import pytest

from google_analytics_to_s3_spark.operators.multimodal import (
    decode_image_meta,
    sample_frames,
    with_binary_payload,
)

DOCS = [
    (1, "hello world"),
    (2, "a"),
    (3, "x" * 100),
]


@pytest.fixture()
def docs_df(spark):
    return with_binary_payload(spark.createDataFrame(DOCS, ["doc_id", "text"]))


def test_decode_image_meta_stub(spark, docs_df):
    rows = {r["doc_id"]: r for r in decode_image_meta(docs_df).collect()}
    for doc_id, text in DOCS:
        h = hashlib.sha256(text.encode()).hexdigest()
        r = rows[doc_id]
        assert r["n_bytes"] == len(text.encode())
        assert r["payload_sha256"] == h
        assert r["width"] == int(h[0:2], 16)
        assert r["height"] == int(h[2:4], 16)


def test_sample_frames_fanout(spark, docs_df):
    out = sample_frames(docs_df, frame_bytes=16, max_frames=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 11 bytes -> 1 frame; 1 byte -> 1 frame; 100 bytes -> 4 (capped)
    assert len(by_doc[1]) == 1
    assert len(by_doc[2]) == 1
    assert len(by_doc[3]) == 4
    frame0 = sorted(by_doc[3], key=lambda r: r["frame_idx"])[0]
    expected = b"x" * 16
    assert bytes(frame0["frame_payload"]) == expected
    assert frame0["frame_sha256"] == hashlib.sha256(expected).hexdigest()


def test_real_decoder_gated(spark, docs_df):
    with pytest.raises(NotImplementedError):
        decode_image_meta(docs_df, use_real_decoder=True).collect()
