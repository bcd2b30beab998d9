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


def test_resize_image_geometry_and_determinism(spark, sf_smoke):
    from google_analytics_to_s3_spark.operators.multimodal import (
        resize_image,
        with_binary_payload,
    )
    from google_analytics_to_s3_spark.sources.testdata import load_table

    docs = with_binary_payload(
        load_table(spark, sf_smoke, "documents").limit(20)
    )
    out = resize_image(docs, 8, 4).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["payload"]) == 32  # 8*4 bytes, exact target size
        assert (r["width"], r["height"]) == (8, 4)
    # deterministic: same input -> same digests
    again = {r["doc_id"]: r["payload_sha256"]
             for r in resize_image(docs, 8, 4).collect()}
    assert again == {r["doc_id"]: r["payload_sha256"] for r in out}


def test_audio_features_shape_and_values(spark):
    from google_analytics_to_s3_spark.operators.multimodal import (
        extract_audio_features,
    )

    df = spark.createDataFrame(
        [(1, bytes(range(128))), (2, b"\x10" * 100), (3, b"")],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in
            extract_audio_features(df, window_bytes=64).collect()}
    assert rows[1]["n_windows"] == 2
    assert rows[1]["features"][0] == sum(range(64)) / 64
    assert rows[1]["features"][1] == sum(range(64, 128)) / 64
    assert rows[2]["n_windows"] == 2  # 64 + 36 bytes
    assert rows[2]["features"] == [16.0, 16.0]
    assert rows[3]["n_windows"] == 1 and rows[3]["features"] == [0.0]
    assert rows[1]["duration_ms"] == 128 * 1000 // 16000
    # feature vectors feed the cosine helpers unchanged
    from google_analytics_to_s3_spark.operators.similarity import cosine
    import pyspark.sql.functions as F

    feats = extract_audio_features(df, window_bytes=64).filter(
        F.col("doc_id") < 3
    )
    sim = (
        feats.alias("a").crossJoin(feats.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(cosine(F.col("a.features"), F.col("b.features")).alias("c"))
        .collect()
    )
    assert 0.0 < sim[0]["c"] <= 1.0


def test_shot_boundaries_semantics(spark):
    import pyspark.sql.functions as F

    from google_analytics_to_s3_spark.operators.multimodal import (
        detect_shot_boundaries,
    )

    frames = spark.createDataFrame(
        [
            (1, 0, "aa" * 32),   # energy 0xaaaa
            (1, 1, "ab" * 32),   # different digest-derived energy
            (2, 0, "cc" * 32),
        ],
        ["doc_id", "frame_idx", "frame_sha256"],
    )
    out = detect_shot_boundaries(frames, threshold=0).collect()
    rows = {(r["doc_id"], r["frame_idx"]): r for r in out}
    # frame 0 always opens a shot
    assert rows[(1, 0)]["is_boundary"] and rows[(2, 0)]["is_boundary"]
    # threshold 0: any energy change is a boundary
    assert rows[(1, 1)]["is_boundary"] == (
        rows[(1, 1)]["energy"] != rows[(1, 0)]["energy"]
    )
    assert rows[(1, 0)]["n_shots"] == rows[(1, 1)]["n_shots"]
    # huge threshold: only frame 0 is a boundary
    calm = detect_shot_boundaries(frames, threshold=1 << 20)
    assert calm.filter(F.col("is_boundary")).count() == 2


def test_all_real_decoder_gates_and_schema_contract(spark, docs_df):
    """Every gated codec op (a) raises a clean NotImplementedError when
    the real decoder is requested in this lib-less environment, and
    (b) produces, on the stub path, EXACTLY the documented schema the
    real decoder is contracted to produce — so flipping
    use_real_decoder=True when PIL/soundfile appear cannot change any
    downstream plan."""
    from google_analytics_to_s3_spark.operators.multimodal import (
        AUDIO_FEATURE_SCHEMA,
        IMAGE_META_SCHEMA,
        RESIZED_SCHEMA,
        extract_audio_features,
        resize_image,
    )

    gated = [
        (decode_image_meta, {}, IMAGE_META_SCHEMA),
        (resize_image, {"target_w": 4, "target_h": 4}, RESIZED_SCHEMA),
        (extract_audio_features, {}, AUDIO_FEATURE_SCHEMA),
    ]
    for op, kwargs, schema in gated:
        with pytest.raises(NotImplementedError, match="not installed"):
            op(docs_df, use_real_decoder=True, **kwargs)
        out = op(docs_df, use_real_decoder=False, **kwargs)
        assert out.schema == schema, op.__name__
        assert out.count() == len(DOCS), op.__name__
