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


class TestRealPpmDecode:
    """The REAL (pure-numpy) NetPBM path — header parse + pixel math,
    not digest stubs."""

    def _df(self, spark, payloads):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )

    def test_meta_matches_synthesis(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_ppm_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_ppm

        df = self._df(spark, [make_ppm(8, 6, 1), make_ppm(3, 3, 2, 1)])
        out = {r["doc_id"]: r for r in decode_ppm_meta(df).collect()}
        assert (out[0]["width"], out[0]["height"],
                out[0]["channels"]) == (8, 6, 3)
        assert (out[1]["width"], out[1]["channels"]) == (3, 1)
        # mean recomputed independently from the synthesis arithmetic
        exp = sum(
            (1 + y * 31 + x * 7 + c * 13) % 256
            for y in range(6) for x in range(8) for c in range(3)
        ) / (8 * 6 * 3)
        assert out[0]["mean_px"] == round(exp, 6)
        assert out[0]["decode_error"] is None

    def test_malformed_quarantined_not_fatal(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_ppm_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_ppm

        good = make_ppm(2, 2, 3)
        df = self._df(spark, [good, b"JFIF not a ppm", good[:10]])
        out = {r["doc_id"]: r for r in decode_ppm_meta(df).collect()}
        assert out[0]["decode_error"] is None
        assert "NetPBM" in out[1]["decode_error"]
        assert "truncated" in out[2]["decode_error"]
        assert out[1]["width"] is None

    def test_comment_in_header(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_ppm,
        )

        raw = b"P5\n# a comment\n2 1\n255\n\x10\x20"
        w, h, c, px = _parse_ppm(raw)
        assert (w, h, c) == (2, 1, 1) and list(px) == [16, 32]

    def test_real_resize_nearest_neighbor(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_ppm,
            resize_ppm,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_ppm

        df = self._df(spark, [make_ppm(4, 4, 7)])
        out = resize_ppm(df, 2, 2).collect()
        assert len(out) == 1
        w, h, c, px = _parse_ppm(bytes(out[0]["payload"]))
        assert (w, h, out[0]["width"], out[0]["height"]) == (2, 2, 2, 2)
        # nearest-neighbor with floor(i*src/dst): out(y,x) = in(2y,2x)
        import numpy as np

        _, _, _, src = _parse_ppm(make_ppm(4, 4, 7))
        img = src.reshape(4, 4, 3)
        exp = img[::2, ::2].reshape(-1)
        assert np.array_equal(px, exp)

    def test_resize_drops_malformed(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            resize_ppm,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_ppm

        df = self._df(spark, [make_ppm(4, 4, 1), b"garbage"])
        assert resize_ppm(df, 2, 2).count() == 1

    def test_resized_payloads_dedupe_exactly(self, spark):
        # two different-size images of the SAME scene grid resize to
        # identical bytes -> downstream exact dedup works on payloads
        from google_analytics_to_s3_spark.operators.multimodal import (
            resize_ppm,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_ppm

        a = make_ppm(2, 2, 5)
        df = self._df(spark, [a, a])
        out = resize_ppm(df, 2, 2).select("payload_sha256").collect()
        assert out[0][0] == out[1][0]


class TestRealWavDecode:
    def _df(self, spark, payloads):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )

    def test_duration_and_rms(self, spark):
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_wav_features,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_wav_pcm16,
        )

        df = self._df(spark, [make_wav_pcm16(1600, 9)])
        r = decode_wav_features(df, window_samples=400).first()
        assert r["sample_rate_hz"] == 16000
        assert r["n_samples"] == 1600
        assert r["duration_ms"] == 100
        assert r["n_windows"] == 4
        # first-window RMS recomputed independently
        s = (((9 + np.arange(400) * 257) % 2001) - 1000).astype(np.int64)
        exp = round(float(np.sqrt((s * s).sum() / 400)), 6)
        assert r["rms_windows"][0] == exp
        assert r["decode_error"] is None

    def test_malformed_quarantined(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_wav_features,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_wav_pcm16,
        )

        df = self._df(spark, [make_wav_pcm16(100, 1), b"ID3 not wav"])
        out = {r["doc_id"]: r for r in decode_wav_features(df).collect()}
        assert out[0]["decode_error"] is None
        assert "RIFF" in out[1]["decode_error"]

    def test_chunk_walker_skips_unknown_chunks(self, spark):
        import struct

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_wav_pcm16,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_wav_pcm16,
        )

        base = make_wav_pcm16(10, 3)
        # splice a LIST chunk between WAVE and fmt
        junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
        patched = base[:12] + junk + base[12:]
        patched = b"RIFF" + struct.pack(
            "<I", len(patched) - 8
        ) + patched[8:]
        rate, samples = _parse_wav_pcm16(patched)
        assert rate == 16000 and len(samples) == 10

    def test_g711_and_depth_formats_decode_exactly(self):
        """r9: mu-law/A-law telephony codes expand via the exact
        G.711 closed forms — cross-checked against the frozen Sun
        g711.c tables (generated once from CPython 3.11's audioop,
        pinned in golden_g711_adpcm before audioop's 3.13 removal)
        for ALL 256 codes — and 8/24/32-bit PCM decode the planted
        integer rules exactly (24-bit sign bit at bit 23 exercised
        by negative samples)."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _alaw_expand,
            _mulaw_expand,
            _parse_wav,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_wav
        from tests.golden_g711_adpcm import ALAW_TABLE, ULAW_TABLE

        codes = np.arange(256, dtype=np.uint8)
        ref_u = np.array(ULAW_TABLE, dtype=np.int64)
        ref_a = np.array(ALAW_TABLE, dtype=np.int64)
        assert (_mulaw_expand(codes) == ref_u).all()
        assert (_alaw_expand(codes) == ref_a).all()
        # spec anchor points hold independently: code 0xFF is
        # +-0 region top, 0x7F the most-negative-side zero
        assert int(_mulaw_expand(np.array([0xFF], dtype=np.uint8))[0]) == 0
        assert int(_mulaw_expand(np.array([0x7F], dtype=np.uint8))[0]) == 0
        for fmt in ("pcm8", "pcm16", "pcm24", "pcm32", "ulaw", "alaw"):
            for seed, n in ((0, 400), (7, 1001)):
                rate, s = _parse_wav(make_wav(n, seed, fmt=fmt))
                i = np.arange(n)
                base = ((seed + i * 257) % 2001) - 1000
                if fmt == "pcm16":
                    exp = base
                elif fmt == "pcm8":
                    exp = (seed + i * 37) % 256 - 128
                elif fmt == "pcm24":
                    exp = base * 4096
                elif fmt == "pcm32":
                    exp = base * 1048576
                elif fmt == "ulaw":
                    exp = _mulaw_expand(
                        ((seed + i * 57) % 256).astype(np.uint8)
                    )
                else:
                    exp = _alaw_expand(
                        ((seed * 3 + i * 91) % 256).astype(np.uint8)
                    )
                assert rate == 16000 and (s == exp).all(), (fmt, seed)
        # honest gates: MS ADPCM tag and stereo still quarantine
        # (fmt 3 IEEE float decodes for real since later in r9)
        import pytest as _pt
        b = bytearray(make_wav(10, 1))
        b[20] = 2  # fmt tag -> MS ADPCM
        with _pt.raises(ValueError, match="format tag 2"):
            _parse_wav(bytes(b))
        b = bytearray(make_wav(10, 1))
        b[22] = 2  # channels -> 2
        with _pt.raises(ValueError, match="only mono"):
            _parse_wav(bytes(b))


class TestRealY4mSampling:
    def _df(self, spark, payloads):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )

    def test_stride_and_metadata(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            sample_y4m_frames,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_y4m

        df = self._df(spark, [make_y4m(4, 2, 5, 11, fps=(30, 1))])
        out = sorted(
            sample_y4m_frames(df, every_k=2).collect(),
            key=lambda r: r["frame_idx"],
        )
        assert [r["frame_idx"] for r in out] == [0, 2, 4]
        r = out[0]
        assert (r["width"], r["height"], r["n_frames"], r["fps"]) == (
            4, 2, 5, 30.0,
        )

    def test_y_mean_recomputed(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            sample_y4m_frames,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_y4m

        df = self._df(spark, [make_y4m(3, 2, 2, 5)])
        out = {r["frame_idx"]: r["y_mean"] for r in
               sample_y4m_frames(df, every_k=1).collect()}
        for f in (0, 1):
            exp = sum((5 + f * 17 + i) % 256 for i in range(6)) / 6
            assert out[f] == round(exp, 6)

    def test_malformed_dropped(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            sample_y4m_frames,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_y4m

        good = make_y4m(2, 2, 2, 1)
        df = self._df(spark, [good, b"RIFFnot a video", good[:-3]])
        out = sample_y4m_frames(df, every_k=1).collect()
        assert {r["doc_id"] for r in out} == {0}

    def test_c420_frame_size(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_y4m,
        )

        raw = (b"YUV4MPEG2 W2 H2 F25:1 C420\n"
               + b"FRAME\n" + bytes(range(6)))
        w, h, fn, fd, fs, frames = _parse_y4m(raw)
        assert (w, h, fs, len(frames)) == (2, 2, 6, 1)


def test_real_decoder_arg_validation(spark):
    import pytest as _pytest

    from google_analytics_to_s3_spark.operators.multimodal import (
        resize_ppm,
        sample_y4m_frames,
    )

    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "doc_id long, payload binary")
    with _pytest.raises(ValueError, match="every_k"):
        sample_y4m_frames(df, every_k=0)
    with _pytest.raises(ValueError, match="geometry"):
        resize_ppm(df, 0, 4)


class TestPngDecode:
    def test_real_decode_all_filters(self, spark):
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_png_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_png

        rows = []
        for i, filters in enumerate(([0], [1], [2], [3], [4], None)):
            rows.append((i, bytearray(make_png(6, 5, 11 + i, 3, filters))))
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in decode_png_meta(df).collect()}
        for i in range(6):
            y, x, c = np.meshgrid(
                np.arange(5), np.arange(6), np.arange(3), indexing="ij"
            )
            want = ((11 + i + y * 31 + x * 7 + c * 13) % 256)
            assert out[i]["width"] == 6 and out[i]["height"] == 5
            assert out[i]["channels"] == 3
            assert out[i]["decode_error"] is None
            assert out[i]["mean_px"] == round(
                float(want.sum()) / want.size, 6
            )

    def test_gray_and_alpha_channels(self, spark):
        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_png_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_png

        rows = [
            (1, bytearray(make_png(4, 4, 7, 1))),
            (2, bytearray(make_png(4, 4, 7, 2))),
            (4, bytearray(make_png(4, 4, 7, 4))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r["channels"]
               for r in decode_png_meta(df).collect()}
        assert out == {1: 1, 2: 2, 4: 4}

    def test_quarantine_not_crash(self, spark):
        import struct
        import zlib

        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_png_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_png

        good = make_png(3, 3, 1)

        def chunk(ctype, body):
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", crc))

        # r9: 16-bit and Adam7 now DECODE (see
        # test_extended_png_paths); the remaining honest gates are
        # sub-byte grayscale and palette images without PLTE
        gray4 = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 4))
            + chunk(b"IEND", b"")
        )
        no_plte = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 6))
            + chunk(b"IEND", b"")
        )
        rows = [
            (0, bytearray(good)),
            (1, bytearray(b"not a png at all")),
            (2, bytearray(good[:20])),           # truncated
            (3, bytearray(gray4)),
            (4, bytearray(no_plte)),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in decode_png_meta(df).collect()}
        assert out[0]["decode_error"] is None and out[0]["width"] == 3
        assert "signature" in out[1]["decode_error"]
        assert out[2]["decode_error"] is not None
        assert "depth 4" in out[3]["decode_error"]
        assert "PLTE" in out[4]["decode_error"]
        # every row survived — the quarantine contract
        assert len(out) == 5

    def test_extended_png_paths(self, spark):
        """r9 gate closures: 16-bit samples, palette images at every
        index depth, and Adam7 interlacing all decode exactly (the
        fixture-level matrix lives in the make_png_ext verification;
        this pins the Spark operator surface end-to-end)."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_png,
            decode_png_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_png_ext,
            png_palette_rules,
        )

        # 16-bit: mean is exactly 257x the 8-bit rule mean
        w16, h16, c16, px16 = _parse_png(make_png_ext(13, 7, 5, "rgb16"))
        y, x, ci = np.meshgrid(
            np.arange(7), np.arange(13), np.arange(3), indexing="ij"
        )
        exp = ((5 + y * 31 + x * 7 + ci * 13) % 256) * 257
        assert (px16.reshape(7, 13, 3) == exp).all()
        # Adam7 transmits the same pixels in pass order
        _, _, _, px_i = _parse_png(make_png_ext(13, 7, 5, "adam7"))
        assert (px_i.reshape(7, 13, 3) == exp // 257).all()
        # palette at sub-byte depth
        for depth in (1, 2, 4, 8):
            W, H, C, px = _parse_png(
                make_png_ext(17, 3, 9, f"palette{depth}")
            )
            size, pal = png_palette_rules(9, depth)
            yy, xx = np.meshgrid(np.arange(3), np.arange(17),
                                 indexing="ij")
            idx = (9 + yy * 31 + xx * 7) % size
            assert (W, H, C) == (17, 3, 3)
            assert (px.reshape(3, 17, 3)
                    == np.array(pal, dtype=np.uint8)[idx]).all()
        # operator surface
        df = spark.createDataFrame(
            [(1, bytearray(make_png_ext(13, 7, 5, "adam7_rgb16")))],
            "doc_id long, payload binary",
        )
        row = decode_png_meta(df).collect()[0]
        assert row["decode_error"] is None
        assert row["mean_px"] == round(float(exp.sum()) / exp.size, 6)


class TestGifDecode:
    def test_fixture_roundtrip(self, spark):
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            sample_gif_frames,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_gif

        rows = [(1, bytearray(make_gif(4, 3, 5, 3))),
                (2, bytearray(b"not a gif")),
                (3, bytearray(make_gif(2, 2, 9, 1)))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = sample_gif_frames(df, every_k=2).collect()
        got = {(r["doc_id"], r["frame_idx"]): r for r in out}
        # doc 1: frames 0 and 2 sampled; doc 2 dropped; doc 3: frame 0
        assert set(got) == {(1, 0), (1, 2), (3, 0)}
        r = got[(1, 0)]
        assert (r["width"], r["height"], r["n_frames"]) == (4, 3, 3)
        assert r["delay_cs"] == 4
        y, x = np.meshgrid(np.arange(3), np.arange(4), indexing="ij")
        idx = (5 + y * 31 + x * 7) % 256
        want = (idx + (3 * idx) % 256 + (7 * idx) % 256).sum() / (3 * 4 * 3)
        assert r["rgb_mean"] == round(float(want), 6)

    def test_lzw_dictionary_growth_paths(self):
        """The fixture's clear-per-pixel streams never grow the LZW
        table; round-trip a REAL compressor (reference implementation
        here) to exercise table growth, width bumps, and the KwKwK
        code==len(table) case."""
        import random

        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _gif_lzw_decode,
        )

        def lzw_encode(min_code: int, seq: list[int]) -> bytes:
            clear, eoi = 1 << min_code, (1 << min_code) + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
            acc = nbits = 0
            out = bytearray()

            def emit(code: int):
                nonlocal acc, nbits
                acc |= code << nbits
                nbits += width
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8

            emit(clear)
            cur = b""
            for s in seq:
                nxt = cur + bytes([s])
                if nxt in table:
                    cur = nxt
                    continue
                emit(table[cur])
                table[nxt] = next_code
                next_code += 1
                # the decoder bumps width when ITS table hits 2^width;
                # its table size == next_code - ... mirror the spec
                if next_code == (1 << width) + 1 and width < 12:
                    pass
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
                cur = bytes([s])
            if cur:
                emit(table[cur])
            emit(eoi)
            if nbits:
                out.append(acc & 0xFF)
            return bytes(out)

        rng = random.Random(7)
        for min_code, n in ((2, 40), (4, 300), (8, 2000)):
            # repetitive sequences force KwKwK and growth
            seq = []
            while len(seq) < n:
                run = [rng.randrange(1 << min_code)] * rng.randint(1, 6)
                seq.extend(run)
            seq = seq[:n]
            data = lzw_encode(min_code, seq)
            got = _gif_lzw_decode(min_code, data, n)
            assert got.tolist() == seq, (min_code, n)

    def test_quarantine_unsupported_features(self):
        import pytest as _pytest

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_gif,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_gif

        good = bytearray(make_gif(3, 3, 1, 1))
        with _pytest.raises(ValueError, match="signature"):
            _parse_gif(b"PNG89a" + bytes(good[6:]))
        # r9: interlace / LCT / partial canvas decode; r10: disposal
        # 3 decodes too (see test_extended_gif_paths) — on a single
        # frame the post-display restore is invisible, so the
        # spliced stream decodes identically to the plain one
        d3 = bytearray(good)
        desc = d3.index(0x2C, 13 + 768)
        gce = bytes([0x21, 0xF9, 4, 3 << 2, 0, 0, 0, 0])
        d3[desc:desc] = gce
        _, _, plain_frames, _ = _parse_gif(bytes(good))
        _, _, d3_frames, _ = _parse_gif(bytes(d3))
        assert len(d3_frames) == len(plain_frames) == 1
        assert (d3_frames[0] == plain_frames[0]).all()
        # reserved disposal methods (4-7) still quarantine
        bad = bytearray(good)
        gce = bytes([0x21, 0xF9, 4, 4 << 2, 0, 0, 0, 0])
        bad[desc:desc] = gce
        with _pytest.raises(ValueError, match="reserved GIF disposal"):
            _parse_gif(bytes(bad))

    def test_extended_gif_paths(self):
        """r9 gate closures: local color tables, interlaced frames,
        partial-canvas compositing, transparency and disposal-2
        restore all decode to the independently recomputed canvas
        (rule recomputation mirrors the spec compositing model, not
        the decoder's code path)."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_gif,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            gif_ext_frame_geom,
            gif_ext_palette,
            make_gif_ext,
        )

        def expected(w, h, seed, n, transparent=False,
                     disposal2_last=False, disposal3_last=False):
            gpal = np.array(gif_ext_palette(seed, 0, False),
                            dtype=np.uint8)
            canvas = np.broadcast_to(gpal[1], (h, w, 3)).copy()
            frames, T = [], seed % 256
            for f in range(n):
                left, top, fw, fh = (
                    (0, 0, w, h) if f == 0
                    else gif_ext_frame_geom(w, h, f)
                )
                pre = canvas[top:top + fh, left:left + fw].copy()
                pal = np.array(gif_ext_palette(seed, f, f % 2 == 1),
                               dtype=np.uint8)
                for ry in range(fh):
                    for rx in range(fw):
                        yy, xx = top + ry, left + rx
                        idx = (seed + f * 17 + yy * 31 + xx * 7) % 256
                        if transparent and f >= 1 and idx == T:
                            continue
                        canvas[yy, xx] = pal[idx]
                frames.append(canvas.reshape(-1).copy())
                if disposal2_last and f == n - 2:
                    canvas[top:top + fh, left:left + fw] = gpal[1]
                if disposal3_last and f == n - 2:
                    canvas[top:top + fh, left:left + fw] = pre
            return frames

        for w, h in ((8, 6), (13, 9)):
            for kw in ({}, {"transparent": True},
                       {"disposal2_last": True},
                       {"disposal3_last": True}):
                W, H, frames, delays = _parse_gif(
                    make_gif_ext(w, h, 7, 4, **kw)
                )
                exp = expected(w, h, 7, 4, **kw)
                assert (W, H) == (w, h) and len(frames) == 4
                for f in range(4):
                    assert (frames[f] == exp[f]).all(), (w, h, kw, f)
                assert delays == [4, 5, 6, 7]


class TestJpegDecode:
    """REAL baseline-JPEG decode: T.81 Huffman + dequant + IDCT."""

    def test_fixture_roundtrip_against_reference_idct(self):
        """Decoder (vectorized matrix IDCT) reproduces the fixture's
        independent textbook-loop IDCT for every template/DC mix."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            jpeg_block_plan, make_jpeg_baseline, ref_idct_block,
        )

        for seed in (0, 1, 7, 42, 120, 999):
            w, h, c, px = _parse_jpeg(make_jpeg_baseline(seed, 16, 16))
            assert (w, h, c) == (16, 16, 1)
            img = px.reshape(h, w)
            for b, coefs in enumerate(jpeg_block_plan(seed, 4)):
                by, bx = divmod(b, 2)
                want = np.clip(
                    np.rint(ref_idct_block(coefs) + 128.0), 0, 255
                ).astype(np.uint8)
                got = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                assert (want == got).all(), (seed, b)

    def test_ac_templates_margin_and_no_clamp(self):
        """The oracle's integer replay requires every AC pixel
        contribution to sit > 1e-2 from a .5 rounding boundary and the
        DC range to never clamp — pinned here so template edits can't
        silently break the arithmetic contract."""
        import numpy as np

        from google_analytics_to_s3_spark.testing.fixtures import (
            JPEG_AC_TEMPLATES, ref_idct_block,
        )

        for t in JPEG_AC_TEMPLATES:
            contrib = ref_idct_block(t)
            frac = np.abs(np.abs(contrib - np.floor(contrib)) - 0.5)
            if t:  # T0 is all-zero: distance is exactly 0.5
                assert frac.min() > 1e-2
            # dc in [-60, 60]: 128 - 60 - max|t| > 0, 128 + 60 + max|t| < 255
            assert np.abs(contrib).max() + 60 + 128 < 255
            assert 128 - 60 - np.abs(contrib).max() > 0

    def test_larger_geometry_and_zrl_path(self):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline,
        )

        # 32x24 -> 12 blocks; seeds cycle all 5 templates incl. the
        # ZRL one (zigzag gap > 15 in T4)
        w, h, c, px = _parse_jpeg(make_jpeg_baseline(3, 32, 24))
        assert (w, h, c) == (32, 24, 1) and px.size == 32 * 24

    def test_quarantine_unsupported_and_malformed(self, spark):
        import pandas as pd

        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_jpeg_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline,
        )

        good = make_jpeg_baseline(5)
        # SOF2 now DECODES (r8) — a forged SOF2 marker on a BASELINE
        # scan header is instead rejected as malformed progressive
        # (the single baseline scan claims Ss=0..Se=63, illegal for a
        # progressive DC scan)
        progressive = bytearray(good)
        idx = good.find(b"\xFF\xC0")
        progressive[idx + 1] = 0xC2  # SOF2 marker, baseline scan
        lossless = bytearray(good)
        lossless[idx + 1] = 0xC3  # SOF3: lossless, still gated
        cases = [
            (1, good),
            (2, b"\x00\x01not a jpeg"),
            (3, bytes(lossless)),
            (4, good[:40]),  # truncated in headers
            (5, good[:-20]),  # truncated entropy data
            (6, bytes(progressive)),
        ]
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [c[0] for c in cases],
                          "payload": [c[1] for c in cases]})
        )
        rows = {r.doc_id: r for r in decode_jpeg_meta(df).collect()}
        from google_analytics_to_s3_spark.testing.fixtures import (
            jpeg_block_plan, jpeg_template_round_sums,
        )

        assert rows[1].decode_error is None and rows[1].width == 16
        rs = jpeg_template_round_sums()
        want = sum(
            64 * (128 + p[0]) + rs[(5 + b) % 5]
            for b, p in enumerate(jpeg_block_plan(5, 4))
        )
        assert rows[1].y_sum == want
        assert "not a JPEG" in rows[2].decode_error
        assert "unsupported SOF" in rows[3].decode_error
        assert rows[4].decode_error is not None
        assert rows[5].decode_error is not None
        assert "Se = 0" in rows[6].decode_error
        # the batch never fails: every row came back
        assert len(rows) == 6

    def test_dc_prediction_across_blocks(self):
        """DC coefficients are DIFFERENTIALLY coded: decoding must
        accumulate the prediction, not read absolute values."""
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            jpeg_block_plan, make_jpeg_baseline,
        )

        seed = 11
        w, h, c, px = _parse_jpeg(make_jpeg_baseline(seed, 16, 16))
        img = px.reshape(h, w)
        plan = jpeg_block_plan(seed, 4)
        # block DCs differ -> distinct block means prove the chain
        means = [img[8 * (b // 2):8 * (b // 2) + 8,
                     8 * (b % 2):8 * (b % 2) + 8].mean() for b in range(4)]
        dcs = [p[0] for p in plan]
        order_means = sorted(range(4), key=lambda b: means[b])
        order_dcs = sorted(range(4), key=lambda b: dcs[b])
        assert order_means == order_dcs

    def test_color_444_roundtrip_against_reference(self):
        """3-component interleaved MCUs: per-component DC prediction +
        JFIF YCbCr->RGB. Expected pixels from the fixture's textbook
        IDCT planes through the same published conversion constants."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            jpeg_block_plan, make_jpeg_baseline, ref_idct_block,
        )

        for seed in (0, 9, 42):
            w, h, c, px = _parse_jpeg(
                make_jpeg_baseline(seed, 16, 16, channels=3)
            )
            assert (w, h, c) == (16, 16, 3)
            img = px.reshape(h, w, 3)
            planes = np.empty((3, 16, 16), dtype=np.float64)
            for ci in range(3):
                for b, coefs in enumerate(
                    jpeg_block_plan(seed + 1000 * ci, 4)
                ):
                    by, bx = divmod(b, 2)
                    planes[ci, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] \
                        = ref_idct_block(coefs) + 128.0
            y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
            want = np.clip(np.rint(np.stack([
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ], axis=-1)), 0, 255).astype(np.uint8)
            assert (want == img).all(), seed

    def test_color_channels_reported_in_meta(self, spark):
        import pandas as pd

        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_jpeg_meta,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline,
        )

        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "payload": [make_jpeg_baseline(7),
                        make_jpeg_baseline(7, channels=3)],
        }))
        rows = {r.doc_id: r for r in decode_jpeg_meta(df).collect()}
        assert rows[1].channels == 1 and rows[2].channels == 3
        assert rows[2].decode_error is None

    def test_chroma_subsampled_roundtrip_against_reference(self):
        """4:2:0 and 4:2:2 baseline color (the variants real crawls
        actually ship): general interleaved-MCU ordering (T.81 A.2.3
        — Y's hs*vs blocks row-major, then one block per chroma
        component, DC prediction per component across the whole scan)
        plus JFIF nearest-neighbor chroma upsampling. Expected pixels
        come from the fixture's independent textbook IDCT on each
        component's OWN grid, np.repeat-upsampled, through the same
        published conversion constants — pixel-exact."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            jpeg_block_plan, make_jpeg_baseline, ref_idct_block,
        )

        def ref_rgb(seed, w, h, sub, chroma_dc=None):
            hs, vs = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[sub]
            ybw, ybh = w // 8, h // 8
            cbw, cbh = w // (8 * hs), h // (8 * vs)
            yplane = np.empty((h, w))
            yplan = jpeg_block_plan(seed, ybw * ybh)
            for by in range(ybh):
                for bx in range(ybw):
                    yplane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                        ref_idct_block(yplan[by * ybw + bx]) + 128.0
                    )
            cplanes = []
            for ci in range(2):
                p = np.empty((cbh * 8, cbw * 8))
                if chroma_dc is not None:
                    plan = [{0: chroma_dc[ci]}] * (cbw * cbh)
                else:
                    plan = jpeg_block_plan(seed + 1000 * (ci + 1),
                                           cbw * cbh)
                for by in range(cbh):
                    for bx in range(cbw):
                        p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                            ref_idct_block(plan[by * cbw + bx]) + 128.0
                        )
                p = np.repeat(np.repeat(p, vs, axis=0), hs, axis=1)
                cplanes.append(p[:h, :w])
            y, cb, cr = yplane, cplanes[0] - 128.0, cplanes[1] - 128.0
            return np.clip(np.rint(np.stack([
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ], axis=-1)), 0, 255).astype(np.uint8)

        cases = [
            (5, 32, 16, "420", None),
            (9, 32, 16, "422", None),
            (11, 48, 32, "420", (13, -9)),
            (7, 32, 32, "420", (0, 0)),
        ]
        for seed, w, h, sub, cdc in cases:
            raw = make_jpeg_baseline(
                seed, w, h, channels=3, subsampling=sub, chroma_dc=cdc
            )
            dw, dh, dc_, px = _parse_jpeg(raw)
            assert (dw, dh, dc_) == (w, h, 3), (seed, sub)
            want = ref_rgb(seed, w, h, sub, cdc)
            assert (px.reshape(h, w, 3) == want).all(), (seed, sub)
        # chroma_dc=(0,0): zero chroma offset means RGB is exactly the
        # replicated Y channel — the integer grid the driver oracle
        # replays (jpeg_decode_420)
        raw = make_jpeg_baseline(
            7, 32, 32, channels=3, subsampling="420", chroma_dc=(0, 0)
        )
        _w, _h, _c, px = _parse_jpeg(raw)
        rgb = px.reshape(32, 32, 3)
        assert (rgb[:, :, 0] == rgb[:, :, 1]).all()
        assert (rgb[:, :, 0] == rgb[:, :, 2]).all()

    def test_restart_intervals_decode_identically(self):
        """DRI support (T.81 E.1.4): a stream with genuine cycling
        RSTn markers and DC-predictor resets decodes pixel-identical
        to the same coefficient plan without restarts — including an
        interval of 1 over 12 MCUs (the RST number must wrap past 7)
        and a subsampled-MCU geometry. The DC reset is load-bearing:
        the encoder re-bases every restart segment, so a decoder that
        skipped markers without resetting predictors would produce
        wrong DC levels everywhere after the first restart."""
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline,
        )

        cases = [
            (3, 32, 24, 1, "444", 2),
            (5, 32, 32, 3, "444", 1),
            (7, 32, 32, 3, "420", 3),
            (11, 48, 16, 1, "444", 1),  # 12 MCUs: RST wraps past 7
        ]
        for seed, w, h, ch, sub, dri in cases:
            base = _parse_jpeg(make_jpeg_baseline(
                seed, w, h, ch, subsampling=sub))
            got = _parse_jpeg(make_jpeg_baseline(
                seed, w, h, ch, subsampling=sub, restart_interval=dri))
            assert base[:3] == got[:3]
            assert (base[3] == got[3]).all(), (seed, sub, dri)

    def test_restart_marker_sequence_violation_quarantines(self):
        import pytest as _pytest

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline,
        )

        raw = bytearray(
            make_jpeg_baseline(3, 32, 24, 1, restart_interval=2)
        )
        idx = raw.find(b"\xFF\xD0")
        raw[idx + 1] = 0xD5  # out-of-sequence restart number
        with _pytest.raises(ValueError, match="expected restart"):
            _parse_jpeg(bytes(raw))

    def test_progressive_equals_baseline_pixel_for_pixel(self):
        """PROGRESSIVE decode (SOF2, T.81 annex G — the libjpeg
        default for web JPEGs): the progressive fixture re-encodes
        the SAME planted coefficients as the baseline fixture through
        a real multi-scan script (interleaved DC first pass at Al,
        per-component spectral-selection AC first passes with EOB-RUN
        coding, DC bit-plane refinements, and the G.1.2.3 AC
        correction-bit refinement protocol with buffered bits and
        cross-block EOB runs), so decoded pixels must equal the
        baseline decode EXACTLY. Covers grayscale, 4:4:4 / 4:2:2 /
        4:2:0 color, zero-chroma, and a two-level successive
        approximation (al=2: two DC and two AC refinement rounds)."""
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline, make_jpeg_progressive,
        )

        cases = [
            (3, 16, 16, 1, "444", None, 1),
            (5, 32, 24, 1, "444", None, 1),
            (7, 16, 16, 3, "444", None, 1),
            (9, 32, 32, 3, "420", None, 1),
            (11, 32, 16, 3, "422", None, 1),
            (13, 32, 32, 3, "420", (0, 0), 1),
            (17, 16, 16, 1, "444", None, 2),
        ]
        for seed, w, h, ch, sub, cdc, al in cases:
            base = _parse_jpeg(make_jpeg_baseline(
                seed, w, h, ch, subsampling=sub, chroma_dc=cdc))
            prog = _parse_jpeg(make_jpeg_progressive(
                seed, w, h, ch, subsampling=sub, chroma_dc=cdc, al=al))
            assert base[:3] == prog[:3]
            assert (base[3] == prog[3]).all(), (seed, sub, al)

    def test_progressive_truncated_scan_quarantines(self):
        import pytest as _pytest

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_progressive,
        )

        raw = make_jpeg_progressive(3, 16, 16, 1)
        with _pytest.raises(ValueError):
            _parse_jpeg(raw[:-40])  # EOI + last refinement scan gone

    def test_subsampling_factor_gate_narrowed(self):
        """Factors outside {1,2,4} still quarantine with a named
        error (the honest gate after the 4:2:0/4:2:2 extension)."""
        import pytest as _pytest

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline,
        )

        raw = bytearray(make_jpeg_baseline(5, 16, 16, channels=3))
        idx = raw.find(b"\xFF\xC0")
        # component 0's sampling byte sits 10 bytes past the marker
        # (marker 2 + len 2 + prec 1 + h 2 + w 2 + ncomp 1 + cid 1)
        raw[idx + 11] = 0x31  # 3x1: unsupported factor
        with _pytest.raises(ValueError, match="sampling factor"):
            _parse_jpeg(bytes(raw))


class TestFlacStereo:
    """Stereo FLAC: all four channel assignments decode to the exact
    planted L/R samples (lossless), side subframes at 17 bits."""

    def _expect(self, seed, n, block_size=512):
        import numpy as np

        L = np.empty(n, dtype=np.int64)
        R = np.empty(n, dtype=np.int64)
        pos, fno = 0, 0
        cycle = ("fixed2", "verbatim", "constant")
        while pos < n:
            bs = min(block_size, n - pos)
            if cycle[fno % 3] == "constant":
                L[pos:pos + bs] = seed % 512
                R[pos:pos + bs] = (seed * 3) % 512
            else:
                i = np.arange(pos, pos + bs)
                L[pos:pos + bs] = ((seed + i * 257) % 2001) - 1000
                R[pos:pos + bs] = ((seed * 3 + i * 181) % 1801) - 900
            pos += bs
            fno += 1
        return L, R

    def test_all_four_channel_assignments_exact(self):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        for mode in ("independent", "left_side", "right_side",
                     "mid_side"):
            sr, n, s = _parse_flac(
                make_flac(7, channels=2, stereo_mode=mode)
            )
            assert s.shape == (1200, 2)
            L, R = self._expect(7, 1200)
            assert (s[:, 0] == L).all(), mode
            assert (s[:, 1] == R).all(), mode

    def test_mid_side_reconstruction_is_load_bearing(self):
        """mid = (L+R)>>1 floors away the LSB; the (mid<<1)|(side&1)
        reconstruction must recover it. Verify on an odd-sum pair."""
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        sr, n, s = _parse_flac(
            make_flac(1, n_samples=512, channels=2,
                      stereo_mode="mid_side",
                      subframe_cycle=("verbatim",))
        )
        L, R = self._expect(1, 512)
        odd = (L + R) % 2 == 1
        assert odd.any()  # the LSB path is actually exercised
        assert (s[:, 0] == L).all() and (s[:, 1] == R).all()

    def test_mono_regression_and_escape_stereo(self):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        sr, n, s = _parse_flac(make_flac(5))
        assert s.shape == (1200,)
        L, _ = self._expect(5, 1200)
        assert (s == L).all()
        sr, n, s = _parse_flac(
            make_flac(9, channels=2, stereo_mode="mid_side",
                      rice_escape=True)
        )
        L, R = self._expect(9, 1200)
        assert (s[:, 0] == L).all() and (s[:, 1] == R).all()

    def test_lpc_subframes_decode_exactly(self):
        """REAL LPC subframes (r8): quantized order-2 predictor
        [3, -1] at precision 5, shift 1 — the decoder must replay
        the arithmetic FLOOR shift of the accumulated dot product
        (RFC 9639 §9.2.5; a truncating shift would be off by one on
        negative accumulations, which the planted sign-varying rule
        hits). Mixed LPC/FIXED cycles and LPC-inside-mid/side both
        pinned exact."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        def left(seed, n, cycle, block_size=512):
            out = np.empty(n, dtype=np.int64)
            pos, fno = 0, 0
            while pos < n:
                bs = min(block_size, n - pos)
                if cycle[fno % len(cycle)] == "constant":
                    out[pos:pos + bs] = seed % 512
                else:
                    i = np.arange(pos, pos + bs)
                    out[pos:pos + bs] = ((seed + i * 257) % 2001) - 1000
                pos += bs
                fno += 1
            return out

        cyc = ("lpc", "fixed2", "lpc")
        sr, n, s = _parse_flac(make_flac(11, subframe_cycle=cyc))
        assert (s == left(11, 1200, cyc)).all()
        # negative accumulations really occur (floor-shift coverage)
        sr, n, s = _parse_flac(
            make_flac(13, channels=2, stereo_mode="mid_side",
                      subframe_cycle=("lpc",))
        )
        L = left(13, 1200, ("lpc",))
        R = np.array(
            [((13 * 3 + i * 181) % 1801) - 900 for i in range(1200)]
        )
        assert (s[:, 0] == L).all() and (s[:, 1] == R).all()

    def test_lpc_order4_order8_decode_exactly(self):
        """r9: LPC orders 4 and 8 with SIGN-VARYING quantized
        coefficient sets (the `flac -8` shape: [7,-6,2,-1]/2^2 and
        [26,-39,42,-38,28,-17,8,-2]/2^5) decode sample-exact, and
        lpc4/lpc8 carry Rice partition orders 1/2 — the first
        coverage of the multi-partition residual path (per-partition
        parameters, first partition short by `order`, RFC 9639
        §9.2.7). 24-bit lpc8 residuals exceed the 4-bit parameter
        range and must select coding method 1 (rice2)."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        def left(seed, n, cycle, block_size=512):
            out = np.empty(n, dtype=np.int64)
            pos, fno = 0, 0
            while pos < n:
                bs = min(block_size, n - pos)
                if cycle[fno % len(cycle)] == "constant":
                    out[pos:pos + bs] = seed % 512
                else:
                    i = np.arange(pos, pos + bs)
                    out[pos:pos + bs] = ((seed + i * 257) % 2001) - 1000
                pos += bs
                fno += 1
            return out

        for cyc in (("lpc4",), ("lpc8",), ("lpc4", "lpc8", "lpc")):
            for seed, n in ((0, 800), (7, 2400), (999, 515)):
                sr, total, s = _parse_flac(
                    make_flac(seed, n_samples=n, subframe_cycle=cyc)
                )
                assert (s == left(seed, n, cyc)).all(), (cyc, seed, n)
        # high-order LPC through stereo decorrelation and 24-bit
        # (method-1 rice2 parameters) and wasted-bits reconstruction
        _, _, s2 = _parse_flac(
            make_flac(13, channels=2, stereo_mode="mid_side",
                      subframe_cycle=("lpc8", "lpc4"))
        )
        L = left(13, 1200, ("lpc8", "lpc4"))
        R = np.array(
            [((13 * 3 + i * 181) % 1801) - 900 for i in range(1200)]
        )
        assert (s2[:, 0] == L).all() and (s2[:, 1] == R).all()
        _, _, s3 = _parse_flac(
            make_flac(5, n_samples=1100, subframe_cycle=("lpc8",),
                      bps=24)
        )
        assert (s3 == left(5, 1100, ("lpc8",)) * 256).all()
        _, _, s4 = _parse_flac(
            make_flac(5, n_samples=1100, subframe_cycle=("lpc4",),
                      wasted_bits=3)
        )
        assert (s4 == left(5, 1100, ("lpc4",)) << 3).all()

    def test_multichannel_independent_decodes_exactly(self):
        """r8: 3-8 INDEPENDENT channels decode for real (channel c
        plants its own (prime, modulus) rule); a STREAMINFO/frame
        channel-count mismatch still quarantines."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        primes = (257, 181, 163, 149, 139, 127, 113, 109)
        mods = (2001, 1801, 1601, 1401, 1201, 1001, 801, 601)

        def chan(seed, n, c, bs=512):
            out = np.empty(n, dtype=np.int64)
            pos, fno = 0, 0
            cyc = ("fixed2", "verbatim", "constant")
            while pos < n:
                blk = min(bs, n - pos)
                if cyc[fno % 3] == "constant":
                    out[pos:pos + blk] = (seed * (2 * c + 1)) % 512
                else:
                    i = np.arange(pos, pos + blk)
                    m = mods[c]
                    out[pos:pos + blk] = (
                        (seed * (2 * c + 1) + i * primes[c]) % m
                    ) - (m - 1) // 2
                pos += blk
                fno += 1
            return out

        for nch in (3, 8):
            sr, n, s = _parse_flac(make_flac(7, channels=nch))
            assert s.shape == (1200, nch)
            for c in range(nch):
                assert (s[:, c] == chan(7, 1200, c)).all(), (nch, c)

    def test_channel_count_mismatch_quarantines(self, spark):
        import pandas as pd
        import pytest as _pytest

        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_flac_features,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        raw = bytearray(make_flac(3))
        # STREAMINFO channels-1 lives in byte 12 bits 3-1 (after the
        # 4-byte magic and 4-byte block header => offset 8 + 12);
        # forging 3 channels now disagrees with the mono frames
        raw[8 + 12] = (raw[8 + 12] & ~0x0E) | (2 << 1)
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "payload": [bytes(raw)],
        }))
        r = decode_flac_features(df).collect()[0]
        assert "disagrees" in r["decode_error"]


class TestFlacDecode:
    """REAL FLAC decode: fixed-predictor subset, Rice residuals,
    CRC-verified frames. Lossless -> sample equality is exact."""

    def _expected(self, seed, n):
        import numpy as np

        def sample(i):
            return ((seed + i * 257) % 2001) - 1000

        exp = np.empty(n, dtype=np.int64)
        for i in range(n):
            exp[i] = seed % 512 if (i // 512) % 3 == 2 else sample(i)
        return exp

    def test_roundtrip_all_subframe_types(self):
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        for seed in (0, 7, 999):
            for n in (800, 1200, 2400):
                sr, total, s = _parse_flac(make_flac(seed, n_samples=n))
                assert (sr, total) == (16000, n)
                assert (s == self._expected(seed, n)).all(), (seed, n)

    def test_rice_escape_partition_roundtrip(self):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        _, _, s = _parse_flac(
            make_flac(42, n_samples=600, rice_escape=True)
        )
        assert (s == self._expected(42, 600)[:600]).all()

    def test_rice_escape_zero_width_partition(self):
        """RFC 9639 allows a 0-bit raw width for the escape code —
        an all-zero residual partition with NO payload bits. Real
        encoders emit it for silent/linear blocks; the decoder must
        not treat width 0 as an error (pre-fix: ValueError from
        ``1 << (rawbits - 1)``)."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        for seed, n in ((0, 600), (7, 1200), (42, 700)):
            sr, total, s = _parse_flac(
                make_flac(seed, n_samples=n, subframe_cycle=("escape0",))
            )
            assert (sr, total) == (16000, n)
            base = (seed % 257) - 128
            exp = np.concatenate([
                base + np.arange(min(512, n - p), dtype=np.int64)
                for p in range(0, n, 512)
            ])
            assert (s == exp).all(), (seed, n)
        # the zero-width path through stereo decorrelation and
        # wasted-bits reconstruction
        _, _, s2 = _parse_flac(
            make_flac(9, n_samples=700, subframe_cycle=("escape0",),
                      channels=2, stereo_mode="mid_side")
        )
        assert s2.shape == (700, 2)
        _, _, s3 = _parse_flac(
            make_flac(9, n_samples=700, subframe_cycle=("escape0",),
                      bps=24, wasted_bits=2)
        )
        assert int(s3[1] - s3[0]) == 256 << 2  # scaled linear slope

    def test_compression_is_real(self):
        """The fixed-predictor frame Rice-codes below raw PCM size —
        the stream is genuinely compressed, not verbatim-in-disguise."""
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        raw = make_flac(7, n_samples=2400)
        assert len(raw) < 2400 * 2  # 16-bit PCM would be 4800 B + headers

    def test_quarantine_unsupported_and_corrupt(self, spark):
        import pandas as pd

        from google_analytics_to_s3_spark.operators.multimodal import (
            decode_flac_features,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        good = make_flac(5, n_samples=800)
        bad_crc = bytearray(good)
        bad_crc[-1] ^= 0xFF  # corrupt the final frame CRC-16
        cases = [
            (1, good),
            (2, b"RIFFnot a flac"),
            (3, bytes(bad_crc)),
            (4, good[:60]),  # truncated after metadata
        ]
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [c[0] for c in cases],
            "payload": [c[1] for c in cases],
        }))
        rows = {r.doc_id: r for r in decode_flac_features(df).collect()}
        assert rows[1].decode_error is None
        assert rows[1].n_samples == 800 and rows[1].sample_rate_hz == 16000
        assert "not a FLAC" in rows[2].decode_error
        assert "CRC" in rows[3].decode_error
        assert rows[4].decode_error is not None
        assert len(rows) == 4  # quarantine never fails the batch


class TestSmallGateClosures:
    """r8 gate closures: 16-bit DQT entries and FLAC wasted-bits
    subframes — both decode for real now, pinned exact."""

    def test_16bit_dqt_decodes_identically(self):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_jpeg,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_jpeg_baseline,
        )

        for seed in (3, 7, 42):
            a = _parse_jpeg(make_jpeg_baseline(seed, 16, 16, 3))
            b = _parse_jpeg(
                make_jpeg_baseline(seed, 16, 16, 3, dqt_16bit=True)
            )
            assert a[:3] == b[:3]
            assert (a[3] == b[3]).all(), seed

    def test_flac_wasted_bits_reconstruct_scaled_samples(self):
        """The wasted-bits header (flag + unary(k-1)) narrows the
        coded sample width by k and the decoder shifts back: planted
        samples scaled by 2^k round-trip exactly, incl. in stereo
        subframes at bps+1."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_flac,
        )

        def expect_left(seed, n, mult, block_size=512):
            out = np.empty(n, dtype=np.int64)
            pos, fno = 0, 0
            cyc = ("fixed2", "verbatim", "constant")
            while pos < n:
                bs = min(block_size, n - pos)
                if cyc[fno % 3] == "constant":
                    out[pos:pos + bs] = (seed % 512) * mult
                else:
                    i = np.arange(pos, pos + bs)
                    out[pos:pos + bs] = (
                        ((seed + i * 257) % 2001) - 1000
                    ) * mult
                pos += bs
                fno += 1
            return out

        sr, n, s = _parse_flac(make_flac(5, wasted_bits=2))
        assert (s == expect_left(5, 1200, 4)).all()
        sr, n, s = _parse_flac(
            make_flac(9, channels=2, stereo_mode="independent",
                      wasted_bits=3)
        )
        assert (s[:, 0] == expect_left(9, 1200, 8)).all()


class TestFlacBitDepths:
    """r8: 8- and 24-bit FLAC decode for real (frame ss_code checked
    against STREAMINFO; 24-bit residuals force the 5-bit Rice2
    coding method; stereo side subframes run at bps+1 = 25)."""

    def test_depths_roundtrip_exactly(self):
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        def chan(seed, n, c, bps, bs=512):
            primes, modsv = (257, 181), (2001, 1801)
            scale = 256 if bps == 24 else 1
            m = modsv[c] if bps != 8 else 201
            cmod = 512 if bps != 8 else 100
            out = np.empty(n, dtype=np.int64)
            pos, fno = 0, 0
            cyc = ("fixed2", "verbatim", "constant")
            while pos < n:
                blk = min(bs, n - pos)
                if cyc[fno % 3] == "constant":
                    out[pos:pos + blk] = (
                        (seed * (2 * c + 1)) % cmod
                    ) * scale
                else:
                    i = np.arange(pos, pos + blk)
                    out[pos:pos + blk] = (
                        ((seed * (2 * c + 1) + i * primes[c]) % m)
                        - (m - 1) // 2
                    ) * scale
                pos += blk
                fno += 1
            return out

        for bps in (8, 24):
            sr, n, s = _parse_flac(make_flac(7, bps=bps))
            assert (s == chan(7, 1200, 0, bps)).all(), bps
        sr, n, s = _parse_flac(
            make_flac(9, channels=2, stereo_mode="mid_side", bps=24)
        )
        assert (s[:, 0] == chan(9, 1200, 0, 24)).all()
        assert (s[:, 1] == chan(9, 1200, 1, 24)).all()

    def test_sample_size_disagreement_quarantines(self):
        import pytest as _pytest

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_flac

        raw = bytearray(make_flac(3))
        # first frame header byte 3 carries the sample-size code in
        # bits 3-1; find the frame sync and flip 16-bit -> 24-bit
        idx = raw.find(b"\xff\xf8")
        raw[idx + 3] = (raw[idx + 3] & ~0x0E) | (0b110 << 1)
        with _pytest.raises(ValueError, match="disagrees|CRC"):
            _parse_flac(bytes(raw))


class TestImaAdpcm:
    def test_core_loop_matches_audioop_bitexact(self):
        """The IMA nibble recursion (step table, bit-gated diff,
        clamps) matches CPython's audioop over random nibble streams
        — an independent implementation of the same reference
        algorithm. The audioop outputs are frozen as sha256 digests
        in golden_g711_adpcm (audioop is removed in Python 3.13)."""
        import array
        import hashlib
        import random

        from google_analytics_to_s3_spark.operators.multimodal import (
            _ima_decode_nibbles,
        )
        from tests.golden_g711_adpcm import ADPCM_CORE_SHA256

        rng = random.Random(1)
        for case, want in enumerate(ADPCM_CORE_SHA256):
            n = rng.randrange(2, 300) * 2
            nibbles = [rng.randrange(16) for _ in range(n)]
            mine, _p, _i = _ima_decode_nibbles(nibbles, 0, 0)
            got = hashlib.sha256(
                array.array("h", mine).tobytes()
            ).hexdigest()
            assert got == want, f"case {case}"

    def test_wav_blocks_decode_with_per_block_state(self):
        """fmt-0x11 WAV: per-block predictor/index headers seed the
        recursion; low-nibble-first layout; the per-block oracle is
        audioop seeded with each block's state, frozen as literal
        sample lists in golden_g711_adpcm (audioop is removed in
        Python 3.13)."""
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_wav,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_wav
        from tests.golden_g711_adpcm import ADPCM_WAV_EXPECTED

        for seed, exp in ADPCM_WAV_EXPECTED.items():
            nblocks = 5
            rate, s = _parse_wav(make_wav(nblocks, seed, fmt="ima"))
            assert rate == 16000 and len(s) == nblocks * 9
            assert list(s) == exp, seed


class TestWavFloatAndExtensible:
    def test_float32_q15_lossless_and_extensible_unwrap(self):
        """IEEE-float WAV (fmt 3) decodes to Q15 integers by an exact
        scale (planted multiples of 2**-15 reconstruct losslessly);
        WAVE_FORMAT_EXTENSIBLE (0xFFFE) unwraps to the SubFormat tag
        for every wrapped format and decodes identically to the
        plain-tag stream."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_wav,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_wav

        for seed, n in ((0, 400), (7, 1001)):
            i = np.arange(n)
            base = ((seed + i * 257) % 2001) - 1000
            rate, s = _parse_wav(make_wav(n, seed, fmt="float32"))
            assert rate == 16000 and (s == base).all()
            for fmt in ("pcm16", "float32", "ulaw", "pcm24", "alaw"):
                a = _parse_wav(make_wav(n, seed, fmt=fmt))
                b = _parse_wav(
                    make_wav(n, seed, fmt=fmt, extensible=True)
                )
                assert a[0] == b[0] and (a[1] == b[1]).all(), fmt
        # gates: non-finite floats and nested extensible quarantine
        import struct

        import pytest as _pt
        raw = bytearray(make_wav(8, 1, fmt="float32"))
        data_at = raw.index(b"data") + 8
        raw[data_at:data_at + 4] = struct.pack("<f", float("nan"))
        with _pt.raises(ValueError, match="non-finite"):
            _parse_wav(bytes(raw))
        raw2 = bytearray(make_wav(8, 1, fmt="pcm16", extensible=True))
        # SubFormat tag -> 0xFFFE (nested)
        fmt_at = raw2.index(b"fmt ") + 8
        raw2[fmt_at + 24:fmt_at + 26] = struct.pack("<H", 0xFFFE)
        with _pt.raises(ValueError, match="nested extensible"):
            _parse_wav(bytes(raw2))


class TestFlac32Bit:
    def test_32bit_lossless_replay(self):
        """32-bit FLAC (ss_code 0b111): decoded samples equal the
        planted 2^15-scaled rules exactly."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_flac,
        )
        for seed in (0, 7, 123, 999):
            n = 1200
            sr, total, samples = _parse_flac(
                make_flac(seed, n_samples=n, bps=32))
            exp = np.empty(n, dtype=np.int64)
            for i in range(n):
                if (i // 512) % 3 == 2:
                    exp[i] = (seed % 512) * 32768
                else:
                    exp[i] = (((seed + i * 257) % 2001) - 1000) * 32768
            assert sr == 16000 and total == n
            assert np.array_equal(samples.astype(np.int64), exp), seed

    def test_32bit_stereo_side_at_33_bits(self):
        """Decorrelated stereo at 32 bps carries 33-bit side
        subframes — the widest path RFC 9639 allows."""
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_flac,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_flac,
        )
        ind = _parse_flac(make_flac(9, n_samples=600, bps=32,
                                    channels=2,
                                    stereo_mode="independent"))[2]
        mid = _parse_flac(make_flac(9, n_samples=600, bps=32,
                                    channels=2,
                                    stereo_mode="mid_side"))[2]
        assert np.array_equal(ind, mid)


class TestBmp:
    def test_all_variants_pixel_exact(self):
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_bmp,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            bmp_index_rule,
            bmp_palette_rule,
            bmp_pixel_rule,
            make_bmp,
        )
        for seed in (0, 9, 250, 999):
            for variant in range(4):
                w, h, c, px = _parse_bmp(make_bmp(seed, variant))
                assert (w, h, c) == (13, 7, 3)
                exp = np.zeros((7, 13, 3), dtype=np.int64)
                for y in range(7):
                    for x in range(13):
                        if variant < 2:
                            for cc in range(3):
                                exp[y, x, cc] = bmp_pixel_rule(
                                    seed, x, y, cc)
                        else:
                            exp[y, x] = bmp_palette_rule(
                                seed, bmp_index_rule(seed, x, y))
                assert np.array_equal(px.astype(np.int64), exp), (
                    seed, variant)

    def test_gates_and_corruption(self):
        import random
        import time

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_bmp,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_bmp,
        )
        import pytest as _pt

        raw = bytearray(make_bmp(5, 0))
        raw[28] = 16  # 16-bit depth
        with _pt.raises(ValueError, match="bit depth"):
            _parse_bmp(bytes(raw))
        raw = bytearray(make_bmp(5, 3))
        # inject a delta escape (00 02) right after the data offset
        off = int.from_bytes(raw[10:14], "little")
        raw[off:off + 2] = b"\x00\x02"
        with _pt.raises(ValueError, match="delta"):
            _parse_bmp(bytes(raw))
        # corruption fuzz under the deadline contract
        rng = random.Random(0x6666)
        for variant in range(4):
            base = make_bmp(17, variant)
            for _ in range(120):
                b = bytearray(base)
                for _m in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
                t0 = time.monotonic()
                try:
                    _parse_bmp(bytes(b))
                except (ValueError, IndexError):
                    pass
                assert time.monotonic() - t0 < 5.0


class TestTiff:
    def test_all_variants_pixel_exact_both_endians(self):
        import numpy as np

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_tiff,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_tiff,
            tiff_pixel_rule,
        )
        for seed in (0, 9, 250, 999):
            for variant in range(4):
                w, h, c, px = _parse_tiff(make_tiff(seed, variant))
                spp = 3 if variant in (1, 3) else 1
                assert (w, h, c) == (11, 7, spp)
                exp = np.zeros((7, 11, spp), dtype=np.int64)
                for y in range(7):
                    for x in range(11):
                        for cc in range(spp):
                            exp[y, x, cc] = tiff_pixel_rule(
                                seed, x, y, cc)
                assert np.array_equal(px.astype(np.int64), exp), (
                    seed, variant)

    def test_packbits_spec_cases(self):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _packbits_decode,
        )
        # literal run, repeat run, 128 noop — TIFF 6.0 §9 semantics
        assert _packbits_decode(bytes([2, 1, 2, 3]), 3) == b"\x01\x02\x03"
        assert _packbits_decode(bytes([257 - 4, 9]), 4) == b"\x09" * 4
        assert _packbits_decode(bytes([128, 0, 7]), 1) == b"\x07"

    def test_gates_and_corruption(self):
        import random
        import time

        import pytest as _pt

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_tiff,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_tiff,
        )
        raw = bytearray(make_tiff(5, 0))
        raw[0:2] = b"XX"
        with _pt.raises(ValueError, match="byte-order"):
            _parse_tiff(bytes(raw))
        rng = random.Random(0x7777)
        for variant in range(4):
            base = make_tiff(17, variant)
            for _ in range(120):
                b = bytearray(base)
                for _m in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
                t0 = time.monotonic()
                try:
                    _parse_tiff(bytes(b))
                except (ValueError, IndexError):
                    pass
                assert time.monotonic() - t0 < 5.0


class TestIco:
    def test_png_and_dib_members_pixel_exact(self):
        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_ico,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            ico_dib_pixel_rule,
            ico_rules,
            make_ico,
        )
        for seed in (0, 9, 250, 999):
            r = ico_rules(seed)
            imgs = _parse_ico(make_ico(seed))
            assert [im["kind"] for im in imgs] == r["kinds"]
            for i, im in enumerate(imgs):
                if im["kind"] == "png":
                    sj = r["png_seed"][i]
                    exp = sum((sj + y * 31 + x * 7 + c * 13) % 256
                              for y in range(8) for x in range(8)
                              for c in range(3))
                    assert im["rgb_sum"] == exp
                    assert im["n_transparent"] == 0
                else:
                    exp = sum(ico_dib_pixel_rule(seed, i, x, y, c)
                              for x in range(8) for y in range(8)
                              for c in range(3))
                    assert im["rgb_sum"] == exp
                    assert im["n_transparent"] == sum(
                        1 for x in range(8) for y in range(8)
                        if (seed + x + y) % 5 == 0)

    def test_gates_and_corruption(self):
        import random
        import time

        import pytest as _pt

        from google_analytics_to_s3_spark.operators.multimodal import (
            _parse_ico,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_ico,
        )
        raw = bytearray(make_ico(5))
        raw[2] = 2  # cursor resource
        with _pt.raises(ValueError, match="cursor"):
            _parse_ico(bytes(raw))
        rng = random.Random(0xCCCC)
        base = make_ico(17)
        for _ in range(200):
            b = bytearray(base)
            for _m in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            t0 = time.monotonic()
            try:
                _parse_ico(bytes(b))
            except (ValueError, IndexError):
                pass
            assert time.monotonic() - t0 < 5.0
