"""AVI (RIFF) demux + chained MJPG/MP3 decode (operators/avi.py)."""

import pytest

from google_analytics_to_s3_spark.operators.avi import (
    avi_decode_av,
    avi_features,
    demux_avi_features,
    parse_avi,
)
from google_analytics_to_s3_spark.operators.mp3 import parse_mp3
from google_analytics_to_s3_spark.testing.fixtures import (
    avi_av_rules,
    avi_rules,
    jpeg_template_round_sums,
    make_avi,
    make_avi_av,
    make_mp3,
)


class TestDemux:
    def test_planted_structure_and_idx1(self):
        for seed in range(0, 80):
            r = avi_rules(seed)
            f = avi_features(make_avi(seed))
            assert f["n_streams"] == 2
            assert f["n_chunks"] == r["nv"] + r["na"]
            assert f["n_idx"] == f["n_chunks"]
            assert f["chunk_bytes"] == sum(r["v_sizes"]) + sum(
                r["a_sizes"])
            assert f["total_frames"] == r["nv"]
            assert f["us_per_frame"] == r["us_per_frame"]
            off = 0
            tot = 0
            for c in range(max(r["nv"], r["na"])):
                for sizes, n in ((r["v_sizes"], r["nv"]),
                                 (r["a_sizes"], r["na"])):
                    if c < n:
                        tot += off
                        off += 8 + sizes[c] + (sizes[c] & 1)
            assert f["chunk_rel_offset_sum"] == tot, seed

    def test_idx1_mismatch_detected(self):
        import struct

        raw = bytearray(make_avi(5))
        i = bytes(raw).find(b"idx1")
        # corrupt the first entry's offset field
        struct.pack_into("<I", raw, i + 8 + 8, 9999)
        with pytest.raises(ValueError, match="idx1 offset"):
            parse_avi(bytes(raw))

    def test_corruption_fuzz_bounded(self):
        import random
        import struct
        import time

        base = make_avi(17)
        rng = random.Random(0xAAAA)
        for _ in range(250):
            b = bytearray(base)
            for _m in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            t0 = time.monotonic()
            try:
                avi_features(bytes(b))
            except (ValueError, IndexError, struct.error):
                pass
            assert time.monotonic() - t0 < 5.0


class TestChained:
    def test_av_parity_with_standalone_decoders(self):
        rs = jpeg_template_round_sums()
        for seed in range(0, 30):
            r = avi_av_rules(seed)
            d = avi_decode_av(make_avi_av(seed))
            assert d["n_video_chunks"] == r["nv"]
            assert d["n_audio_chunks"] == r["na"]
            assert d["gated_streams"] == 0
            yj = 0
            for sj in r["v_seed"]:
                for b in range(4):
                    dc = ((sj * 7 + b * 13) % 121) - 60
                    yj += 64 * (128 + dc) + rs[(sj + b) % 5]
            assert d["jpeg_y_sum"] == yj
            exp = sum(parse_mp3(make_mp3(sa, n_frames=1,
                                         reservoir=False))
                      ["spectral_abs_sum"] for sa in r["a_seed"])
            assert d["mp3_abs_sum"] == exp

    def test_wrapper_quarantine(self, spark):
        df = spark.createDataFrame(
            [(0, bytearray(make_avi(3))),
             (1, bytearray(b"RIFFxxxxAVI "))],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r
                for r in demux_avi_features(df).collect()}
        assert rows[0]["decode_error"] is None
        assert rows[1]["decode_error"] is not None
