"""ISO-BMFF (MP4) demux + chained A/V decode (operators/mp4.py).

Fixture-plants-rules / test-replays-rules discipline: mp4_rules /
mp4_av_rules are the single source of truth, recomputed here
independently of the serializer's internals.
"""

import struct

import pytest

from google_analytics_to_s3_spark.operators.mp3 import parse_mp3
from google_analytics_to_s3_spark.operators.mp4 import (
    decode_mp4_av_features,
    demux_mp4_features,
    mp4_decode_av,
    mp4_features,
    parse_mp4,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    jpeg_template_round_sums,
    make_mp3,
    make_mp4,
    make_mp4_av,
    mp4_av_rules,
    mp4_rules,
)


def _expected_rel_offsets(rules):
    """Independent replay of the interleaved chunk layout."""
    tracks = rules["tracks"]
    chunks = []  # (chunk_index, track, [sizes])
    for t, tr in enumerate(tracks):
        groups = [[0, 1]] + [[s] for s in range(2, tr["ns"])]
        for c, g in enumerate(groups):
            chunks.append((c, t, [tr["sizes"][s] for s in g]))
    chunks.sort(key=lambda x: (x[0], x[1]))
    rel = 0
    total = 0
    for _c, _t, sizes in chunks:
        off = rel
        for sz in sizes:
            total += off
            off += sz
        rel = off
    return total


class TestDemux:
    def test_planted_structure_recovered(self):
        for seed in range(0, 120):
            r = mp4_rules(seed)
            f = mp4_features(make_mp4(seed))
            assert f["brand"] == "isom"
            assert f["movie_timescale"] == 600
            assert f["movie_duration"] == 90000 + seed
            assert f["n_tracks"] == r["ntr"]
            assert f["n_samples"] == sum(t["ns"] for t in r["tracks"])
            assert f["n_chunks"] == sum(t["ns"] - 1 for t in r["tracks"])
            assert f["sample_bytes"] == sum(
                sum(t["sizes"]) for t in r["tracks"])
            assert f["sample_rel_offset_sum"] == _expected_rel_offsets(r)
            assert f["track_id_sum"] == sum(
                t["track_id"] for t in r["tracks"])
            assert f["width_sum"] == sum(t["width"] for t in r["tracks"])
            assert f["stts_time_sum"] == sum(
                t["duration"] for t in r["tracks"])
            assert f["n_co64_tracks"] == (r["ntr"] if seed % 5 == 0 else 0)
            assert f["handlers"] == "+".join(
                sorted(t["handler"] for t in r["tracks"]))

    def test_layout_independence(self):
        """moov-first (seed even) and mdat-first (seed odd) with the
        same track plan agree on every mdat-relative feature."""
        a, b = mp4_features(make_mp4(6)), mp4_features(make_mp4(7))
        assert mp4_rules(6)["moov_first"] != mp4_rules(7)["moov_first"]
        # different plans, but both must resolve samples inside mdat
        assert a["sample_rel_offset_sum"] >= 0
        assert b["sample_rel_offset_sum"] >= 0

    def test_largesize_and_eof_size(self):
        raw = make_mp4(11)
        # rewrite the LAST top-level box to size==0 (to-EOF): legal
        pos = 0
        spans = []
        while pos < len(raw):
            size = struct.unpack(">I", raw[pos:pos + 4])[0]
            spans.append((pos, size))
            pos += size
        last_pos, _ = spans[-1]
        mutated = bytearray(raw)
        mutated[last_pos:last_pos + 4] = struct.pack(">I", 0)
        assert mp4_features(bytes(mutated)) == mp4_features(raw)
        # rewrite the LAST box (moov, in this mdat-first layout) to a
        # 64-bit largesize header — growing a box AFTER mdat keeps the
        # absolute stco offsets valid
        lsize = len(raw) - last_pos
        big = (struct.pack(">I", 1) + raw[last_pos + 4:last_pos + 8]
               + struct.pack(">Q", lsize + 8) + raw[last_pos + 8:])
        rebuilt = raw[:last_pos] + big
        assert mp4_features(bytes(rebuilt)) == mp4_features(raw)

    def test_gates(self):
        raw = bytearray(make_mp4(3))
        # a moof on a non-fragmented file (no mvex/trex defaults)
        with pytest.raises(ValueError, match="moof before moov/mvex"):
            parse_mp4(bytes(raw) + struct.pack(">I", 8) + b"moof")
        # no ftyp
        size0 = struct.unpack(">I", raw[:4])[0]
        with pytest.raises(ValueError, match="ftyp"):
            parse_mp4(bytes(raw[size0:]))
        # stz2 / elst / sdi != 1 / cmov are synthesized gates
        idx = bytes(raw).find(b"stsz")
        patched = bytearray(raw)
        patched[idx:idx + 4] = b"stz2"
        with pytest.raises(ValueError, match="stz2|missing stsd"):
            parse_mp4(bytes(patched))
        idx = bytes(raw).find(b"stsc")
        patched = bytearray(raw)
        # first run's sample_description_index lives 12 bytes after
        # the fullbox version/flags + entry_count + first_chunk/spc
        sdi_off = idx + 4 + 4 + 4 + 8
        patched[sdi_off:sdi_off + 4] = struct.pack(">I", 2)
        with pytest.raises(ValueError, match="sample_description_index"):
            parse_mp4(bytes(patched))

    def test_truncation_and_bounds(self):
        raw = make_mp4(9)
        for cut in (3, 9, 40, len(raw) // 2, len(raw) - 3):
            with pytest.raises((ValueError, struct.error)):
                parse_mp4(raw[:cut])

    def test_corruption_fuzz_bounded(self):
        import random
        import time

        base = make_mp4(17)
        rng = random.Random(0x4444)
        for trial in range(300):
            raw = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
            t0 = time.monotonic()
            try:
                mp4_features(bytes(raw))
            except (ValueError, IndexError, struct.error,
                    OverflowError, MemoryError):
                pass
            assert time.monotonic() - t0 < 5.0, trial


class TestChainedDecode:
    def test_av_parity_with_standalone_decoders(self):
        rs = jpeg_template_round_sums()
        for seed in range(0, 40):
            r = mp4_av_rules(seed)
            d = mp4_decode_av(make_mp4_av(seed))
            assert d["n_video_samples"] == r["ns_v"]
            assert d["n_audio_samples"] == r["ns_a"]
            assert d["gated_tracks"] == (1 if r["gated"] else 0)
            yj = 0
            for sj in r["v_seed"]:
                for b in range(4):
                    dc = ((sj * 7 + b * 13) % 121) - 60
                    yj += 64 * (128 + dc) + rs[(sj + b) % 5]
            assert d["jpeg_y_sum"] == yj
            exp = [parse_mp3(make_mp3(sa, n_frames=1, reservoir=False))
                   for sa in r["a_seed"]]
            assert d["mp3_abs_sum"] == sum(
                m["spectral_abs_sum"] for m in exp)
            assert d["mp3_part23_bits"] == sum(
                m["part23_bits"] for m in exp)

    def test_unsupported_codec_gated_not_decoded(self):
        seed = 3  # gated avc1 track present
        assert mp4_av_rules(seed)["gated"]
        d = mp4_decode_av(make_mp4_av(seed))
        assert d["gated_tracks"] == 1
        assert d["n_video_samples"] == mp4_av_rules(seed)["ns_v"]


class TestSparkWrappers:
    def test_demux_and_quarantine(self, spark):
        good = make_mp4(21)
        df = spark.createDataFrame(
            [(0, bytearray(good)), (1, bytearray(b"\x00\x00\x00\x08mdat")),
             (2, bytearray(b"junk"))],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r for r in demux_mp4_features(df).collect()}
        exp = mp4_features(good)
        assert rows[0]["decode_error"] is None
        assert rows[0]["sample_rel_offset_sum"] == \
            exp["sample_rel_offset_sum"]
        assert rows[0]["handlers"] == exp["handlers"]
        assert rows[1]["decode_error"] is not None
        assert rows[2]["decode_error"] is not None

    def test_av_wrapper(self, spark):
        good = make_mp4_av(8)
        df = spark.createDataFrame(
            [(0, bytearray(good))], "doc_id long, payload binary")
        row = decode_mp4_av_features(df).collect()[0]
        exp = mp4_decode_av(good)
        assert row["decode_error"] is None
        assert row["jpeg_y_sum"] == exp["jpeg_y_sum"]
        assert row["mp3_abs_sum"] == exp["mp3_abs_sum"]


class TestFragmented:
    def test_planted_fragments_recovered(self):
        from google_analytics_to_s3_spark.operators.mp4 import (
            mp4_frag_features,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_mp4_frag,
            mp4_frag_rules,
        )
        for seed in range(0, 80):
            f = mp4_frag_features(make_mp4_frag(seed))
            r = mp4_frag_rules(seed)
            flat = [tf for fr in r["frags"] for tf in fr["trafs"]]
            assert f["n_tracks"] == r["ntr"]
            assert f["n_fragments"] == r["nfrag"]
            assert f["seq_sum"] == sum(fr["seq"] for fr in r["frags"])
            assert f["n_samples"] == sum(tf["ns"] for tf in flat)
            assert f["sample_bytes"] == sum(
                sum(tf["sizes"]) for tf in flat)
            assert f["tfdt_sum"] == sum(tf["tfdt"] for tf in flat)
            assert f["duration_sum"] == sum(
                sum(tf["durs"]) for tf in flat)
            # independent offset replay: runs laid in track order
            tot = 0
            for fr in r["frags"]:
                rel = 0
                for tf in fr["trafs"]:
                    for sz in tf["sizes"]:
                        tot += rel
                        rel += sz
            assert f["sample_rel_offset_sum"] == tot, seed

    def test_default_cascade_and_base_modes_covered(self):
        """The 80-seed sweep must actually hit every size source
        (trun/tfhd/trex), both duration sources, both base-offset
        modes and both tfdt versions."""
        from google_analytics_to_s3_spark.testing.fixtures import (
            mp4_frag_rules,
        )
        size_modes = set()
        dur_modes = set()
        bases = set()
        tfdts = set()
        for seed in range(80):
            r = mp4_frag_rules(seed)
            bases.add(r["explicit_base"])
            tfdts.add(r["tfdt_v1"])
            for fr in r["frags"]:
                for tf in fr["trafs"]:
                    size_modes.add(tf["size_mode"])
                    dur_modes.add(tf["dur_mode"])
        assert size_modes == {0, 1, 2}
        assert dur_modes == {0, 1}
        assert bases == {True, False}
        assert tfdts == {True, False}

    def test_frag_gates(self):
        import struct as _s

        from google_analytics_to_s3_spark.operators.mp4 import (
            mp4_frag_features,
            parse_mp4,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_mp4,
            make_mp4_frag,
        )
        # a non-fragmented file through the frag readout
        with pytest.raises(ValueError, match="no moof"):
            mp4_frag_features(make_mp4(5))
        # unknown track_ID in a traf
        raw = bytearray(make_mp4_frag(2))
        idx = bytes(raw).find(b"tfhd")
        _s.pack_into(">I", raw, idx + 8, 99)
        with pytest.raises(ValueError, match="trex defaults"):
            parse_mp4(bytes(raw))

    def test_frag_corruption_fuzz_bounded(self):
        import random
        import struct as _s
        import time

        from google_analytics_to_s3_spark.operators.mp4 import (
            mp4_frag_features,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_mp4_frag,
        )
        base = make_mp4_frag(13)
        rng = random.Random(0x5555)
        for trial in range(200):
            raw = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
            t0 = time.monotonic()
            try:
                mp4_frag_features(bytes(raw))
            except (ValueError, IndexError, _s.error,
                    OverflowError, MemoryError):
                pass
            assert time.monotonic() - t0 < 5.0, trial

    def test_av_frag_chained_decode_parity(self):
        """Real JPEG/MP3 samples inside moof fragments decode to the
        same sums as the standalone decoders."""
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_mp4_av_frag,
            mp4_av_frag_rules,
        )
        rs = jpeg_template_round_sums()
        for seed in range(0, 30):
            r = mp4_av_frag_rules(seed)
            d = mp4_decode_av(make_mp4_av_frag(seed))
            assert d["n_video_samples"] == sum(r["nv"])
            assert d["n_audio_samples"] == sum(r["na"])
            yj = 0
            for sj in r["v_seed"]:
                for b in range(4):
                    dc = ((sj * 7 + b * 13) % 121) - 60
                    yj += 64 * (128 + dc) + rs[(sj + b) % 5]
            assert d["jpeg_y_sum"] == yj
            exp = [parse_mp3(make_mp3(sa, n_frames=1, reservoir=False))
                   for sa in r["a_seed"]]
            assert d["mp3_abs_sum"] == sum(
                m["spectral_abs_sum"] for m in exp)
