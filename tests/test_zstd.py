"""zstd decoder (operators/zstd.py) — RFC 8878.

The headline property here is CROSS-VALIDATION, not self-round-trip:
every decode test inverts frames produced by *libzstd itself* (via
``pyarrow.Codec('zstd')``, baked into this environment), across
compression levels 1..22 and payload shapes chosen to force every
entropy path of the format — raw/RLE/compressed blocks, 1- and
4-stream Huffman literals, direct and FSE-compressed tree
descriptions, predefined / RLE / FSE-described / repeat sequence
tables, treeless literals, multi-block frames, and repeat offsets.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from google_analytics_to_s3_spark.operators.zstd import (
    decompress_zstd,
    parse_zstd_frames,
    xxh64,
)


def _z(payload: bytes, level: int = 3) -> bytes:
    return pa.Codec("zstd", compression_level=level).compress(
        payload, asbytes=True)


# --------------------------------------------------------------------------
# XXH64


def test_xxh64_published_empty_vector():
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_xxh64_length_regimes_disagree():
    # 0, <4, <8, <32, >=32 byte paths all produce distinct hashes and
    # are deterministic
    vals = {n: xxh64(bytes(range(n % 256)) * (n // 256 + 1))
            for n in (0, 3, 7, 31, 32, 100)}
    assert len(set(vals.values())) == len(vals)
    assert xxh64(b"abc") == xxh64(b"abc")
    assert xxh64(b"abc", seed=1) != xxh64(b"abc")


def test_content_checksum_verified():
    # hand-framed: single raw block + checksum flag, checksum from our
    # own xxh64 (the cross-validated decode path proves frame parity;
    # this pins the verify branch and its failure mode)
    payload = b"checksum me"
    frame = bytearray()
    frame += (0xFD2FB528).to_bytes(4, "little")
    frame.append(0x24)  # single_segment | checksum, fcs 1 byte
    frame.append(len(payload))
    frame += ((len(payload) << 3) | 1).to_bytes(3, "little")  # raw, last
    frame += payload
    frame += (xxh64(payload) & 0xFFFFFFFF).to_bytes(4, "little")
    assert decompress_zstd(bytes(frame)) == payload
    bad = bytearray(frame)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        decompress_zstd(bytes(bad))


# --------------------------------------------------------------------------
# Cross-validation against libzstd


WORDS = None


def _words():
    global WORDS
    if WORDS is None:
        r = random.Random(7)
        WORDS = [bytes([65 + r.randrange(26)]) * r.randrange(1, 8)
                 + bytes(r.randrange(256) for _ in range(r.randrange(4)))
                 for _ in range(500)]
    return WORDS


def _text(n: int) -> bytes:
    r = random.Random(n)
    return b" ".join(r.choice(_words()) for _ in range(n))


@pytest.mark.parametrize("level", [1, 3, 6, 12, 19, 22])
def test_decode_matches_libzstd_shapes(level):
    payloads = {
        "empty": b"",
        "one": b"a",
        "rle": b"a" * 1000,
        "small_text": b"hello world! " * 50,
        "random": bytes(random.Random(4).randrange(256)
                        for _ in range(500)),
        "text_multi_block": _text(40000),  # > 128 KiB: treeless repeats
        "mixed": _text(300)
        + bytes(random.Random(9).randrange(256) for _ in range(5000))
        + _text(300),
        "rle_runs": b"".join(
            bytes([i % 256]) * random.Random(i).randrange(1, 2000)
            for i in range(300)),
        "near_random_200k": bytes(random.Random(3).randrange(250)
                                  for _ in range(200000)),
        "period7": b"abcdefg" * 30000,
        "utf8ish": ("один два три cuatro cinco þæt " * 5000).encode(),
    }
    for name, p in payloads.items():
        assert decompress_zstd(_z(p, level)) == p, (name, level)


@pytest.mark.parametrize("seed", range(60))
def test_decode_matches_libzstd_randomized(seed):
    r = random.Random(seed)
    kind = seed % 5
    if kind == 0:
        p = bytes(r.randrange(256) for _ in range(r.randrange(0, 3000)))
    elif kind == 1:
        seg = bytes(r.randrange(256) for _ in range(r.randrange(1, 80)))
        p = seg * r.randrange(1, 400)
    elif kind == 2:
        ws = [bytes(r.randrange(97, 123)
                    for _ in range(r.randrange(1, 10))) for _ in range(30)]
        p = b" ".join(r.choice(ws) for _ in range(r.randrange(0, 5000)))
    elif kind == 3:
        p = bytes([r.randrange(4)]) * r.randrange(1, 300000)
    else:
        p = bytes(r.choices(
            range(256),
            weights=[1 + (i % 7 == 0) * 50 for i in range(256)],
            k=r.randrange(1000, 150000)))
    lvl = r.choice([1, 2, 3, 5, 7, 9, 13, 17, 19, 22])
    assert decompress_zstd(_z(p, lvl)) == p


def test_concatenated_and_skippable_frames():
    a, b = b"first frame " * 20, b"second frame " * 30
    skip = ((0x184D2A5C).to_bytes(4, "little")
            + (7).to_bytes(4, "little") + b"padding")
    content, nf = parse_zstd_frames(_z(a) + skip + _z(b))
    assert content == a + b
    assert nf == 2


def test_skippable_only_is_rejected():
    skip = ((0x184D2A50).to_bytes(4, "little")
            + (0).to_bytes(4, "little"))
    with pytest.raises(ValueError, match="no data frames"):
        parse_zstd_frames(skip)


# --------------------------------------------------------------------------
# Gates and corruption discipline


def test_dictionary_frames_are_gated():
    # frame header with Dictionary_ID_flag = 1 and a non-zero id
    frame = bytearray()
    frame += (0xFD2FB528).to_bytes(4, "little")
    frame.append(0x21)  # single_segment | did_flag=1
    frame.append(42)    # dictionary id
    frame.append(0)     # fcs = 0
    frame += (1).to_bytes(3, "little")  # raw block, size 0, last
    with pytest.raises(ValueError, match="dictionary"):
        decompress_zstd(bytes(frame))


def test_bad_magic_and_truncation_named():
    with pytest.raises(ValueError, match="magic"):
        decompress_zstd(b"\x00\x00\x00\x00rest")
    with pytest.raises(ValueError, match="zstd"):
        decompress_zstd(b"\x28")
    good = _z(b"hello world " * 10)
    for cut in (5, 9, len(good) - 1):
        with pytest.raises((ValueError, IndexError)):
            decompress_zstd(good[:cut])


def test_reserved_block_type_named():
    frame = bytearray()
    frame += (0xFD2FB528).to_bytes(4, "little")
    frame.append(0x20)  # single_segment
    frame.append(4)     # fcs
    frame += ((4 << 3) | (3 << 1) | 1).to_bytes(3, "little")  # type 3
    frame += b"xxxx"
    with pytest.raises(ValueError, match="reserved block type"):
        decompress_zstd(bytes(frame))


def test_content_size_mismatch_named():
    frame = bytearray()
    frame += (0xFD2FB528).to_bytes(4, "little")
    frame.append(0x20)
    frame.append(9)  # fcs says 9
    frame += ((4 << 3) | 1).to_bytes(3, "little")  # raw, 4 bytes, last
    frame += b"abcd"
    with pytest.raises(ValueError, match="content size mismatch"):
        decompress_zstd(bytes(frame))


@pytest.mark.parametrize("seed", range(40))
def test_corruption_never_crashes(seed):
    # bit flips anywhere in a real frame must either still decode
    # (flips in padding/unused space) or raise the named quarantine
    # errors — never a crash of another class, never a hang
    base = _z(bytes(random.Random(1).randrange(256) for _ in range(500))
              + b"hello " * 200, 6)
    r = random.Random(seed)
    for _ in range(75):
        z = bytearray(base)
        z[r.randrange(len(z))] ^= 1 << r.randrange(8)
        try:
            decompress_zstd(bytes(z))
        except (ValueError, IndexError):
            pass


def test_rle_and_raw_blocks_hand_framed():
    # RLE block: header size = regenerated size, content = 1 byte
    frame = bytearray()
    frame += (0xFD2FB528).to_bytes(4, "little")
    frame.append(0x20)
    frame.append(13)
    frame += ((5 << 3) | (1 << 1) | 0).to_bytes(3, "little")  # RLE, 5
    frame.append(ord("x"))
    frame += ((8 << 3) | 1).to_bytes(3, "little")  # raw, 8, last
    frame += b"yzyzyzyz"
    assert decompress_zstd(bytes(frame)) == b"xxxxx" + b"yzyzyzyz"


# --------------------------------------------------------------------------
# r12: RFC 8878 §5 dictionary frames, cross-validated against
# libzstd's own ZDICT-trained dictionaries.


def _libzstd_available() -> bool:
    import ctypes.util

    return ctypes.util.find_library("zstd") is not None


@pytest.mark.skipif(not _libzstd_available(),
                    reason="libzstd not loadable via ctypes")
def test_dictionary_frames_cross_validated():
    from google_analytics_to_s3_spark.operators.zstd import (
        decompress_zstd,
        parse_zstd_dict,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_zstd_dict_frame,
        zstd_dict_content,
        zstd_training_dict,
    )

    d = zstd_training_dict()
    pd_ = parse_zstd_dict(d)
    assert pd_["dict_id"] != 0
    for seed in range(0, 120, 7):
        frame = make_zstd_dict_frame(seed)
        assert decompress_zstd(frame, {pd_["dict_id"]: d}) == \
            zstd_dict_content(seed)


@pytest.mark.skipif(not _libzstd_available(),
                    reason="libzstd not loadable via ctypes")
def test_dictionary_window_actually_used():
    """Blanking the dictionary CONTENT (keeping tables + rep offsets)
    must break every frame — proof the frames match into the
    dictionary window rather than merely carrying its id."""
    from google_analytics_to_s3_spark.operators.zstd import (
        decompress_zstd,
        parse_zstd_dict,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_zstd_dict_frame,
        zstd_dict_content,
        zstd_training_dict,
    )

    d = zstd_training_dict()
    pd_ = parse_zstd_dict(d)
    blank = dict(pd_)
    blank["content"] = b"\x00" * len(pd_["content"])
    broken = 0
    for seed in range(20):
        frame = make_zstd_dict_frame(seed)
        try:
            if decompress_zstd(frame, {pd_["dict_id"]: blank}) != \
                    zstd_dict_content(seed):
                broken += 1
        except ValueError:
            broken += 1
    assert broken == 20


@pytest.mark.skipif(not _libzstd_available(),
                    reason="libzstd not loadable via ctypes")
def test_dictionary_gate_without_dict():
    from google_analytics_to_s3_spark.operators.zstd import (
        decompress_zstd,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_zstd_dict_frame,
    )

    with pytest.raises(ValueError, match="Dictionary_ID"):
        decompress_zstd(make_zstd_dict_frame(1))


def test_parse_dict_raw_content_and_corrupt():
    from google_analytics_to_s3_spark.operators.zstd import (
        parse_zstd_dict,
    )

    raw = parse_zstd_dict(b"just history bytes")
    assert raw["dict_id"] == 0
    assert raw["content"] == b"just history bytes"
    assert raw["huf"] is None
    # magic + garbage entropy section quarantines
    bad = (0xEC30A437).to_bytes(4, "little") + (7).to_bytes(4, "little") \
        + b"\xff" * 4
    with pytest.raises(ValueError):
        parse_zstd_dict(bad)
