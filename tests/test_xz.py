"""From-scratch XZ/LZMA (operators/xz.py), cross-validated against
the stdlib lzma producer."""

from __future__ import annotations

import lzma
import random

import pytest

from google_analytics_to_s3_spark.operators.xz import (
    crc64,
    lzma_alone_decompress,
    xz_decompress,
)

_PAYLOADS = {
    "empty": b"",
    "single": b"a",
    "text": ("hello lzma world " * 2000).encode(),
    "incompressible": bytes(random.Random(1).randrange(256)
                            for _ in range(60000)),
    "three_symbol": bytes(random.Random(2).choice(b"abc")
                          for _ in range(80000)),
    "zeros": b"\x00" * 50000,
}


def test_crc64_pinned():
    assert crc64(b"123456789") == 0x995DC9BBDF1939FA  # ECMA check value
    assert crc64(b"") == 0


@pytest.mark.parametrize("name", sorted(_PAYLOADS))
@pytest.mark.parametrize("preset", [0, 6, 9])
def test_alone_matches_stdlib(name, preset):
    p = _PAYLOADS[name]
    z = lzma.compress(p, format=lzma.FORMAT_ALONE, preset=preset)
    assert lzma_alone_decompress(z) == p


@pytest.mark.parametrize("name", sorted(_PAYLOADS))
@pytest.mark.parametrize("check", [lzma.CHECK_NONE, lzma.CHECK_CRC32,
                                   lzma.CHECK_CRC64,
                                   lzma.CHECK_SHA256])
def test_xz_matches_stdlib(name, check):
    p = _PAYLOADS[name]
    z = lzma.compress(p, format=lzma.FORMAT_XZ, preset=6, check=check)
    out, nb = xz_decompress(z)
    # an empty payload is a valid ZERO-block stream
    assert out == p and nb == (0 if p == b"" else 1)


@pytest.mark.parametrize("lclppb", [(0, 2, 2), (4, 0, 0), (2, 1, 1),
                                    (3, 0, 2)])
def test_custom_props(lclppb):
    lc, lp, pb = lclppb
    filt = [{"id": lzma.FILTER_LZMA2, "preset": 6,
             "lc": lc, "lp": lp, "pb": pb}]
    p = _PAYLOADS["text"]
    z = lzma.compress(p, format=lzma.FORMAT_XZ, filters=filt)
    assert xz_decompress(z)[0] == p


def test_fixture_inverts_and_stdlib_agrees():
    from google_analytics_to_s3_spark.testing.fixtures import make_xz

    for seed in (0, 1, 2, 3, 4, 10, 17, 999):
        data = make_xz(seed)
        out, nb = xz_decompress(data)
        n_a = 220 + seed % 180
        n_b = 90 + seed % 77
        content = bytes((11 * seed + 23 * i) % 249
                        for i in range(n_a)) \
            + bytes([seed % 249]) * n_b
        assert out == content and nb == 1
        assert lzma.decompress(data) == content


def test_corruption_quarantines_never_misaccepts():
    p = _PAYLOADS["text"]
    base = lzma.compress(p, format=lzma.FORMAT_XZ, preset=6)
    for seed in range(150):
        rng = random.Random(seed)
        b = bytearray(base)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            got, _ = xz_decompress(bytes(b))
            assert got == p
        except (ValueError, IndexError):
            pass


def test_named_errors():
    with pytest.raises(ValueError, match="magic"):
        xz_decompress(b"\x00" * 40)
    good = lzma.compress(b"hi there", format=lzma.FORMAT_XZ)
    with pytest.raises(ValueError, match="xz|lzma"):
        xz_decompress(good[:20])
    # delta filter chains gated by name
    filt = [{"id": lzma.FILTER_DELTA, "dist": 2},
            {"id": lzma.FILTER_LZMA2, "preset": 6}]
    z = lzma.compress(b"abcd" * 100, format=lzma.FORMAT_XZ,
                      filters=filt)
    with pytest.raises(ValueError, match="gated"):
        xz_decompress(z)


def test_multi_stream_concatenation_and_padding():
    """Concatenated .xz streams (valid per spec §2.2, accepted by
    stdlib lzma) decode fully — including 4-byte-aligned zero stream
    padding between them; trailing garbage raises a named error
    instead of silently truncating (ADVICE r12)."""
    import lzma

    a = lzma.compress(b"first stream " * 40, format=lzma.FORMAT_XZ)
    b = lzma.compress(b"second!" * 11, format=lzma.FORMAT_XZ,
                      check=lzma.CHECK_CRC32)
    c = lzma.compress(b"third", format=lzma.FORMAT_XZ,
                      check=lzma.CHECK_SHA256)
    got, n_blocks = xz_decompress(a + b + c)
    assert got == lzma.decompress(a + b + c)
    assert n_blocks == 3
    # stream padding (spec §2.2): stdlib lzma.decompress stops at
    # padding (silently!), the xz CLI decodes through it — we follow
    # the spec and decode every stream
    got_pad, n_pad = xz_decompress(a + b + b"\x00" * 12 + c)
    assert got_pad == got and n_pad == 3
    with pytest.raises(ValueError, match="trailing"):
        xz_decompress(a + b"XYZ")
    with pytest.raises(ValueError):
        xz_decompress(a + b"\x00\x00\x00")  # padding not 4-aligned
