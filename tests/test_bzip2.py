"""From-scratch bzip2 (operators/bzip2.py), cross-validated against
the stdlib bz2 producer."""

from __future__ import annotations

import bz2
import random

import pytest

from google_analytics_to_s3_spark.operators.bzip2 import (
    bzip2_decompress,
)

_PAYLOADS = {
    "single": b"a",
    "text": ("wiki text body " * 20000).encode(),
    "repetitive": b"abc" * 50000,
    "zeros_rle1": b"\x00" * 100000,
    "two_symbol": bytes(random.Random(2).choice(b"ab")
                        for _ in range(150000)),
    "incompressible": bytes(random.Random(3).randrange(256)
                            for _ in range(200000)),
}


@pytest.mark.parametrize("name", sorted(_PAYLOADS))
@pytest.mark.parametrize("level", [1, 5, 9])
def test_streams_match_stdlib(name, level):
    p = _PAYLOADS[name]
    out, _nb = bzip2_decompress(bz2.compress(p, level))
    assert out == p


def test_multi_block_and_multi_stream():
    big = ("block boundary test " * 30000).encode()  # ~600 KB
    out, nb = bzip2_decompress(bz2.compress(big, 1))
    assert out == big and nb >= 2  # level 1 = 100k blocks
    z = bz2.compress(b"first", 9) + bz2.compress(big, 1)
    out, nb = bzip2_decompress(z)
    assert out == b"first" + big


def test_fixture_inverts_and_stdlib_agrees():
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_bzip2,
    )

    for seed in (0, 1, 2, 3, 4, 17, 999):
        data = make_bzip2(seed)
        out, nb = bzip2_decompress(data)
        n_a = 200 + seed % 150
        n_b = 120 + seed % 99
        content = bytes((9 * seed + 17 * i) % 253
                        for i in range(n_a)) \
            + bytes([seed % 253]) * n_b
        nm = 2 if seed % 4 == 0 else 1
        assert out == content * nm and nb == nm
        assert bz2.decompress(data) == content * nm


def test_corruption_quarantines_never_misaccepts():
    p = _PAYLOADS["repetitive"]
    base = bz2.compress(p, 5)
    for seed in range(150):
        rng = random.Random(seed)
        b = bytearray(base)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            got, _ = bzip2_decompress(bytes(b))
            assert got == p  # CRCs must catch every corruption
        except (ValueError, IndexError):
            pass


def test_named_errors():
    with pytest.raises(ValueError, match="magic"):
        bzip2_decompress(b"XZ" + b"\x00" * 20)
    with pytest.raises(ValueError, match="block-size"):
        bzip2_decompress(b"BZh0" + b"\x00" * 20)
    good = bz2.compress(b"hello bzip2", 9)
    with pytest.raises(ValueError, match="bzip2"):
        bzip2_decompress(good[:10])


def test_empty_stream_zero_blocks():
    out, nb = bzip2_decompress(bz2.compress(b""))
    assert out == b"" and nb == 0
