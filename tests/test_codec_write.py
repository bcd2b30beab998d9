"""Compressor write paths (r13): zstd store/RLE frames
(operators/zstd.py) and fixed-Huffman DEFLATE + gzip/zlib wrappers
(operators/inflate.py), cross-validated against libzstd and stdlib
zlib."""

from __future__ import annotations

import gzip as _gzip
import os
import random
import zlib as _zlib

import pytest

from google_analytics_to_s3_spark.operators.inflate import (
    deflate_compress,
    gzip_compress,
    gzip_decompress,
    inflate,
    zlib_compress,
    zlib_decompress,
)
from google_analytics_to_s3_spark.operators.zstd import (
    compress_zstd_store,
    decompress_zstd,
)


def _mixed(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    d = bytearray()
    while len(d) < n:
        r = rng.random()
        if r < 0.3:
            d += bytes([rng.randrange(256)]) * rng.randrange(1, 400)
        elif r < 0.6 and d:
            st = rng.randrange(0, len(d))
            d += bytes(d[st:st + rng.randrange(1, 500)])
        else:
            d += bytes(rng.randrange(256)
                       for _ in range(rng.randrange(1, 200)))
    return bytes(d[:n])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [0, 1, 17, 4096, 70000])
def test_deflate_stdlib_and_own_agree(seed, n):
    d = _mixed(seed, n)
    raw = deflate_compress(d)
    assert _zlib.decompress(raw, -15) == d
    assert inflate(raw)[0] == d
    g = gzip_compress(d)
    assert _gzip.decompress(g) == d
    assert gzip_decompress(g)[0] == d
    z = zlib_compress(d)
    assert _zlib.decompress(z) == d
    assert zlib_decompress(z) == d


def test_deflate_actually_compresses():
    d = b"the quick brown fox " * 500
    assert len(deflate_compress(d)) < len(d) // 5


def test_deflate_match_boundaries():
    # lengths 3 and 258 (the code-table extremes) and distance 32768
    base = os.urandom(300)
    d = base + b"XYZ" + base[:3] + b"Q" * 258 + b"Q" * 258
    assert _zlib.decompress(deflate_compress(d), -15) == d
    far = os.urandom(32768 - 10) + b"ABCDEFGHIJ"
    d2 = b"ABCDEFGHIJ" + far  # distance exactly 32768 for the tail
    assert _zlib.decompress(deflate_compress(d2), -15) == d2


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [1, 15, 16, 4096, 200000])
def test_zstd_store_libzstd_and_own_agree(seed, n):
    import pyarrow as pa

    d = _mixed(seed, n)
    for ck in (True, False):
        fr = compress_zstd_store(d, checksum=ck)
        assert pa.Codec("zstd").decompress(
            fr, decompressed_size=len(d), asbytes=True) == d
        assert decompress_zstd(fr) == d


def test_zstd_store_empty_and_corrupt_checksum():
    assert decompress_zstd(compress_zstd_store(b"")) == b""
    fr = bytearray(compress_zstd_store(b"hello world, hello"))
    fr[-1] ^= 0xFF  # flip checksum byte
    with pytest.raises(ValueError):
        decompress_zstd(bytes(fr))


def test_zstd_block_splitting_at_128k():
    import pyarrow as pa

    d = os.urandom(300_000)
    fr = compress_zstd_store(d)
    assert pa.Codec("zstd").decompress(
        fr, decompressed_size=len(d), asbytes=True) == d


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [0, 1, 13, 65536, 200000])
def test_lz4_frame_liblz4_and_own_agree(seed, n):
    import pyarrow as pa

    from google_analytics_to_s3_spark.operators.lz4 import (
        parse_lz4_frame,
        write_lz4_frame,
    )

    d = _mixed(seed, n)
    fr = write_lz4_frame(d)
    if n:
        assert pa.Codec("lz4").decompress(
            fr, decompressed_size=n, asbytes=True) == d
    assert parse_lz4_frame(fr)[0] == d


def test_lz4_incompressible_blocks_stored():
    from google_analytics_to_s3_spark.operators.lz4 import (
        parse_lz4_frame,
        write_lz4_frame,
    )

    d = os.urandom(70000)  # spans two blocks, both stored
    fr = write_lz4_frame(d)
    assert parse_lz4_frame(fr)[0] == d
    assert len(fr) < len(d) + 100  # stored, not inflated


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [1, 100, 8192, 40000])
def test_bzip2_stdlib_and_own_agree(seed, n):
    import bz2 as _bz2

    from google_analytics_to_s3_spark.operators.bzip2 import (
        bzip2_compress,
        bzip2_decompress,
    )

    d = _mixed(seed, n)
    c = bzip2_compress(d)
    assert _bz2.decompress(c) == d
    assert bzip2_decompress(c)[0] == d


def test_bzip2_edges():
    import bz2 as _bz2

    from google_analytics_to_s3_spark.operators.bzip2 import (
        bzip2_compress,
        bzip2_decompress,
    )

    assert _bz2.decompress(bzip2_compress(b"")) == b""
    assert bzip2_decompress(bzip2_compress(b""))[1] == 0
    z = b"\x00" * 30000                    # all-zero: MTF run block
    assert _bz2.decompress(bzip2_compress(z)) == z
    d = b"The quick brown fox. " * 9000    # multi-block at level 1
    c = bzip2_compress(d, level=1)
    assert _bz2.decompress(c) == d
    assert bzip2_decompress(c)[1] >= 2
    assert bzip2_decompress(bzip2_compress(d, level=9))[1] == 1


def test_bzip2_compresses_text():
    from google_analytics_to_s3_spark.operators.bzip2 import (
        bzip2_compress,
    )

    d = b"compression ratio sanity check " * 1000
    assert len(bzip2_compress(d)) < len(d) // 10


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [0, 1, 1000, 40000])
def test_lzma_alone_and_xz_store_stdlib_agree(seed, n):
    import lzma as _lzma

    from google_analytics_to_s3_spark.operators.xz import (
        lzma_alone_compress,
        lzma_alone_decompress,
        xz_decompress,
        xz_store_compress,
    )

    d = _mixed(seed, n)
    al = lzma_alone_compress(d)
    assert _lzma.decompress(al) == d
    assert lzma_alone_decompress(al) == d
    xs = xz_store_compress(d)
    assert _lzma.decompress(xs) == d
    assert xz_decompress(xs)[0] == d


def test_lzma_literal_coder_actually_compresses_text():
    from google_analytics_to_s3_spark.operators.xz import (
        lzma_alone_compress,
    )

    text = b"the quick brown fox jumps over the lazy dog " * 500
    assert len(lzma_alone_compress(text)) < len(text) * 0.6


def test_lzma_lc_variants():
    import lzma as _lzma

    from google_analytics_to_s3_spark.operators.xz import (
        lzma_alone_compress,
    )

    d = b"abcabcabc banana banana" * 50
    # liblzma (and thus stdlib) caps lc+lp at 4
    for lc in (0, 1, 2, 4):
        assert _lzma.decompress(lzma_alone_compress(d, lc=lc)) == d
