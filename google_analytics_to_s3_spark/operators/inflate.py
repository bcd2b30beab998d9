"""DEFLATE decompression from first principles — RFC 1951 (deflate),
RFC 1950 (zlib wrapper, Adler-32), RFC 1952 (gzip wrapper, CRC-32),
pure Python.

Deflate is the substrate under half the formats this engine reads
(gzip WARC members, zip entries, PNG IDAT, PDF FlateDecode, Avro
``deflate`` blocks, ORC ZLIB chunks, parquet GZIP pages); this module
re-derives the byte path from the public RFCs instead of the stdlib:

- **Blocks** (§3.2.3): stored (LEN/NLEN complement check), fixed
  Huffman (the §3.2.6 code-length ranges), dynamic Huffman — the
  code-length code with its 3-bit lengths in the spec's scrambled
  order, repeats 16/17/18, then the literal/length and distance
  codes.
- **Canonical Huffman** (§3.2.2): codes assigned from bit-length
  counts exactly as the RFC's algorithm; over-subscribed or empty
  codes are named errors.
- **LZ77** (§3.2.5): the published length/extra-bits and
  distance/extra-bits tables; matches may overlap; the 32 KiB window
  spans blocks.
- **zlib wrapper**: CMF/FLG sanity (method 8, window ≤ 32K, the
  31-divisibility check), FDICT gated, Adler-32 verified (from the
  spec's definition, modulo 65521).
- **gzip wrapper**: magic/method, FEXTRA/FNAME/FCOMMENT/FHCRC
  fields, multi-member streams, CRC-32 (table-driven, polynomial
  0xEDB88320 from the RFC) and ISIZE verified per member.

Cross-validation: tests inflate streams produced by the stdlib
``zlib``/``gzip`` modules (a REAL independent producer baked into
this environment) across every compression level 0..9, strategies
(filtered/huffman-only/RLE/fixed), random + highly-repetitive +
incompressible payloads, and flip-byte fuzz — plus parity with
``zlib.decompress`` on every format fixture corpus the engine already
carries.  A green suite proves this inverts real deflate streams,
not a private dialect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from .payload_memo import dedup_payload_batches

__all__ = ["inflate", "zlib_decompress", "gzip_decompress",
           "adler32", "crc32", "decode_gzip_members",
           "deflate_compress", "gzip_compress", "zlib_compress"]

_MAX_OUT = 256 * 1024 * 1024

# RFC 1951 §3.2.5 — length codes 257..285: (extra bits, base length)
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
              3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0]
_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27,
             31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195,
             227, 258]
# distance codes 0..29
_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
               7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97,
              129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073,
              4097, 6145, 8193, 12289, 16385, 24577]
# §3.2.7 — the code-length code's scrambled length order
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13,
              2, 14, 1, 15]


class _Bits:
    """LSB-first bit reader over bytes (the deflate bit order)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        got = 0
        data = self.data
        while got < n:
            if self.pos >= len(data):
                raise ValueError("deflate: bitstream underrun")
            avail = 8 - self.bit
            take = min(n - got, avail)
            out |= ((data[self.pos] >> self.bit)
                    & ((1 << take) - 1)) << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _Huf:
    """Canonical Huffman decoder built from code lengths (RFC 1951
    §3.2.2), decoded MSB-first within the LSB-first bitstream."""

    __slots__ = ("counts", "symbols", "max_len")

    def __init__(self, lengths: list[int]) -> None:
        max_len = max(lengths) if lengths else 0
        if max_len == 0:
            raise ValueError("deflate: empty Huffman code")
        counts = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                counts[ln] += 1
        # completeness: left-justified code space must not overflow
        left = 1
        for ln in range(1, max_len + 1):
            left = (left << 1) - counts[ln]
            if left < 0:
                raise ValueError("deflate: over-subscribed Huffman "
                                 "code")
        offs = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            offs[ln + 1] = offs[ln] + counts[ln]
        symbols = [0] * sum(counts[1:])
        for sym, ln in enumerate(lengths):
            if ln:
                symbols[offs[ln]] = sym
                offs[ln] += 1
        self.counts = counts
        self.symbols = symbols
        self.max_len = max_len

    def decode(self, br: _Bits) -> int:
        code = 0
        first = 0
        index = 0
        for ln in range(1, self.max_len + 1):
            code |= br.read(1)
            count = self.counts[ln]
            if code - first < count:
                return self.symbols[index + (code - first)]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise ValueError("deflate: invalid Huffman code")


class _NoDist:
    """RFC 1951 §3.2.7: a dynamic block may declare ZERO distance
    codes (HDIST=1, single 0-length code) when the data is all
    literals; any distance decode attempt is then invalid."""

    def decode(self, br: "_Bits") -> int:
        raise ValueError("deflate: distance code used but none "
                         "defined")


_NO_DIST = _NoDist()

_FIXED_LIT = None
_FIXED_DIST = None


def _fixed_tables() -> tuple[_Huf, _Huf]:
    global _FIXED_LIT, _FIXED_DIST
    if _FIXED_LIT is None:
        lens = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
        _FIXED_LIT = _Huf(lens)
        _FIXED_DIST = _Huf([5] * 30)
    return _FIXED_LIT, _FIXED_DIST


def inflate(data: bytes, pos: int = 0,
            max_out: int = _MAX_OUT) -> tuple[bytes, int]:
    """Raw-deflate decode starting at byte ``pos`` → (output, next
    byte position after the final block)."""
    br = _Bits(data, pos)
    out = bytearray()
    while True:
        final = br.read(1)
        btype = br.read(2)
        if btype == 0:  # stored
            br.align()
            p = br.pos
            if p + 4 > len(data):
                raise ValueError("deflate: truncated stored header")
            ln = int.from_bytes(data[p:p + 2], "little")
            nln = int.from_bytes(data[p + 2:p + 4], "little")
            if ln != (~nln & 0xFFFF):
                raise ValueError("deflate: stored LEN/NLEN mismatch")
            seg = data[p + 4:p + 4 + ln]
            if len(seg) != ln:
                raise ValueError("deflate: truncated stored block")
            out += seg
            br.pos = p + 4 + ln
            br.bit = 0
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _fixed_tables()
            else:
                hlit = br.read(5) + 257
                hdist = br.read(5) + 1
                hclen = br.read(4) + 4
                clc_len = [0] * 19
                for i in range(hclen):
                    clc_len[_CLC_ORDER[i]] = br.read(3)
                clc = _Huf(clc_len)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    sym = clc.decode(br)
                    if sym < 16:
                        lens.append(sym)
                    elif sym == 16:
                        if not lens:
                            raise ValueError("deflate: repeat with no "
                                             "previous length")
                        lens.extend([lens[-1]] * (3 + br.read(2)))
                    elif sym == 17:
                        lens.extend([0] * (3 + br.read(3)))
                    else:
                        lens.extend([0] * (11 + br.read(7)))
                if len(lens) != hlit + hdist:
                    raise ValueError("deflate: code lengths overrun")
                lit = _Huf(lens[:hlit])
                dlens = lens[hlit:]
                dist = _Huf(dlens) if any(dlens) else _NO_DIST
            while True:
                sym = lit.decode(br)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError("deflate: bad length symbol")
                    i = sym - 257
                    length = _LEN_BASE[i] + br.read(_LEN_EXTRA[i])
                    dsym = dist.decode(br)
                    if dsym > 29:
                        raise ValueError("deflate: bad distance "
                                         "symbol")
                    d = _DIST_BASE[dsym] + br.read(_DIST_EXTRA[dsym])
                    if d > len(out):
                        raise ValueError("deflate: distance beyond "
                                         "output start")
                    start = len(out) - d
                    for k in range(length):  # overlap-safe
                        out.append(out[start + k])
                if len(out) > max_out:
                    raise ValueError("deflate: output exceeds cap")
        else:
            raise ValueError("deflate: reserved block type")
        if len(out) > max_out:
            raise ValueError("deflate: output exceeds cap")
        if final:
            break
    br.align()
    return bytes(out), br.pos


def adler32(data: bytes, start: int = 1) -> int:
    """Adler-32 per RFC 1950 §8 (mod 65521)."""
    a = start & 0xFFFF
    b = (start >> 16) & 0xFFFF
    for i in range(0, len(data), 5552):  # largest n with no overflow
        for byte in data[i:i + 5552]:
            a += byte
            b += a
        a %= 65521
        b %= 65521
    return (b << 16) | a


_CRC_TABLE = None


def crc32(data: bytes, start: int = 0) -> int:
    """CRC-32 per RFC 1952 §8 (reflected polynomial 0xEDB88320),
    table-driven."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (0xEDB88320 ^ (c >> 1)) if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    crc = start ^ 0xFFFFFFFF
    table = _CRC_TABLE
    for byte in data:
        crc = table[(crc ^ byte) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def zlib_decompress(data: bytes) -> bytes:
    """RFC 1950: CMF/FLG + raw deflate + Adler-32 trailer."""
    if len(data) < 6:
        raise ValueError("zlib: stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib: compression method is not deflate")
    if (cmf >> 4) > 7:
        raise ValueError("zlib: window size exceeds 32K")
    if (cmf * 256 + flg) % 31:
        raise ValueError("zlib: FCHECK failed")
    if flg & 0x20:
        raise ValueError("zlib: preset dictionary (FDICT) gated")
    out, pos = inflate(data, 2)
    if pos + 4 > len(data):
        raise ValueError("zlib: truncated Adler-32 trailer")
    want = int.from_bytes(data[pos:pos + 4], "big")
    if adler32(out) != want:
        raise ValueError("zlib: Adler-32 mismatch")
    return out


def gzip_decompress(data: bytes) -> tuple[bytes, int]:
    """RFC 1952, multi-member: → (concatenated content, n_members).
    CRC-32 and ISIZE verified per member."""
    pos = 0
    parts = []
    members = 0
    if len(data) < 18:
        raise ValueError("gzip: stream too short")
    while pos < len(data):
        if pos + 10 > len(data):
            raise ValueError("gzip: truncated member header")
        if data[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError("gzip: bad magic")
        if data[pos + 2] != 8:
            raise ValueError("gzip: compression method is not deflate")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise ValueError("gzip: reserved flag bits set")
        p = pos + 10
        if flg & 0x04:  # FEXTRA
            if p + 2 > len(data):
                raise ValueError("gzip: truncated FEXTRA")
            xlen = int.from_bytes(data[p:p + 2], "little")
            p += 2 + xlen
        if flg & 0x08:  # FNAME
            end = data.find(b"\x00", p)
            if end < 0:
                raise ValueError("gzip: unterminated FNAME")
            p = end + 1
        if flg & 0x10:  # FCOMMENT
            end = data.find(b"\x00", p)
            if end < 0:
                raise ValueError("gzip: unterminated FCOMMENT")
            p = end + 1
        if flg & 0x02:  # FHCRC
            if p + 2 > len(data):
                raise ValueError("gzip: truncated FHCRC")
            want = int.from_bytes(data[p:p + 2], "little")
            if crc32(data[pos:p]) & 0xFFFF != want:
                raise ValueError("gzip: header CRC mismatch")
            p += 2
        out, p = inflate(data, p)
        if p + 8 > len(data):
            raise ValueError("gzip: truncated member trailer")
        want_crc = int.from_bytes(data[p:p + 4], "little")
        want_size = int.from_bytes(data[p + 4:p + 8], "little")
        if crc32(out) != want_crc:
            raise ValueError("gzip: CRC-32 mismatch")
        if len(out) & 0xFFFFFFFF != want_size:
            raise ValueError("gzip: ISIZE mismatch")
        parts.append(out)
        members += 1
        pos = p + 8
    return b"".join(parts), members


GZIP_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_members", IntegerType()),
    StructField("content_len", LongType()),
    StructField("content_sum", LongType()),
    StructField("decode_error", StringType()),
])


def decode_gzip_members(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over :func:`gzip_decompress` —
    the from-scratch RFC 1951/1952 path (same contract as
    decode_zstd_meta); per-payload quarantine, no shuffle."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "n_members", "content_len", "content_sum",
                "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    content, nm = gzip_decompress(bytes(payload))
                    rows["n_members"].append(nm)
                    rows["content_len"].append(len(content))
                    rows["content_sum"].append(sum(content))
                    rows["decode_error"].append(None)
                except (ValueError, IndexError) as e:
                    for k in ("n_members", "content_len",
                              "content_sum"):
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "n_members": pd.Series(rows["n_members"],
                                       dtype="Int32"),
                "content_len": pd.Series(rows["content_len"],
                                         dtype="Int64"),
                "content_sum": pd.Series(rows["content_sum"],
                                         dtype="Int64"),
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        dedup_payload_batches(_run, id_col, payload_col),
        schema=GZIP_SCHEMA)


# --------------------------------------------------------------------------
# DEFLATE COMPRESSOR (r13) — fixed-Huffman blocks (RFC 1951 §3.2.6)
# with a real greedy LZ77 matcher (hash-4 chains, lengths 3-258,
# distances to 32 KiB), plus the gzip (RFC 1952) and zlib (RFC 1950)
# wrappers over the module's own CRC-32 / Adler-32.
#
# The inverse of `inflate` above: every emitted stream is
# decompressed by STDLIB ZLIB (the independent consumer) in
# tests/test_inflate_write.py and inside the
# `gzip_write_roundtrip` driver query, and by this module's own
# decoder.  Fixed Huffman needs no code-length transmission, so the
# emitted bytes are spec-minimal while still exercising real match
# encoding; dynamic-Huffman writing is a named non-goal (the READER
# handles it).

def _len_code(length: int) -> tuple[int, int, int]:
    """(symbol, extra_bits, extra_value) for a match length."""
    if length == 258:
        return 285, 0, 0
    if length < 11:
        return 254 + length, 0, 0
    extra = 1
    base = 11
    span = 4 * 2
    code = 265
    while length >= base + span:
        base += span
        code += 4
        extra += 1
        span = 4 * (1 << extra)
    step = 1 << extra
    return (code + (length - base) // step, extra,
            (length - base) % step)


def _dist_code(dist: int) -> tuple[int, int, int]:
    """(symbol, extra_bits, extra_value) for a match distance."""
    if dist <= 4:
        return dist - 1, 0, 0
    extra = 1
    base = 5
    code = 4
    while dist >= base + (2 << extra):
        base += 2 << extra
        code += 2
        extra += 1
    step = 1 << extra
    return (code + (dist - base) // step, extra,
            (dist - base) % step)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        """LSB-first packing (RFC 1951 §3.1.1)."""
        self.acc |= value << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def huff(self, code: int, n: int) -> None:
        """Huffman codes are packed MSB-of-code first."""
        rev = 0
        for _ in range(n):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.bits(rev, n)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _put_litlen(w: _BitWriter, sym: int) -> None:
    if sym <= 143:
        w.huff(0x30 + sym, 8)
    elif sym <= 255:
        w.huff(0x190 + sym - 144, 9)
    elif sym <= 279:
        w.huff(sym - 256, 7)
    else:
        w.huff(0xC0 + sym - 280, 8)


def deflate_compress(data: bytes) -> bytes:
    """Compress ``data`` as one fixed-Huffman DEFLATE block."""
    w = _BitWriter()
    w.bits(1, 1)   # BFINAL
    w.bits(1, 2)   # BTYPE 01: fixed Huffman
    n = len(data)
    table: dict[bytes, int] = {}
    i = 0
    while i < n:
        match_len = 0
        match_dist = 0
        if i + 3 <= n:
            key = data[i:i + 3]
            j = table.get(key)
            table[key] = i
            if j is not None and i - j <= 32768:
                length = 3
                cap = min(258, n - i)
                while length < cap and \
                        data[j + length] == data[i + length]:
                    length += 1
                match_len = length
                match_dist = i - j
        if match_len >= 3:
            sym, eb, ev = _len_code(match_len)
            _put_litlen(w, sym)
            if eb:
                w.bits(ev, eb)
            dsym, deb, dev = _dist_code(match_dist)
            w.huff(dsym, 5)
            if deb:
                w.bits(dev, deb)
            # index the skipped positions so later matches can
            # anchor inside this run
            end = i + match_len
            i += 1
            while i < end:
                if i + 3 <= n:
                    table[data[i:i + 3]] = i
                i += 1
        else:
            _put_litlen(w, data[i])
            i += 1
    _put_litlen(w, 256)  # end of block
    return w.finish()


def gzip_compress(data: bytes) -> bytes:
    """A complete RFC 1952 gzip member over
    :func:`deflate_compress` (own CRC-32 trailer)."""
    head = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    return (head + deflate_compress(data)
            + (crc32(data) & 0xFFFFFFFF).to_bytes(4, "little")
            + (len(data) & 0xFFFFFFFF).to_bytes(4, "little"))


def zlib_compress(data: bytes) -> bytes:
    """A complete RFC 1950 zlib stream over
    :func:`deflate_compress` (own Adler-32 trailer)."""
    return (b"\x78\x01" + deflate_compress(data)
            + adler32(data).to_bytes(4, "big"))


CODEC_WRITE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("content_len", LongType()),
    StructField("content_sum", LongType()),
    StructField("zstd_foreign_ok", IntegerType()),
    StructField("gzip_foreign_ok", IntegerType()),
    StructField("zlib_foreign_ok", IntegerType()),
    StructField("lz4_foreign_ok", IntegerType()),
    StructField("bz2_foreign_ok", IntegerType()),
    StructField("xz_foreign_ok", IntegerType()),
    StructField("own_ok", IntegerType()),
    StructField("decode_error", StringType()),
])


def decode_codec_write_roundtrip(
    df: DataFrame, make_content,
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow ``mapInPandas`` sink-and-check for the r13 compressor
    family: per document, compress the planted content with the
    engine's own zstd store/RLE frame writer, DEFLATE fixed-Huffman
    gzip member, and zlib stream — then decompress each with the
    INDEPENDENT consumer (libzstd via pyarrow, stdlib zlib) and with
    the engine's own decoders, and report parity flags."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib as _zlib

        import pyarrow as _pa

        from .bzip2 import bzip2_compress, bzip2_decompress
        from .xz import (
            lzma_alone_compress,
            lzma_alone_decompress,
            xz_decompress,
            xz_store_compress,
        )
        from .lz4 import parse_lz4_frame, write_lz4_frame
        from .zstd import compress_zstd_store, decompress_zstd

        zc = _pa.Codec("zstd")
        lc = _pa.Codec("lz4")
        cols = ("content_len", "content_sum", "zstd_foreign_ok",
                "gzip_foreign_ok", "zlib_foreign_ok",
                "lz4_foreign_ok", "bz2_foreign_ok",
                "xz_foreign_ok", "own_ok")
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id in pdf[id_col]:
                rows["doc_id"].append(doc_id)
                try:
                    d = make_content(int(doc_id) % 1000)
                    zfr = compress_zstd_store(d, checksum=True)
                    gz = gzip_compress(d)
                    zl = zlib_compress(d)
                    rows["content_len"].append(len(d))
                    rows["content_sum"].append(sum(d))
                    rows["zstd_foreign_ok"].append(int(
                        zc.decompress(zfr, decompressed_size=len(d),
                                      asbytes=True) == d))
                    rows["gzip_foreign_ok"].append(int(
                        _zlib.decompress(gz, 16 + 15) == d))
                    rows["zlib_foreign_ok"].append(int(
                        _zlib.decompress(zl) == d))
                    l4 = write_lz4_frame(d)
                    rows["lz4_foreign_ok"].append(int(
                        lc.decompress(l4, decompressed_size=len(d),
                                      asbytes=True) == d))
                    import bz2 as _bz2
                    import lzma as _lzma
                    bzc = bzip2_compress(d)
                    rows["bz2_foreign_ok"].append(int(
                        _bz2.decompress(bzc) == d))
                    al = lzma_alone_compress(d)
                    xs = xz_store_compress(d)
                    rows["xz_foreign_ok"].append(int(
                        _lzma.decompress(al) == d
                        and _lzma.decompress(xs) == d))
                    rows["own_ok"].append(int(
                        decompress_zstd(zfr) == d
                        and gzip_decompress(gz)[0] == d
                        and zlib_decompress(zl) == d
                        and parse_lz4_frame(l4)[0] == d
                        and bzip2_decompress(bzc)[0] == d
                        and lzma_alone_decompress(al) == d
                        and xz_decompress(xs)[0] == d))
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, KeyError, TypeError,
                        OSError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(
                    rows[k],
                    dtype="Int64" if k.startswith("content")
                    else "Int32")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    # id-driven operator: every output column is a pure function of the
    # synthesis seed (id % 1000) — dedup per batch on that key (r13 opt)
    from .payload_memo import dedup_key_batches
    return df.select(id_col).mapInPandas(
        dedup_key_batches(_run, key_of_id=lambda i: i % 1000,
                          id_col=id_col),
        schema=CODEC_WRITE_SCHEMA)
