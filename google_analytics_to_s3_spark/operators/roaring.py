"""Roaring bitmaps (the public RoaringFormatSpec interop
serialization) + Z85 encoding (ZeroMQ RFC 32) — the byte path under
Delta Lake deletion vectors, pure Python.

- **32-bit roaring**: both cookies — ``SERIAL_COOKIE_NO_RUNCONTAINER``
  (12346, container count in the next u32, offset header always
  present) and ``SERIAL_COOKIE`` (12347, count-1 in the cookie's high
  16 bits, run-flag bitset, offsets only when count ≥ 4) — with the
  three container types: array (sorted u16), bitmap (8 KiB, 1024 LE
  words), run (u16 count + (start, length-1) pairs).
- **64-bit RoaringBitmapArray "portable"**: u64 LE bitmap count, then
  per bitmap a u32 LE high key + a 32-bit roaring serialization
  (value = key << 32 | low); keys must ascend.
- **Z85**: 4-bytes→5-chars base-85 with the RFC's character set,
  pinned on the published ``HelloWorld`` test vector.

HONESTY NOTE: no independent roaring producer exists in this
environment (no pyroaring / delta-rs; DuckDB does not expose its
internal bitmaps), so unlike the gzip/bzip2/xz/sqlite paths these
decoders cannot be cross-validated against third-party bytes here.
The decoder follows the published spec; the test fixtures use a
SEPARATE spec-following encoder (testing/fixtures.py) and the Z85
leg is pinned on the RFC's own vector.  Swapping in real
delta-rs-written DVs requires no code change.
"""

from __future__ import annotations

import struct

__all__ = ["z85_decode", "roaring32_decode", "roaring64_decode",
           "parse_deletion_vector"]

_Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_REV = {c: i for i, c in enumerate(_Z85_CHARS)}

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_decode(text: str) -> bytes:
    """ZeroMQ Z85: 5 chars → 4 bytes, big-endian base 85."""
    if len(text) % 5:
        raise ValueError("z85: length not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i:i + 5]:
            d = _Z85_REV.get(ch)
            if d is None:
                raise ValueError(f"z85: invalid character {ch!r}")
            v = v * 85 + d
        if v > 0xFFFFFFFF:
            raise ValueError("z85: quintet out of range")
        out += v.to_bytes(4, "big")
    return bytes(out)


def roaring32_decode(data: bytes, pos: int = 0) -> tuple[list[int],
                                                         int]:
    """One 32-bit roaring bitmap at ``pos`` → (sorted values, end
    position)."""
    if pos + 4 > len(data):
        raise ValueError("roaring: truncated cookie")
    cookie = struct.unpack_from("<I", data, pos)[0]
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        size = (cookie >> 16) + 1
        nb = (size + 7) // 8
        run_flags = data[pos:pos + nb]
        if len(run_flags) != nb:
            raise ValueError("roaring: truncated run bitset")
        pos += nb
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        if pos + 4 > len(data):
            raise ValueError("roaring: truncated container count")
        size = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"roaring: unknown cookie {cookie}")
    if size > 65536:
        raise ValueError("roaring: container count out of range")
    keys = []
    cards = []
    for _ in range(size):
        if pos + 4 > len(data):
            raise ValueError("roaring: truncated descriptive header")
        k, cm1 = struct.unpack_from("<HH", data, pos)
        keys.append(k)
        cards.append(cm1 + 1)
        pos += 4
    if any(b > a for a, b in zip(keys[1:], keys)):
        raise ValueError("roaring: container keys not ascending")
    if has_offsets:
        pos += 4 * size  # offsets are redundant for a sequential read
    out: list[int] = []
    for i in range(size):
        base = keys[i] << 16
        is_run = bool(run_flags) and bool(run_flags[i >> 3]
                                          & (1 << (i & 7)))
        if is_run:
            if pos + 2 > len(data):
                raise ValueError("roaring: truncated run container")
            n_runs = struct.unpack_from("<H", data, pos)[0]
            pos += 2
            prev = -1
            for _ in range(n_runs):
                if pos + 4 > len(data):
                    raise ValueError("roaring: truncated run pair")
                start, lm1 = struct.unpack_from("<HH", data, pos)
                pos += 4
                if start <= prev:
                    raise ValueError("roaring: runs not ascending")
                if start + lm1 > 0xFFFF:
                    raise ValueError("roaring: run overruns chunk")
                out.extend(range(base + start,
                                 base + start + lm1 + 1))
                prev = start + lm1
        elif cards[i] <= 4096:
            n = cards[i]
            if pos + 2 * n > len(data):
                raise ValueError("roaring: truncated array container")
            vals = struct.unpack_from(f"<{n}H", data, pos)
            pos += 2 * n
            if any(b <= a for a, b in zip(vals, vals[1:])):
                raise ValueError("roaring: array not ascending")
            out.extend(base + v for v in vals)
        else:
            if pos + 8192 > len(data):
                raise ValueError("roaring: truncated bitmap container")
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            card = 0
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    out.append(base + (wi << 6)
                               + low.bit_length() - 1)
                    w ^= low
                    card += 1
            if card != cards[i]:
                raise ValueError("roaring: bitmap cardinality "
                                 "mismatch")
    return out, pos


def roaring64_decode(data: bytes) -> list[int]:
    """RoaringBitmapArray portable format → sorted 64-bit values."""
    if len(data) < 8:
        raise ValueError("roaring64: truncated header")
    n = struct.unpack_from("<q", data, 0)[0]
    if n < 0 or n > 1 << 20:
        raise ValueError("roaring64: bitmap count out of range")
    pos = 8
    out: list[int] = []
    prev_key = -1
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("roaring64: truncated key")
        key = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if key <= prev_key:
            raise ValueError("roaring64: keys not ascending")
        prev_key = key
        vals, pos = roaring32_decode(data, pos)
        out.extend((key << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError("roaring64: trailing bytes")
    return out


_DV_MAGIC = (1681511376, 1681511377)


def parse_deletion_vector(storage_type: str, path_or_inline: str,
                          size_in_bytes: int,
                          cardinality: int) -> set[int]:
    """A Delta deletion-vector descriptor (PROTOCOL.md) → the set of
    deleted row positions.  Inline ("u") vectors are Z85-decoded;
    the serialized DV's optional 4-byte magic is accepted; the
    declared size and cardinality are validated.  File-based ("p"/
    relative) DVs need the object store and are a named gate here."""
    if storage_type != "u":
        raise ValueError(f"delta: deletion-vector storage "
                         f"{storage_type!r} gated (inline only)")
    raw = z85_decode(path_or_inline)
    # z85 works in 4-byte groups; the serialized DV may be shorter
    # than the padded encoding — sizeInBytes recovers the true length
    if size_in_bytes is not None:
        if len(raw) < size_in_bytes or len(raw) - size_in_bytes >= 4:
            raise ValueError("delta: deletion-vector size mismatch")
        raw = raw[:size_in_bytes]
    if len(raw) >= 4 and struct.unpack_from("<I", raw, 0)[0] \
            in _DV_MAGIC:
        raw = raw[4:]
    vals = roaring64_decode(raw)
    if cardinality not in (None, len(vals)):
        raise ValueError("delta: deletion-vector cardinality "
                         "mismatch")
    return set(vals)
