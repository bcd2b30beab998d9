"""Minimal pure-Python MaxMind DB (mmdb) reader — full-file iteration
only, implemented from the PUBLIC MaxMind DB file format specification
(https://maxmind.github.io/MaxMind-DB/): binary search tree of
record_size-bit node records, a 16-byte separator, the data section,
and a metadata map after the ``\\xab\\xcd\\xefMaxMind.com`` marker.

Purpose: :func:`..functions.geo_mmdb.mmdb_to_ranges` needs to walk
every network in a GeoLite2 file once (an offline build step). The
``maxminddb`` package does that when installed; this module is the
dependency-free fallback so the converter runs for real — not behind
an ImportError gate — in environments without it. Scope is
deliberately narrow: no point lookups, no memory-mapping, the whole
file is read once driver-side (GeoLite2-City is ~60 MB).

Reference analog: enrichment/filters/ip.py:4-9 opens the same file
format via ``geoip2``/``maxminddb``; the on-disk format itself is the
public spec above, not reference code.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
DATA_SECTION_SEPARATOR = 16


class MmdbFormatError(ValueError):
    """Raised for structurally invalid mmdb files."""


def _decode(buf: bytes, offset: int, data_start: int = 0) -> tuple[Any, int]:
    """Decode one value at ``offset`` (absolute in ``buf``); returns
    (value, next_offset). ``data_start`` anchors pointer targets (the
    data section start for tree data; pointers are illegal in
    metadata, where data_start < 0 flags them as errors)."""
    ctrl = buf[offset]
    offset += 1
    typ = ctrl >> 5
    size = ctrl & 0x1F

    if typ == 1:  # pointer: 001SSVVV
        ss = (ctrl >> 3) & 0x3
        vvv = ctrl & 0x7
        if data_start < 0:
            raise MmdbFormatError("pointer inside metadata section")
        if ss == 0:
            value = (vvv << 8) | buf[offset]
            offset += 1
        elif ss == 1:
            value = (vvv << 16) | (buf[offset] << 8) | buf[offset + 1]
            value += 2048
            offset += 2
        elif ss == 2:
            value = (
                (vvv << 24) | (buf[offset] << 16)
                | (buf[offset + 1] << 8) | buf[offset + 2]
            ) + 526336
            offset += 3
        else:
            value = int.from_bytes(buf[offset:offset + 4], "big")
            offset += 4
        pointed, _ = _decode(buf, data_start + value, data_start)
        return pointed, offset

    if typ == 0:  # extended type
        typ = 7 + buf[offset]
        offset += 1

    # extended sizes
    if size == 29:
        size = 29 + buf[offset]
        offset += 1
    elif size == 30:
        size = 285 + int.from_bytes(buf[offset:offset + 2], "big")
        offset += 2
    elif size == 31:
        size = 65821 + int.from_bytes(buf[offset:offset + 3], "big")
        offset += 3

    if typ == 2:  # utf8 string
        return buf[offset:offset + size].decode("utf-8"), offset + size
    if typ == 3:  # double
        if size != 8:
            raise MmdbFormatError(f"double with size {size}")
        return struct.unpack(">d", buf[offset:offset + 8])[0], offset + 8
    if typ == 4:  # bytes
        return bytes(buf[offset:offset + size]), offset + size
    if typ in (5, 6, 9, 10):  # uint16 / uint32 / uint64 / uint128
        return int.from_bytes(buf[offset:offset + size], "big"), offset + size
    if typ == 8:  # int32, two's complement big-endian
        raw = buf[offset:offset + size]
        return int.from_bytes(raw, "big", signed=True), offset + size
    if typ == 7:  # map
        out = {}
        for _ in range(size):
            key, offset = _decode(buf, offset, data_start)
            if not isinstance(key, str):
                raise MmdbFormatError(f"non-string map key {key!r}")
            out[key], offset = _decode(buf, offset, data_start)
        return out, offset
    if typ == 11:  # array
        arr = []
        for _ in range(size):
            v, offset = _decode(buf, offset, data_start)
            arr.append(v)
        return arr, offset
    if typ == 14:  # boolean: size IS the value
        return bool(size), offset
    if typ == 15:  # float
        if size != 4:
            raise MmdbFormatError(f"float with size {size}")
        return struct.unpack(">f", buf[offset:offset + 4])[0], offset + 4
    raise MmdbFormatError(f"unsupported mmdb data type {typ}")


def read_metadata(buf: bytes) -> dict:
    """Decode the metadata map after the LAST metadata marker."""
    pos = buf.rfind(METADATA_MARKER)
    if pos < 0:
        raise MmdbFormatError("no MaxMind.com metadata marker found")
    meta, _ = _decode(buf, pos + len(METADATA_MARKER), data_start=-1)
    if not isinstance(meta, dict):
        raise MmdbFormatError("metadata is not a map")
    for req in ("node_count", "record_size", "ip_version"):
        if req not in meta:
            raise MmdbFormatError(f"metadata missing {req}")
    return meta


def _node_records(buf: bytes, record_size: int, node: int) -> tuple[int, int]:
    """The (left, right) record values of tree node ``node``."""
    if record_size == 24:
        base = node * 6
        return (
            int.from_bytes(buf[base:base + 3], "big"),
            int.from_bytes(buf[base + 3:base + 6], "big"),
        )
    if record_size == 28:
        base = node * 7
        mid = buf[base + 3]
        left = ((mid >> 4) << 24) | int.from_bytes(buf[base:base + 3], "big")
        right = ((mid & 0x0F) << 24) | int.from_bytes(
            buf[base + 4:base + 7], "big"
        )
        return left, right
    if record_size == 32:
        base = node * 8
        return (
            int.from_bytes(buf[base:base + 4], "big"),
            int.from_bytes(buf[base + 4:base + 8], "big"),
        )
    raise MmdbFormatError(f"unsupported record_size {record_size}")


def iter_mmdb(path: str) -> Iterator[tuple[str, dict]]:
    """Yield every (network_cidr, record) in the database, depth-first
    — the same traversal ``maxminddb``'s iterator performs. Networks
    come out as plain CIDR strings (``"1.2.3.0/24"`` for ip_version 4,
    ``"::ffff:102:300/120"``-style for ip_version 6; the caller maps
    v4-in-v6 embeddings — functions/geo_mmdb.network_to_bounds)."""
    with open(path, "rb") as f:
        buf = f.read()
    meta = read_metadata(buf)
    node_count = meta["node_count"]
    record_size = meta["record_size"]
    depth = 32 if meta["ip_version"] == 4 else 128
    tree_size = (record_size * 2 // 8) * node_count
    data_start = tree_size + DATA_SECTION_SEPARATOR
    memo: dict[int, dict] = {}

    # iterative DFS: (node, bits-so-far as int, depth-so-far)
    stack: list[tuple[int, int, int]] = [(0, 0, 0)]
    while stack:
        node, prefix, d = stack.pop()
        if d > depth:
            raise MmdbFormatError("tree deeper than address width")
        left, right = _node_records(buf, record_size, node)
        # right pushed first so the left (0-bit) branch pops first:
        # ascending network order
        for bit, rec in ((1, right), (0, left)):
            p2 = (prefix << 1) | bit
            if rec == node_count:
                continue  # empty branch
            if rec < node_count:
                stack.append((rec, p2, d + 1))
                continue
            data_off = rec - node_count - DATA_SECTION_SEPARATOR
            if data_off < 0:
                raise MmdbFormatError(
                    f"record value {rec} inside the separator"
                )
            if data_off not in memo:
                value, _ = _decode(
                    buf, data_start + data_off, data_start
                )
                if not isinstance(value, dict):
                    raise MmdbFormatError(
                        f"leaf record is {type(value).__name__}, not map"
                    )
                memo[data_off] = value
            addr_int = p2 << (depth - (d + 1))
            yield _format_cidr(addr_int, d + 1, depth), memo[data_off]


def _format_cidr(addr_int: int, prefixlen: int, depth: int) -> str:
    import ipaddress

    if depth == 32:
        return f"{ipaddress.IPv4Address(addr_int)}/{prefixlen}"
    return f"{ipaddress.IPv6Address(addr_int)}/{prefixlen}"
