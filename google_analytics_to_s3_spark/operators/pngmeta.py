"""PNG metadata chunks — public spec (PNG Third Edition / W3C):
``tEXt``, ``zTXt``, ``iTXt`` textual metadata and the ``eXIf`` chunk.

Provenance, captions and copyright live in PNG text chunks; training
pipelines harvest them for filtering and attribution. The raster
decoder (multimodal._parse_png) ignores ancillary chunks; this module
reads them:

- **chunk walk** with real CRC-32 verification on every chunk
  (zlib.crc32 over type+data, per spec);
- **tEXt**: ``keyword\\0text`` latin-1;
- **zTXt**: ``keyword\\0`` + compression method 0 + zlib-deflated
  latin-1 text;
- **iTXt**: ``keyword\\0`` + compressed flag/method + language tag
  ``\\0`` + translated keyword ``\\0`` + UTF-8 text, optionally
  deflated;
- **eXIf**: a raw EXIF TIFF tree, walked by the shared
  operators/exif.parse_exif_tiff.

Untrusted-input discipline matches the other byte paths (bounds,
truncation checks, decompression caps, quarantine). No PNG-metadata
surface exists in the reference repo
(mydatastack/google-analytics-to-s3).
"""

from __future__ import annotations

import zlib
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

from .exif import parse_exif_tiff
from .payload_memo import dedup_payload_batches

_MAGIC = b"\x89PNG\r\n\x1a\n"
_MAX_TEXT = 16 * 1024 * 1024


def _inflate(data: bytes) -> bytes:
    try:
        d = zlib.decompressobj()
        out = d.decompress(data, _MAX_TEXT)
        if d.unconsumed_tail:
            raise ValueError("PNG text exceeds decompression bound")
        return out
    except zlib.error as e:
        raise ValueError(f"PNG text inflate error: {e}") from e


def parse_png_metadata(raw: bytes) -> dict:
    """Walk all chunks (CRCs verified); returns texts
    ([(keyword, text)]) and exif (dict or None)."""
    if raw[:8] != _MAGIC:
        raise ValueError("PNG signature missing")
    pos = 8
    texts: list[tuple[str, str]] = []
    exif = None
    seen_iend = False
    while pos + 8 <= len(raw):
        length = int.from_bytes(raw[pos:pos + 4], "big")
        ctype = raw[pos + 4:pos + 8]
        if length > len(raw):
            raise ValueError("PNG chunk length overruns file")
        data = raw[pos + 8:pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(raw):
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(raw[pos + 8 + length:pos + 12 + length],
                             "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(
                f"PNG {ctype.decode('latin-1')} chunk CRC mismatch")
        if ctype == b"tEXt":
            kw, _, text = data.partition(b"\x00")
            texts.append((kw.decode("latin-1"),
                          text.decode("latin-1")))
        elif ctype == b"zTXt":
            kw, _, rest = data.partition(b"\x00")
            if not rest or rest[0] != 0:
                raise ValueError("zTXt compression method invalid")
            texts.append((kw.decode("latin-1"),
                          _inflate(rest[1:]).decode("latin-1")))
        elif ctype == b"iTXt":
            kw, _, rest = data.partition(b"\x00")
            if len(rest) < 2:
                raise ValueError("truncated iTXt header")
            comp_flag, comp_method = rest[0], rest[1]
            if comp_flag not in (0, 1) or comp_method != 0:
                raise ValueError("iTXt compression fields invalid")
            _lang, _, rest2 = rest[2:].partition(b"\x00")
            _trans, _, body = rest2.partition(b"\x00")
            if comp_flag:
                body = _inflate(body)
            texts.append((kw.decode("latin-1"), body.decode("utf-8")))
        elif ctype == b"eXIf":
            exif = parse_exif_tiff(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
        if len(texts) > 10_000:
            raise ValueError("PNG text chunk count exceeds bound")
    if not seen_iend:
        raise ValueError("PNG IEND missing")
    return {"texts": texts, "exif": exif}


PNG_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_texts", IntegerType()),
    StructField("title", StringType()),
    StructField("desc_chars", LongType()),
    StructField("comment_chars", LongType()),
    StructField("exif_orientation", IntegerType()),
    StructField("exif_iso", IntegerType()),
    StructField("extract_error", StringType()),
])


def extract_png_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow ``mapInPandas`` over :func:`parse_png_metadata`: keyed
    Title/Description/Comment text stats + the eXIf orientation/ISO.
    Per-payload quarantine, no shuffle."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "n_texts", "title", "desc_chars",
                "comment_chars", "exif_orientation", "exif_iso",
                "extract_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    m = parse_png_metadata(bytes(payload))
                    kv = dict(m["texts"])
                    ex = m["exif"] or {}
                    rows["n_texts"].append(len(m["texts"]))
                    rows["title"].append(kv.get("Title"))
                    rows["desc_chars"].append(
                        len(kv.get("Description", "")))
                    rows["comment_chars"].append(
                        len(kv.get("Comment", "")))
                    rows["exif_orientation"].append(
                        ex.get("orientation"))
                    rows["exif_iso"].append(ex.get("iso"))
                    rows["extract_error"].append(None)
                except (ValueError, IndexError,
                        UnicodeDecodeError) as e:
                    for k in ("n_texts", "title", "desc_chars",
                              "comment_chars", "exif_orientation",
                              "exif_iso"):
                        rows[k].append(None)
                    rows["extract_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "n_texts": pd.Series(rows["n_texts"], dtype="Int32"),
                "title": pd.Series(rows["title"], dtype=object),
                "desc_chars": pd.Series(rows["desc_chars"],
                                        dtype="Int64"),
                "comment_chars": pd.Series(rows["comment_chars"],
                                           dtype="Int64"),
                "exif_orientation": pd.Series(
                    rows["exif_orientation"], dtype="Int32"),
                "exif_iso": pd.Series(rows["exif_iso"], dtype="Int32"),
                "extract_error": pd.Series(rows["extract_error"],
                                           dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        dedup_payload_batches(_extract, id_col, payload_col),
        schema=PNG_META_SCHEMA
    )
