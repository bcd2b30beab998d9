"""From-scratch Arrow IPC STREAM writer — public Apache Arrow
columnar specification (Message.fbs / Schema.fbs and the FlatBuffers
wire format).

The read direction (operators/arrow_ipc.py) walks FlatBuffers
without the Arrow library; this module BUILDS them without it: a
minimal bottom-up FlatBuffers builder (front-insertion buffer, so an
object's distance-from-end is position-stable; vtables deduplicated
by construction order; scalar alignment maintained against the
buffer end, with every emitted flatbuffer padded to 8 so end-
alignment equals final address alignment) emits Schema and
RecordBatch messages in the encapsulated-message framing
(0xFFFFFFFF continuation, metadata length, 8-aligned body, EOS
marker).

Scope (flat nullable columns, the interchange workhorse set):
int64, float64, utf8, bool — validity bitmaps, int32 utf8 offsets,
multiple record batches.  No compression, no dictionaries, no
nesting: those raise named ``ValueError``s (the READER handles
them; the writer stays small).

Cross-validation: tests/test_arrow_write.py reads every emitted
stream back with pyarrow (the independent consumer) AND the
engine's own reader; the ``arrow_write_roundtrip`` driver query does
the pyarrow read-back inside the Arrow map.
"""

from __future__ import annotations

import struct
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

__all__ = ["write_arrow_stream", "decode_arrow_roundtrip"]

# Type union ordinals, Schema.fbs declaration order (same table the
# reader uses)
_T_INT = 2
_T_FLOAT = 3
_T_UTF8 = 5
_T_BOOL = 6

_TYPES = {"int64": _T_INT, "double": _T_FLOAT, "string": _T_UTF8,
          "boolean": _T_BOOL}


class _Fbb:
    """Tiny bottom-up FlatBuffers builder.  Data is INSERTED AT THE
    FRONT of ``buf``, so any object's distance from the buffer end
    never changes; offsets are computed between distances.  The
    finished buffer is padded to a multiple of 8, which makes
    end-relative alignment equal final-address alignment for every
    scalar of size <= 8."""

    def __init__(self) -> None:
        self.buf = bytearray()

    # -- primitives --------------------------------------------------
    def _prepend(self, data: bytes) -> int:
        self.buf[:0] = data
        return len(self.buf)

    def _pad_to(self, align: int, extra: int) -> None:
        """Pad so that after writing ``extra`` more bytes the
        distance-from-end is a multiple of ``align``."""
        need = (-(len(self.buf) + extra)) % align
        if need:
            self.buf[:0] = b"\x00" * need

    def string(self, s: str) -> int:
        raw = s.encode("utf-8")
        # pad FIRST so the u32 length lands 4-aligned and stays
        # byte-adjacent to the string data
        self._pad_to(4, len(raw) + 1 + 4)
        self._prepend(b"\x00")                       # terminator
        self._prepend(raw)
        return self._prepend(struct.pack("<I", len(raw)))

    def vector_of_offsets(self, offsets: "list[int]") -> int:
        # elements are uoffsets (u32), written last-to-first
        self._pad_to(4, 4 * (len(offsets) + 1))
        for off in reversed(offsets):
            here = len(self.buf) + 4
            self._prepend(struct.pack("<I", here - off))
        return self._prepend(struct.pack("<I", len(offsets)))

    def vector_of_structs(self, raw: bytes, n: int,
                          align: int = 8) -> int:
        # elements 8-aligned; the u32 length prefix is then
        # automatically 4-aligned and byte-adjacent
        self._pad_to(align, len(raw))
        self._prepend(raw)
        return self._prepend(struct.pack("<I", n))

    def table(self, fields: "list[tuple[int, str, object]]") -> int:
        """Build a table from [(field_id, kind, value)] where kind is
        'i8'/'i16'/'i32'/'i64'/'bool'/'off'.  Field ids are the
        .fbs declaration indices; default-valued fields must simply
        be omitted by the caller.  Returns the table's distance."""
        if fields:
            max_id = max(f[0] for f in fields)
        else:
            max_id = -1
        slots = [0] * (max_id + 1)
        # table payload is written field-by-field (front-insertion:
        # last written ends up first); track each field's distance,
        # then convert to table-relative offsets once the table
        # start is known.
        sizes = {"i8": 1, "i16": 2, "i32": 4, "i64": 8, "bool": 1,
                 "off": 4}
        dists: dict[int, tuple[int, int]] = {}
        # write larger scalars first for compact alignment: sort by
        # size descending, stable
        for fid, kind, val in sorted(fields, key=lambda f:
                                     -sizes[f[1]]):
            sz = sizes[kind]
            if kind == "off":
                self._pad_to(4, 4)
                here = len(self.buf) + 4
                dists[fid] = (self._prepend(
                    struct.pack("<I", here - int(val))), 4)
            elif kind == "bool":
                dists[fid] = (self._prepend(
                    b"\x01" if val else b"\x00"), 1)
            else:
                fmt = {"i8": "<b", "i16": "<h", "i32": "<i",
                       "i64": "<q"}[kind]
                self._pad_to(sz, sz)
                dists[fid] = (self._prepend(struct.pack(fmt, val)),
                              sz)
        # soffset to vtable sits at the table start (4 bytes)
        self._pad_to(4, 4)
        table_dist = len(self.buf) + 4
        for fid, (d, _sz) in dists.items():
            slots[fid] = table_dist - d
        vt_size = 4 + 2 * len(slots)
        table_size = max((table_dist - d + sz
                          for d, sz in dists.values()), default=4)
        vtable = struct.pack("<HH", vt_size, table_size)
        vtable += b"".join(struct.pack("<H", s) for s in slots)
        # place vtable directly in front of the table's soffset
        self._prepend(struct.pack("<i", vt_size))  # soffset: vtable
        # is immediately before the table → table_pos - vtable_pos
        # = vt_size
        self._prepend(vtable)
        return table_dist

    def finish(self, root: int) -> bytes:
        # pad so the total size after the 4-byte root uoffset is a
        # multiple of 8 — then end-relative alignment equals final
        # address alignment for every scalar (and the encapsulated-
        # message framing needs no extra metadata padding)
        self._pad_to(8, 4)
        here = len(self.buf) + 4
        self._prepend(struct.pack("<I", here - root))
        return bytes(self.buf)


def _field_table(b: _Fbb, name: str, typ: str) -> int:
    if typ == "int64":
        type_tbl = b.table([(0, "i32", 64), (1, "bool", True)])
    elif typ == "double":
        type_tbl = b.table([(0, "i16", 2)])        # DOUBLE
    else:
        type_tbl = b.table([])                     # Utf8 / Bool
    name_off = b.string(name)
    return b.table([
        (0, "off", name_off),
        (1, "bool", True),                         # nullable
        (2, "i8", _TYPES[typ]),                    # type_type
        (3, "off", type_tbl),
    ])


def _message(b: _Fbb, header_type: int, header: int,
             body_len: int) -> bytes:
    root = b.table([
        (0, "i16", 4),                             # MetadataVersion V5
        (1, "i8", header_type),
        (2, "off", header),
        (3, "i64", body_len),
    ])
    return b.finish(root)


def _frame(meta: bytes, body: bytes) -> bytes:
    assert len(meta) % 8 == 0
    return (b"\xff\xff\xff\xff" + struct.pack("<I", len(meta))
            + meta + body)


def _bitmap(window: "list") -> bytes:
    out = bytearray((len(window) + 7) // 8)
    for i, v in enumerate(window):
        if v is not None:
            out[i >> 3] |= 1 << (i & 7)
    return bytes(out)


def write_arrow_stream(columns: "list[tuple[str, str, list]]",
                       batch_size: int | None = None) -> bytes:
    """Write ``[(name, type, values), ...]`` (types int64 / double /
    string / boolean; values may contain None) as an Arrow IPC
    STREAM.  Returns the stream bytes."""
    if not columns:
        raise ValueError("arrow-write: no columns")
    n_rows = len(columns[0][2])
    for name, typ, vals in columns:
        if typ not in _TYPES:
            raise ValueError(f"arrow-write: type {typ!r} gated")
        if len(vals) != n_rows:
            raise ValueError("arrow-write: ragged columns")
    # ---- schema message
    b = _Fbb()
    field_offs = [_field_table(b, name, typ)
                  for name, typ, _ in columns]
    fields_vec = b.vector_of_offsets(field_offs)
    schema_tbl = b.table([(1, "off", fields_vec)])
    out = bytearray(_frame(_message(b, 1, schema_tbl, 0), b""))
    # ---- record batches
    step = batch_size or max(n_rows, 1)
    for at in range(0, max(n_rows, 1), step):
        sl = slice(at, min(at + step, n_rows))
        nb = sl.stop - sl.start
        body = bytearray()
        nodes = b""
        bufs = b""

        def _add_buf(raw: bytes) -> bytes:
            nonlocal body
            off = len(body)
            body += raw
            if len(body) % 8:
                body += b"\x00" * (8 - len(body) % 8)
            return struct.pack("<qq", off, len(raw))

        for name, typ, vals in columns:
            window = vals[sl]
            nulls = sum(1 for v in window if v is None)
            nodes += struct.pack("<qq", nb, nulls)
            bufs += _add_buf(_bitmap(window) if nulls else b"")
            if typ == "int64":
                bufs += _add_buf(b"".join(
                    struct.pack("<q", 0 if v is None else v)
                    for v in window))
            elif typ == "double":
                bufs += _add_buf(b"".join(
                    struct.pack("<d", 0.0 if v is None else float(v))
                    for v in window))
            elif typ == "boolean":
                bits = bytearray((nb + 7) // 8)
                for i, v in enumerate(window):
                    if v:
                        bits[i >> 3] |= 1 << (i & 7)
                bufs += _add_buf(bytes(bits))
            else:  # utf8: offsets + data
                offs = bytearray(struct.pack("<i", 0))
                data = bytearray()
                total = 0
                for v in window:
                    if v is not None:
                        data += v.encode("utf-8")
                    total = len(data)
                    offs += struct.pack("<i", total)
                bufs += _add_buf(bytes(offs))
                bufs += _add_buf(bytes(data))
        mb = _Fbb()
        nodes_vec = mb.vector_of_structs(nodes, len(nodes) // 16)
        bufs_vec = mb.vector_of_structs(bufs, len(bufs) // 16)
        rb_tbl = mb.table([
            (0, "i64", nb),
            (1, "off", nodes_vec),
            (2, "off", bufs_vec),
        ])
        out += _frame(_message(mb, 3, rb_tbl, len(body)),
                      bytes(body))
    out += b"\xff\xff\xff\xff\x00\x00\x00\x00"     # EOS
    return bytes(out)


ARROW_RT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_rows", LongType()),
    StructField("n_batches", IntegerType()),
    StructField("id_sum", LongType()),
    StructField("x2_sum", LongType()),
    StructField("s_bytes", LongType()),
    StructField("b_true", LongType()),
    StructField("n_nulls", LongType()),
    StructField("own_agree", IntegerType()),
    StructField("decode_error", StringType()),
])


def decode_arrow_roundtrip(
    df: DataFrame, make_columns, batch_for,
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow ``mapInPandas`` sink-and-check: write each document's
    planted columns with :func:`write_arrow_stream`, read the bytes
    back with pyarrow (the INDEPENDENT consumer) and tally
    evidence; ``own_agree`` pins the engine's own reader
    (operators/arrow_ipc.py) to the identical id column."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        from .arrow_ipc import arrow_read_column

        cols = ("n_rows", "n_batches", "id_sum", "x2_sum",
                "s_bytes", "b_true", "n_nulls", "own_agree")
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id in pdf[id_col]:
                rows["doc_id"].append(doc_id)
                try:
                    seed = int(doc_id) % 1000
                    columns = make_columns(seed)
                    blob = write_arrow_stream(
                        columns, batch_size=batch_for(seed))
                    rd = pa.ipc.open_stream(blob)
                    tbs = list(rd)
                    t = pa.Table.from_batches(tbs)
                    ids = t.column("id").to_pylist()
                    xs = t.column("x").to_pylist()
                    ss = t.column("s").to_pylist()
                    bs = t.column("b").to_pylist()
                    own = arrow_read_column(blob, "id")
                    rows["n_rows"].append(t.num_rows)
                    rows["n_batches"].append(len(tbs))
                    rows["id_sum"].append(
                        sum(v for v in ids if v is not None))
                    rows["x2_sum"].append(
                        sum(int(round(v * 2)) for v in xs
                            if v is not None))
                    rows["s_bytes"].append(
                        sum(len(s.encode()) for s in ss
                            if s is not None))
                    rows["b_true"].append(sum(1 for v in bs if v))
                    rows["n_nulls"].append(
                        sum(1 for v in ids if v is None))
                    rows["own_agree"].append(int(own == ids))
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
                    dtype="Int32" if k in ("n_batches", "own_agree")
                    else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    # id-driven operator: outputs are a pure function of id % 1000 —
    # dedup per batch on that seed key (r13 opt)
    from .payload_memo import dedup_key_batches
    return df.select(id_col).mapInPandas(
        dedup_key_batches(_run, key_of_id=lambda i: i % 1000,
                          id_col=id_col),
        schema=ARROW_RT_SCHEMA)
