"""Arrow IPC reader (operators/arrow_ipc.py).

Cross-validation against pyarrow's IPC writer/reader: file + stream
layouts, every supported type, multi-batch, nullable columns, and
zstd / lz4-frame compressed bodies inflated through the engine's own
decoders.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from google_analytics_to_s3_spark.operators.arrow_ipc import (
    arrow_file_meta,
    arrow_read_column,
)

_T = pa.table({
    "i": pa.array([i * 7 - 100 if i % 4 else None for i in range(3000)],
                  pa.int64()),
    "i32": pa.array(range(3000), pa.int32()),
    "i16": pa.array([i % 30000 for i in range(3000)], pa.int16()),
    "u16": pa.array([i % 65000 for i in range(3000)], pa.uint16()),
    "u8": pa.array([i % 250 for i in range(3000)], pa.uint8()),
    "f": pa.array([i * 0.5 for i in range(3000)], pa.float64()),
    "f32": pa.array([float(i) for i in range(3000)], pa.float32()),
    "b": pa.array([i % 3 == 0 for i in range(3000)]),
    "s": pa.array([f"str-{i % 11}" if i % 7 else None
                   for i in range(3000)]),
    "bin": pa.array([bytes([i % 256, (i * 3) % 256])
                     for i in range(3000)], pa.binary()),
})


def _file_bytes(table: pa.Table, compression=None, chunks=1) -> bytes:
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.ipc.new_file(sink, table.schema, options=opts) as w:
        for batch in table.to_batches(
                max_chunksize=len(table) // chunks + 1):
            w.write_batch(batch)
    return sink.getvalue().to_pybytes()


def _stream_bytes(table: pa.Table, compression=None) -> bytes:
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.ipc.new_stream(sink, table.schema, options=opts) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


@pytest.mark.parametrize("comp", [None, "zstd", "lz4"])
@pytest.mark.parametrize("layout", ["file", "stream"])
def test_matches_pyarrow(comp, layout):
    data = (_file_bytes(_T, comp, chunks=3) if layout == "file"
            else _stream_bytes(_T, comp))
    m = arrow_file_meta(data)
    assert m["num_rows"] == 3000
    assert m["field_names"] == _T.column_names
    assert m["is_file"] == (layout == "file")
    for name in _T.column_names:
        assert arrow_read_column(data, name) == \
            _T.column(name).to_pylist(), name


def test_empty_table_and_empty_batches():
    t = pa.table({"v": pa.array([], pa.int64())})
    for data in (_file_bytes(t), _stream_bytes(t)):
        m = arrow_file_meta(data)
        assert m["num_rows"] == 0
        assert arrow_read_column(data, "v") == []


def test_all_null_column():
    t = pa.table({"v": pa.array([None] * 100, pa.int64())})
    data = _file_bytes(t, "zstd")
    assert arrow_read_column(data, "v") == [None] * 100


@pytest.mark.parametrize("comp", [None, "zstd"])
@pytest.mark.parametrize("layout", ["file", "stream"])
def test_dictionary_columns_match_pyarrow(comp, layout):
    t = pa.table({
        "d": pa.array(["a", "b", "a", None, "c"] * 600)
              .dictionary_encode(),
        "di": pa.array([i % 9 for i in range(3000)], pa.int64())
               .dictionary_encode(),
        "plain": pa.array(range(3000), pa.int64()),
    })
    data = (_file_bytes(t, comp) if layout == "file"
            else _stream_bytes(t, comp))
    for col in t.column_names:
        assert arrow_read_column(data, col) == \
            t.column(col).to_pylist(), col


def test_gates_named():
    # nested column
    t = pa.table({"l": pa.array([[1], [2, 3]], pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="gated|no column"):
        arrow_read_column(_file_bytes(t), "l")
    # unknown column
    t = pa.table({"v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="no column"):
        arrow_read_column(_file_bytes(t), "nope")


def test_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="arrow"):
        arrow_file_meta(b"NOTARROW" + b"\x00" * 64)
    good = _file_bytes(pa.table({"v": pa.array(range(100), pa.int64())}))
    for cut in (10, len(good) // 2, len(good) - 3):
        with pytest.raises((ValueError, IndexError)):
            arrow_file_meta(good[:cut])
            arrow_read_column(good[:cut], "v")


@pytest.mark.parametrize("seed", range(15))
def test_corruption_never_crashes(seed):
    base = _file_bytes(
        pa.table({"v": pa.array(range(500), pa.int64()),
                  "s": pa.array([f"x{i}" for i in range(500)])}),
        "zstd")
    r = random.Random(seed)
    for _ in range(60):
        b = bytearray(base)
        b[r.randrange(len(b))] ^= 1 << r.randrange(8)
        for fn in (arrow_file_meta,
                   lambda d: arrow_read_column(d, "v")):
            try:
                fn(bytes(b))
            except (ValueError, IndexError, TypeError, MemoryError,
                    OverflowError):
                pass
            except Exception as e:  # struct.error etc must be wrapped
                import struct as _s

                assert isinstance(e, _s.error), type(e)


# --------------------------------------------------------------------------
# r12 ADVICE regressions: Null-type columns and dictionary corners.


@pytest.mark.parametrize("layout", ["file", "stream"])
def test_null_type_column(layout):
    """A Null column (e.g. pyarrow-inferred from an all-null input)
    carries ZERO buffers — it must materialize as Nones, not derail
    buffer assignment for the rest of the file."""
    t = pa.table({"n": pa.array([None, None, None], pa.null()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    data = _file_bytes(t) if layout == "file" else _stream_bytes(t)
    assert arrow_read_column(data, "n") == [None] * 3
    assert arrow_read_column(data, "v") == [1, 2, 3]


@pytest.mark.parametrize("layout", ["file", "stream"])
def test_zero_row_dictionary_column(layout):
    """An empty dictionary column needs zero index mappings — the
    read returns [] instead of 'dictionary batch missing'."""
    t = pa.table({"d": pa.array([], pa.string()).dictionary_encode(),
                  "v": pa.array([], pa.int64())})
    data = _file_bytes(t) if layout == "file" else _stream_bytes(t)
    assert arrow_read_column(data, "d") == []
    assert arrow_read_column(data, "v") == []


# --------------------------------------------------------------------------
# r12: nested columns (depth-first node/buffer tree).


def _norm_nested(v, typ):
    if v is None:
        return None
    if pa.types.is_map(typ):
        return {k: _norm_nested(x, typ.item_type) for k, x in v}
    if pa.types.is_list(typ) or pa.types.is_large_list(typ) \
            or pa.types.is_fixed_size_list(typ):
        return [_norm_nested(x, typ.value_type) for x in v]
    if pa.types.is_struct(typ):
        return {f.name: _norm_nested(v[f.name], f.type) for f in typ}
    return v


_NESTED = {
    "list": pa.array([[1, None], None, []], pa.list_(pa.int64())),
    "large_list": pa.array([["a"], None, ["b", None]],
                           pa.large_list(pa.string())),
    "fixed_list": pa.array([[1, 2], None, [3, 4]],
                           pa.list_(pa.int64(), 2)),
    "struct": pa.array([{"a": 1, "b": "x"}, None,
                        {"a": None, "b": None}],
                       pa.struct([("a", pa.int64()),
                                  ("b", pa.string())])),
    "map": pa.array([[("k", 1)], [], None],
                    pa.map_(pa.string(), pa.int64())),
    "deep": pa.array(
        [{"tags": ["p", None], "m": [("k", 7)], "s": {"q": [3, None]}},
         None, {"tags": None, "m": [], "s": None}],
        pa.struct([("tags", pa.list_(pa.string())),
                   ("m", pa.map_(pa.string(), pa.int64())),
                   ("s", pa.struct([("q", pa.list_(pa.int64()))]))])),
    "list_of_dict": pa.array(
        [["a", "a", None], ["b"]],
        pa.list_(pa.dictionary(pa.int32(), pa.string()))),
}


@pytest.mark.parametrize("shape", sorted(_NESTED))
@pytest.mark.parametrize("layout", ["file", "stream"])
@pytest.mark.parametrize("comp", [None, "zstd", "lz4"])
def test_nested_matches_pyarrow(shape, layout, comp):
    from google_analytics_to_s3_spark.operators.arrow_ipc import (
        arrow_read_column,
        arrow_read_nested,
    )

    arr = _NESTED[shape]
    t = pa.table({"v": arr,
                  "after": pa.array(range(len(arr)), pa.int64())})
    data = (_file_bytes(t, comp) if layout == "file"
            else _stream_bytes(t, comp))
    typ = t.schema.field("v").type
    want = [_norm_nested(x, typ) for x in t.column("v").to_pylist()]
    assert arrow_read_nested(data, "v") == want
    # the r12 regression: a FLAT column after a nested one must not
    # decode the nested column's buffers (pre-fix code returned wrong
    # values silently)
    assert arrow_read_column(data, "after") == list(range(len(arr)))


def test_nested_arrow_equals_nested_parquet():
    from google_analytics_to_s3_spark.operators.arrow_ipc import (
        arrow_read_nested,
    )
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_nested,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_arrow_nested,
        make_parquet_nested,
    )

    for seed in (0, 1, 2, 3, 4, 17, 999):
        assert arrow_read_nested(make_arrow_nested(seed), "v") == \
            parquet_read_nested(make_parquet_nested(seed), "v")


def test_undecodable_dictionary_quarantines_only_its_column():
    """A dictionary whose VALUE type the reader gates (decimal128
    here) must poison only columns referencing that dictionary id —
    the file's other columns stay readable (ADVICE r12: the whole
    file was quarantined)."""
    import decimal

    import pyarrow as pa

    d = pa.DictionaryArray.from_arrays(
        pa.array([0, None, 1], pa.int32()),
        pa.array([decimal.Decimal("1.5"), decimal.Decimal("2.5")],
                 pa.decimal128(10, 2)))
    t = pa.table({"good": pa.array([1, 2, 3], pa.int64()), "d": d})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, t.schema) as w:
        w.write_table(t)
    data = sink.getvalue().to_pybytes()
    # the good column reads despite the undecodable dictionary
    assert arrow_read_column(data, "good") == [1, 2, 3]
    # the dictionary column itself raises a named error on first use
    with pytest.raises(ValueError, match="gated"):
        arrow_read_column(data, "d")
    # a Null-type dictionary decodes clean (all values None)
    dn = pa.DictionaryArray.from_arrays(
        pa.array([0, None, 1], pa.int32()), pa.array([None, None]))
    tn = pa.table({"d": dn})
    sinkn = pa.BufferOutputStream()
    with pa.ipc.new_file(sinkn, tn.schema) as w:
        w.write_table(tn)
    assert arrow_read_column(sinkn.getvalue().to_pybytes(),
                             "d") == [None, None, None]
    # an ALL-NULL-INDEX dictionary column never needs the values and
    # reads clean
    d2 = pa.array([None, None, None]).dictionary_encode()
    t2 = pa.table({"good": pa.array([7, 8, 9], pa.int64()), "d": d2})
    sink2 = pa.BufferOutputStream()
    with pa.ipc.new_file(sink2, t2.schema) as w:
        w.write_table(t2)
    data2 = sink2.getvalue().to_pybytes()
    assert arrow_read_column(data2, "d") == [None, None, None]
    assert arrow_read_column(data2, "good") == [7, 8, 9]


def test_delta_dictionaries_append(spark_unused=None):
    """pyarrow's stream writer with emit_dictionary_deltas ships
    dictionary growth as isDelta=1 APPEND batches; the reader must
    extend, never replace — pinned against pyarrow's own read."""
    import pyarrow as pa

    from google_analytics_to_s3_spark.testing.fixtures import (
        make_arrow_dict_delta,
    )

    for seed in (0, 1, 2, 5, 12, 999):
        data = make_arrow_dict_delta(seed)
        t = pa.ipc.open_stream(pa.BufferReader(data)).read_all()
        want = [str(v) for v in t["d"].to_pylist()]
        assert arrow_read_column(data, "d") == want, seed
        # at least one delta message actually present
        from google_analytics_to_s3_spark.operators.arrow_ipc import (
            _iter_messages,
        )
        deltas = sum(
            1 for msg, _ in _iter_messages(data)
            if msg.scalar(1, "<B", 0) == 2
            and msg.table(2).scalar(2, "<b", 0))
        assert deltas >= 1


def test_delta_dictionary_without_base_quarantines_column():
    import pyarrow as pa

    from google_analytics_to_s3_spark.testing.fixtures import (
        make_arrow_dict_delta,
    )
    from google_analytics_to_s3_spark.operators.arrow_ipc import (
        _iter_messages,
    )

    data = make_arrow_dict_delta(1)
    # excise the FIRST dictionary message (the base), keeping schema,
    # deltas and record batches — the delta then has no base
    out = bytearray()
    pos = 0
    first_dict_dropped = False
    view = memoryview(data)
    while pos + 8 <= len(data):
        cont = int.from_bytes(view[pos:pos + 4], "little")
        if cont != 0xFFFFFFFF:
            break
        mlen = int.from_bytes(view[pos + 4:pos + 8], "little")
        if mlen == 0:
            out += view[pos:pos + 8]
            pos += 8
            continue
        from google_analytics_to_s3_spark.operators.arrow_ipc import (
            _fb_root,
        )
        msg = _fb_root(data, pos + 8)
        blen = msg.scalar(3, "<q", 0)
        whole = view[pos:pos + 8 + mlen + blen]
        is_base_dict = (msg.scalar(1, "<B", 0) == 2
                        and not msg.table(2).scalar(2, "<b", 0))
        if is_base_dict and not first_dict_dropped:
            first_dict_dropped = True
        else:
            out += whole
        pos += 8 + mlen + blen
    assert first_dict_dropped
    with pytest.raises(ValueError, match="without base|missing"):
        arrow_read_column(bytes(out), "d")
    # the flat column still reads
    import pyarrow as pa2
    assert arrow_read_column(bytes(out), "x") == \
        arrow_read_column(data, "x")
