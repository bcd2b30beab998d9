"""Raw parquet reader (operators/parquet_raw.py).

Cross-validation: every decode inverts files written by
*parquet-cpp* (pyarrow) — including the grading driver's own
``/root/testdata`` tables — across codecs (none/snappy/gzip/zstd,
the snappy and zstd pages going through the engine's OWN byte
decoders), dictionary on/off, multiple row groups, nulls, and every
supported physical type.  The thrift compact walker is additionally
pinned on hand-built byte sequences (long-form field ids, maps,
doubles, nested structs) that parquet footers rarely exercise.
"""

from __future__ import annotations

import glob
import random
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from google_analytics_to_s3_spark.operators.parquet_raw import (
    parquet_file_meta,
    parquet_read_column,
    thrift_compact_struct,
)

from .conftest import SF_SMOKE


def _pq_bytes(table: pa.Table, **kw) -> bytes:
    buf = pa.BufferOutputStream()
    pq.write_table(table, buf, **kw)
    return buf.getvalue().to_pybytes()


# --------------------------------------------------------------------------
# Thrift compact protocol unit pins


def test_thrift_short_and_long_form_fields():
    # field 1: i32 zigzag(5)=10 ; long-form field 100: binary "hi"
    data = bytes([0x15, 10,
                  0x08, 0xC8, 0x01, 2]) + b"hi" + bytes([0x00])
    fields, pos = thrift_compact_struct(data)
    assert fields == {1: 5, 100: b"hi"}
    assert pos == len(data)


def test_thrift_bool_in_type_and_double():
    data = bytes([0x11,        # field 1: BOOL_TRUE
                  0x12,        # field 2: BOOL_FALSE
                  0x17]) + struct.pack("<d", 2.5) + bytes([0x00])
    fields, _ = thrift_compact_struct(data)
    assert fields == {1: True, 2: False, 3: 2.5}


def test_thrift_list_map_nested_struct():
    inner = bytes([0x15, 4, 0x00])          # struct {1: 2}
    data = bytes([0x19, 0x35, 2, 4, 6])     # field 1: list<i32> [1,2,3]
    data += bytes([0x1B, 1, 0x85]) + bytes([1, ord("k")]) + bytes([6])
    #               field 2: map<str,i32> size 1 {'k': 3}
    data += bytes([0x1C]) + inner           # field 3: struct
    data += bytes([0x00])
    fields, _ = thrift_compact_struct(data)
    assert fields[1] == [1, 2, 3]
    assert fields[2] == {b"k": 3}
    assert fields[3] == {1: 2}


def test_thrift_truncation_named():
    with pytest.raises(ValueError, match="thrift"):
        thrift_compact_struct(bytes([0x15]))  # header, no varint
    with pytest.raises(ValueError, match="thrift"):
        thrift_compact_struct(bytes([0x18, 200]))  # binary overrun


# --------------------------------------------------------------------------
# Cross-validation matrix


_TYPED = pa.table({
    "i32": pa.array(range(500), pa.int32()),
    "i64": pa.array([i * 1_000_000_007 for i in range(500)], pa.int64()),
    "f32": pa.array([float(i) for i in range(500)], pa.float32()),
    "f64": pa.array([i * 0.25 for i in range(500)], pa.float64()),
    "b": pa.array([i % 3 == 0 for i in range(500)]),
    "s": pa.array([f"value-{i % 11}" for i in range(500)]),
    "nullable": pa.array([i if i % 4 else None for i in range(500)],
                         pa.int64()),
})


@pytest.mark.parametrize("codec", ["none", "snappy", "gzip", "zstd"])
@pytest.mark.parametrize("use_dict", [True, False])
def test_matrix_matches_pyarrow(codec, use_dict):
    data = _pq_bytes(_TYPED, compression=codec, use_dictionary=use_dict,
                     row_group_size=128)
    meta = parquet_file_meta(data)
    assert meta["num_rows"] == 500
    assert len(meta["row_groups"]) == 4
    for name in _TYPED.column_names:
        mine = parquet_read_column(data, name)
        theirs = _TYPED.column(name).to_pylist()
        if name == "s":
            theirs = [t.encode() for t in theirs]
        if name in ("f32",):
            assert [round(m, 3) for m in mine] == [
                round(t, 3) for t in theirs]
        else:
            assert mine == theirs, name


def test_empty_table():
    t = pa.table({"v": pa.array([], pa.int64())})
    data = _pq_bytes(t)
    meta = parquet_file_meta(data)
    assert meta["num_rows"] == 0
    assert parquet_read_column(data, "v") == []


def test_all_null_column():
    t = pa.table({"v": pa.array([None] * 64, pa.int64())})
    data = _pq_bytes(t, compression="zstd")
    assert parquet_read_column(data, "v") == [None] * 64


# --------------------------------------------------------------------------
# The driver's own files


def test_reads_driver_testdata_metadata_and_values():
    files = sorted(glob.glob(f"{SF_SMOKE}/*.parquet"))
    assert files, SF_SMOKE
    checked_values = 0
    for f in files:
        data = open(f, "rb").read()
        meta = parquet_file_meta(data)
        pf = pq.ParquetFile(f)
        assert meta["num_rows"] == pf.metadata.num_rows, f
        assert len(meta["row_groups"]) == pf.metadata.num_row_groups, f
        table = pf.read()
        for name in table.column_names:
            col = table.column(name)
            if col.type == pa.int64():
                assert parquet_read_column(data, name) == col.to_pylist()
                checked_values += 1
                break
    assert checked_values >= 6


# --------------------------------------------------------------------------
# Gates and corruption


@pytest.mark.parametrize("codec", ["none", "snappy", "gzip", "zstd"])
@pytest.mark.parametrize("use_dict", [True, False])
def test_v2_pages_match_pyarrow(codec, use_dict):
    t = pa.table({
        "v": pa.array([i * 37 - 5000 if i % 6 else None
                       for i in range(3000)], pa.int64()),
        "w": [f"str{i % 9}" for i in range(3000)],
    })
    data = _pq_bytes(t, compression=codec, use_dictionary=use_dict,
                     data_page_version="2.0", row_group_size=700)
    assert parquet_read_column(data, "v") == t.column("v").to_pylist()
    assert parquet_read_column(data, "w") == [
        x.encode() for x in t.column("w").to_pylist()]


def test_delta_binary_packed_matches_pyarrow():
    t = pa.table({"v": pa.array(
        [i * 37 - 5000 if i % 6 else None for i in range(3000)],
        pa.int64())})
    for codec in ("none", "zstd"):
        data = _pq_bytes(t, compression=codec, use_dictionary=False,
                         data_page_version="2.0",
                         column_encoding={"v": "DELTA_BINARY_PACKED"})
        assert parquet_read_column(data, "v") == t.column("v").to_pylist()
    t32 = pa.table({"v": pa.array(range(100000), pa.int32())})
    data = _pq_bytes(t32, use_dictionary=False, data_page_version="2.0",
                     column_encoding={"v": "DELTA_BINARY_PACKED"})
    assert parquet_read_column(data, "v") == list(range(100000))


@pytest.mark.parametrize(
    "enc", ["DELTA_LENGTH_BYTE_ARRAY", "DELTA_BYTE_ARRAY"])
def test_delta_string_encodings_match_pyarrow(enc):
    strs = [f"prefix-common/{i % 17}/suffix-{i}" if i % 5 else None
            for i in range(3000)]
    t = pa.table({"w": pa.array(strs, pa.string())})
    for codec in ("none", "zstd"):
        data = _pq_bytes(t, use_dictionary=False,
                         data_page_version="2.0", compression=codec,
                         column_encoding={"w": enc})
        assert parquet_read_column(data, "w") == [
            s.encode() if s is not None else None for s in strs]


def test_byte_stream_split_matches_pyarrow():
    t = pa.table({
        "f": pa.array([i * 0.37 for i in range(5000)], pa.float64()),
        "g": pa.array([float(i) for i in range(5000)], pa.float32()),
    })
    for codec in ("none", "zstd"):
        data = _pq_bytes(
            t, use_dictionary=False, data_page_version="2.0",
            compression=codec,
            column_encoding={"f": "BYTE_STREAM_SPLIT",
                             "g": "BYTE_STREAM_SPLIT"})
        assert parquet_read_column(data, "f") == t.column("f").to_pylist()
        assert parquet_read_column(data, "g") == t.column("g").to_pylist()


def test_nested_column_gated():
    t = pa.table({"v": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    data = _pq_bytes(t)
    with pytest.raises(ValueError, match="gated|no column"):
        parquet_read_column(data, "v")


def test_unknown_column_named():
    data = _pq_bytes(pa.table({"v": pa.array(range(3), pa.int64())}))
    with pytest.raises(ValueError, match="no column"):
        parquet_read_column(data, "nope")


def test_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        parquet_file_meta(b"PAR1shortPAR2")
    data = _pq_bytes(pa.table({"v": pa.array(range(100), pa.int64())}))
    with pytest.raises((ValueError, IndexError)):
        parquet_file_meta(data[: len(data) // 2] + data[-8:])


@pytest.mark.parametrize("seed", range(25))
def test_corruption_never_crashes(seed):
    base = _pq_bytes(
        pa.table({"v": pa.array(range(200), pa.int64()),
                  "w": pa.array([f"x{i % 5}" for i in range(200)])}),
        compression="snappy", row_group_size=64)
    r = random.Random(seed)
    for _ in range(60):
        b = bytearray(base)
        b[r.randrange(len(b))] ^= 1 << r.randrange(8)
        for fn in (parquet_file_meta,
                   lambda d: parquet_read_column(d, "v")):
            try:
                fn(bytes(b))
            except (ValueError, IndexError):
                pass
    # zlib.error / struct.error must have been converted to named
    # ValueErrors by the operator — anything else fails the test
    assert zlib is not None


# --------------------------------------------------------------------------
# One-level list columns (Dremel assembly)


def _mk_lists(n=3000, seed=5):
    r = random.Random(seed)
    lists = []
    for _ in range(n):
        k = r.randrange(6)
        if k == 0:
            lists.append(None)
        elif k == 1:
            lists.append([])
        else:
            lists.append([None if r.random() < 0.2
                          else r.randrange(-1000, 1000)
                          for _ in range(r.randrange(1, 6))])
    return lists


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd"])
@pytest.mark.parametrize("ver", ["1.0", "2.0"])
def test_list_column_matches_pyarrow(codec, ver):
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_list_column,
    )

    lists = _mk_lists()
    t = pa.table({"v": pa.array(lists, pa.list_(pa.int64()))})
    for dic in (True, False):
        data = _pq_bytes(t, compression=codec, use_dictionary=dic,
                         data_page_version=ver, row_group_size=700)
        assert parquet_read_list_column(data, "v") == lists


def test_list_of_strings_and_gates():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_list_column,
    )

    slists = [None if i % 7 == 0 else [f"x{j}" for j in range(i % 4)]
              for i in range(1000)]
    t = pa.table({"v": pa.array(slists, pa.list_(pa.string()))})
    data = _pq_bytes(t, compression="zstd")
    assert parquet_read_list_column(data, "v") == [
        None if x is None else [s.encode() for s in x] for x in slists]
    # flat column is not a list
    flat = _pq_bytes(pa.table({"v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="not a list"):
        parquet_read_list_column(flat, "v")
    # multi-level nesting stays gated
    nested = pa.table({"v": pa.array([[[1]], [[2, 3]]],
                                     pa.list_(pa.list_(pa.int64())))})
    with pytest.raises(ValueError, match="gated"):
        parquet_read_list_column(_pq_bytes(nested), "v")


def test_fixed_len_byte_array_matches_pyarrow():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_column,
    )

    t = pa.table({"u": pa.array(
        [bytes([i % 256] * 12) if i % 4 else None for i in range(500)],
        pa.binary(12))})
    for codec in ("none", "zstd"):
        for dic in (True, False):
            data = _pq_bytes(t, compression=codec, use_dictionary=dic)
            assert parquet_read_column(data, "u") == \
                t.column("u").to_pylist()


# --------------------------------------------------------------------------
# General Dremel assembly (r12): arbitrary nesting vs parquet-cpp.


def _norm(v, typ):
    """pyarrow's to_pylist → the assembler's representation (maps as
    dicts, everything else structural)."""
    if v is None:
        return None
    if pa.types.is_map(typ):
        return {k: _norm(x, typ.item_type) for k, x in v}
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return [_norm(x, typ.value_type) for x in v]
    if pa.types.is_struct(typ):
        return {f.name: _norm(v[f.name], f.type) for f in typ}
    return v


def _assert_nested_matches(table: pa.Table, **kw):
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_nested,
    )

    data = _pq_bytes(table, **kw)
    typ = table.schema.field("v").type
    want = [_norm(x, typ) for x in table.column("v").to_pylist()]
    assert parquet_read_nested(data, "v") == want


_NESTED_SHAPES = {
    "struct": pa.array(
        [{"a": 1, "b": "x"}, None, {"a": None, "b": "y"},
         {"a": 4, "b": None}],
        pa.struct([("a", pa.int64()), ("b", pa.string())])),
    "list_of_list": pa.array(
        [[[1, 2], [3]], None, [[], None, [4, None]], []],
        pa.list_(pa.list_(pa.int64()))),
    "list_of_struct": pa.array(
        [[{"x": 1, "y": None}, {"x": 2, "y": 5}], [], None,
         [{"x": None, "y": 9}]],
        pa.list_(pa.struct([("x", pa.int64()), ("y", pa.int64())]))),
    "map": pa.array(
        [[("a", 1), ("b", 2)], [], None, [("c", None)]],
        pa.map_(pa.string(), pa.int64())),
    "struct_of_everything": pa.array(
        [{"tags": ["p", None], "m": [("k", 7)], "s": {"q": 3}},
         {"tags": None, "m": [], "s": None},
         None,
         {"tags": [], "m": [("a", 1), ("b", None)], "s": {"q": None}}],
        pa.struct([("tags", pa.list_(pa.string())),
                   ("m", pa.map_(pa.string(), pa.int64())),
                   ("s", pa.struct([("q", pa.int64())]))])),
    "list3": pa.array(
        [[[["d"]], [["e", None], []]], None, [[]], [None]],
        pa.list_(pa.list_(pa.list_(pa.string())))),
    "map_of_list": pa.array(
        [[("a", [1, None])], None, [("b", []), ("c", [2, 3])]],
        pa.map_(pa.string(), pa.list_(pa.int64()))),
}


@pytest.mark.parametrize("shape", sorted(_NESTED_SHAPES))
def test_nested_assembly_matches_pyarrow(shape):
    t = pa.table({"v": _NESTED_SHAPES[shape]})
    for kw in (dict(), dict(compression="zstd"),
               dict(data_page_version="2.0", compression="snappy"),
               dict(use_dictionary=False), dict(row_group_size=2)):
        _assert_nested_matches(t, **kw)


def test_nested_assembly_randomized_vs_pyarrow():
    """Property-style: random nested rows (deterministic seed) over a
    struct{list<string>, map, list<struct>} shape, every codec/page
    combination, multiple row groups — exact match vs parquet-cpp."""
    rng = random.Random(7)
    typ = pa.struct([
        ("a", pa.int64()),
        ("tags", pa.list_(pa.string())),
        ("pts", pa.list_(pa.struct([("x", pa.int64()),
                                    ("y", pa.int64())]))),
        ("m", pa.map_(pa.string(), pa.int64())),
    ])
    rows = []
    for i in range(400):
        if rng.random() < 0.1:
            rows.append(None)
            continue
        rows.append({
            "a": None if rng.random() < 0.2 else rng.randrange(10**6),
            "tags": None if rng.random() < 0.15 else [
                None if rng.random() < 0.2 else
                "s%d" % rng.randrange(50)
                for _ in range(rng.randrange(4))],
            "pts": [{"x": rng.randrange(1000),
                     "y": None if rng.random() < 0.3
                     else rng.randrange(100)}
                    for _ in range(rng.randrange(3))],
            "m": [("k%d" % k, None if rng.random() < 0.2
                   else rng.randrange(300))
                  for k in range(rng.randrange(3))],
        })
    t = pa.table({"v": pa.array(rows, typ)})
    for kw in (dict(compression="zstd"),
               dict(data_page_version="2.0", row_group_size=64),
               dict(use_dictionary=False, compression="snappy")):
        _assert_nested_matches(t, **kw)


def test_nested_fixture_exact_match():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_nested,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_parquet_nested,
    )

    for seed in (0, 1, 2, 3, 4, 5, 30, 77, 999):
        data = make_parquet_nested(seed)
        t = pq.read_table(pa.BufferReader(data))
        typ = t.schema.field("v").type
        want = [_norm(x, typ) for x in t.column("v").to_pylist()]
        assert parquet_read_nested(data, "v") == want


@pytest.mark.parametrize("comp", ["none", "snappy", "zstd", "lz4",
                                  "gzip"])
def test_int96_timestamps_match_pyarrow(comp):
    """Legacy Hive/Spark INT96 timestamps (Julian day + SIGNED
    nanos-of-day) decode to int64 ns since the Unix epoch — gate
    opened r12, cross-validated against parquet-cpp's own read-back
    incl. pre-1970 values and LZ4_RAW pages."""
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_column,
        parquet_read_nested,
    )

    ts_vals = [1577882096_789_000_123, -1_000_000_000, 0,
               1420070400_000_000_000, -(10**15) + 123,
               86_399_999_999_999, None]
    t = pa.table({"v": pa.array(ts_vals, pa.timestamp("ns"))})
    for dic in (True, False):
        data = _pq_bytes(t, use_deprecated_int96_timestamps=True,
                         compression=comp, use_dictionary=dic)
        want = pq.read_table(pa.BufferReader(data)) \
            .column("v").cast(pa.int64()).to_pylist()
        assert parquet_read_column(data, "v") == want
        assert parquet_read_nested(data, "v") == want


def test_lz4_raw_pages_match_pyarrow():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_column,
    )

    t = pa.table({
        "v": pa.array(list(range(5000)) + [None] * 50, pa.int64()),
        "s": pa.array([f"x{i % 97}" for i in range(5050)], pa.string()),
    })
    data = _pq_bytes(t, compression="lz4")
    assert parquet_read_column(data, "v") == t.column("v").to_pylist()
    assert parquet_read_column(data, "s") == \
        [x.encode() for x in t.column("s").to_pylist()]


def test_nested_unknown_column_named():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_nested,
    )

    t = pa.table({"v": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="no column"):
        parquet_read_nested(_pq_bytes(t), "nope")


def test_nested_flat_column_degenerates_to_values():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_nested,
    )

    t = pa.table({"v": pa.array([1, None, 3], pa.int64())})
    assert parquet_read_nested(_pq_bytes(t), "v") == [1, None, 3]


# --------------------------------------------------------------------------
# r12: page indexes + index-driven range scan.


@pytest.mark.parametrize("comp", ["none", "snappy", "zstd"])
@pytest.mark.parametrize("dic", [False, True])
def test_page_index_range_scan(comp, dic):
    """ColumnIndex min/max prunes pages, OffsetIndex seeks to the
    survivors; results equal the brute filter and most pages never
    decode."""
    import random

    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_int_range,
    )

    rng = random.Random(3)
    vals = sorted(rng.randrange(0, 10**9) for _ in range(100000))
    col = [None if rng.random() < 0.02 else v for v in vals]
    t = pa.table({"v": pa.array(col, pa.int64())})
    data = _pq_bytes(t, write_page_index=True, data_page_size=8192,
                     row_group_size=40000, compression=comp,
                     use_dictionary=dic)
    lo, hi = 3 * 10**8, 4 * 10**8
    r = parquet_read_int_range(data, "v", lo, hi)
    want = [v for v in col if v is not None and lo <= v <= hi]
    assert r["n_match"] == len(want)
    assert r["value_sum"] == sum(want)
    assert 0 < r["pages_read"] < r["pages_total"]
    # an empty range prunes EVERY page
    r0 = parquet_read_int_range(data, "v", -10, -1)
    assert r0["n_match"] == 0 and r0["pages_read"] == 0


def test_page_index_absent_named():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_page_index,
    )

    t = pa.table({"v": pa.array(range(100), pa.int64())})
    with pytest.raises(ValueError, match="page index absent"):
        parquet_page_index(_pq_bytes(t), "v")


def test_page_prune_fixture_inverts():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_int_range,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_parquet_paged,
    )

    for seed in (0, 1, 2, 5, 999):
        data = make_parquet_paged(seed)
        lo = (seed % 10) * 74000
        hi = lo + 111000
        r = parquet_read_int_range(data, "v", lo, hi)
        want = [37 * i + seed % 37 for i in range(20000)
                if (seed + i) % 53 != 0
                and lo <= 37 * i + seed % 37 <= hi]
        assert r["n_match"] == len(want)
        assert r["value_sum"] == sum(want)
        assert r["pages_read"] < r["pages_total"] // 2
