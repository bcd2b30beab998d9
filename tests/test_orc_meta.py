"""ORC metadata reader (operators/orc_meta.py).

Cross-validation against the Apache ORC C++ writer/reader (pyarrow):
postscript, chunked-compression framing (zlib/snappy/lz4/zstd through
the engine's own byte decoders), footer protobuf, stripes, type tree,
signed IntegerStatistics.
"""

from __future__ import annotations

import io
import random

import pyarrow as pa
import pytest
from pyarrow import orc

from google_analytics_to_s3_spark.operators.orc_meta import (
    parse_orc_meta,
    pb_message,
)

_COMPS = ["uncompressed", "zlib", "snappy", "lz4", "zstd"]


def _orc_bytes(table: pa.Table, **kw) -> bytes:
    buf = pa.BufferOutputStream()
    orc.write_table(table, buf, **kw)
    return buf.getvalue().to_pybytes()


# --------------------------------------------------------------------------
# protobuf wire reader pins


def test_pb_message_wire_types():
    raw = bytes([0x08, 150, 1])          # field 1 varint 150
    raw += bytes([0x11]) + (7).to_bytes(8, "little")   # field 2 fixed64
    raw += bytes([0x1D]) + (9).to_bytes(4, "little")   # field 3 fixed32
    raw += bytes([0x22, 3]) + b"abc"     # field 4 bytes
    raw += bytes([0x08, 1])              # field 1 again (repeated)
    fields = pb_message(raw)
    assert fields == {1: [150, 1], 2: [7], 3: [9], 4: [b"abc"]}


def test_pb_message_truncation_named():
    with pytest.raises(ValueError, match="orc"):
        pb_message(bytes([0x08]))
    with pytest.raises(ValueError, match="orc"):
        pb_message(bytes([0x22, 200, 1]))
    with pytest.raises(ValueError, match="wire type"):
        pb_message(bytes([0x0B]))  # deprecated group type


# --------------------------------------------------------------------------
# Cross-validation matrix


@pytest.mark.parametrize("comp", _COMPS)
def test_meta_matches_pyarrow(comp):
    t = pa.table({
        "v": pa.array([i * 7 - 50 for i in range(5000)], pa.int64()),
        "w": [f"s{i % 5}" for i in range(5000)],
        "f": pa.array([i * 0.5 for i in range(5000)], pa.float64()),
    })
    data = _orc_bytes(t, compression=comp)
    m = parse_orc_meta(data)
    f = orc.ORCFile(io.BytesIO(data))
    assert m["num_rows"] == f.nrows == 5000
    assert len(m["stripes"]) == f.nstripes
    assert sum(s["num_rows"] for s in m["stripes"]) == 5000
    assert m["compression_name"] == str(f.compression).upper().replace(
        "UNCOMPRESSED", "NONE")
    # type tree: struct root + 3 children
    assert len(m["types"]) == 4
    assert m["types"][0]["subtypes"] == [1, 2, 3]
    assert m["types"][0]["field_names"] == ["v", "w", "f"]
    ints = next(s for s in m["statistics"] if s["int_min"] is not None)
    assert ints["int_min"] == -50
    assert ints["int_max"] == 4999 * 7 - 50
    assert ints["int_sum"] == sum(i * 7 - 50 for i in range(5000))


def test_multi_stripe_layout():
    t = pa.table({"v": pa.array(range(50000), pa.int64())})
    data = _orc_bytes(t, compression="uncompressed", stripe_size=4096)
    m = parse_orc_meta(data)
    f = orc.ORCFile(io.BytesIO(data))
    assert f.nstripes > 1
    assert len(m["stripes"]) == f.nstripes
    assert sum(s["num_rows"] for s in m["stripes"]) == 50000
    # stripes tile the content region in order
    offs = [s["offset"] for s in m["stripes"]]
    assert offs == sorted(offs)


def test_negative_sint_statistics_zigzag():
    t = pa.table({"v": pa.array([-1000000, 5, -3], pa.int64())})
    m = parse_orc_meta(_orc_bytes(t, compression="zstd"))
    ints = next(s for s in m["statistics"] if s["int_min"] is not None)
    assert ints["int_min"] == -1000000
    assert ints["int_max"] == 5
    assert ints["int_sum"] == -999998


def test_empty_table():
    t = pa.table({"v": pa.array([], pa.int64())})
    m = parse_orc_meta(_orc_bytes(t))
    assert m["num_rows"] == 0
    assert m["stripes"] == []


# --------------------------------------------------------------------------
# Corruption discipline


def test_bad_magic_and_postscript():
    with pytest.raises(ValueError, match="magic"):
        parse_orc_meta(b"NOPE" + b"\x00" * 64)
    good = _orc_bytes(pa.table({"v": pa.array(range(10), pa.int64())}))
    with pytest.raises((ValueError, IndexError)):
        parse_orc_meta(good[:-1] + b"\xff")  # absurd postscript length


@pytest.mark.parametrize("seed", range(20))
def test_corruption_never_crashes(seed):
    base = _orc_bytes(
        pa.table({"v": pa.array(range(2000), pa.int64()),
                  "w": [f"x{i % 9}" for i in range(2000)]}),
        compression="snappy")
    r = random.Random(seed)
    for _ in range(60):
        b = bytearray(base)
        b[r.randrange(len(b))] ^= 1 << r.randrange(8)
        try:
            parse_orc_meta(bytes(b))
        except (ValueError, IndexError, TypeError):
            pass


# --------------------------------------------------------------------------
# RLEv2 column materialization (cross-validated per data shape)


_SHAPES = {
    "monotonic_delta": list(range(5000)),
    "constant_short_repeat": [42] * 5000,
    "random_direct": [(i * 2654435761) % 100000 - 50000
                      for i in range(5000)],
    "outliers_patched_base": [((i * 37) % 100)
                              + (10**9 if i % 97 == 0 else 0)
                              for i in range(5000)],
    "negative_run": [-7] * 1000 + list(range(-500, 500)),
    "with_nulls_present_stream": [i * 3 - 100 if i % 5 else None
                                  for i in range(5000)],
    "descending_delta": list(range(10000, 0, -1)),
    "tiny_widths": [random.Random(i).randrange(0, 8)
                    for i in range(5000)],
}


@pytest.mark.parametrize("shape", sorted(_SHAPES))
@pytest.mark.parametrize("comp", _COMPS)
def test_int_column_matches_pyarrow(shape, comp):
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_column,
    )

    vals = _SHAPES[shape]
    t = pa.table({"v": pa.array(vals, pa.int64())})
    data = _orc_bytes(t, compression=comp)
    assert orc_read_int_column(data, "v") == vals


def test_int_column_multi_stripe():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_column,
    )

    vals = list(range(60000))
    data = _orc_bytes(pa.table({"v": pa.array(vals, pa.int64())}),
                      compression="uncompressed", stripe_size=4096)
    assert orc_read_int_column(data, "v") == vals


def test_int_column_big_values_and_dense_patches():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_column,
    )

    big = [random.Random(i).randrange(-2**62, 2**62) for i in range(3000)]
    dense = [random.Random(i).randrange(100)
             + (2**40 if random.Random(i * 7).random() < 0.08 else 0)
             for i in range(20000)]
    for vals in (big, dense):
        data = _orc_bytes(pa.table({"v": pa.array(vals, pa.int64())}),
                          compression="zstd")
        assert orc_read_int_column(data, "v") == vals


def test_non_int_column_gated():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_column,
    )

    data = _orc_bytes(pa.table({"w": pa.array(["a", "b"])}))
    with pytest.raises(ValueError, match="non-integer"):
        orc_read_int_column(data, "w")
    with pytest.raises(ValueError, match="no column"):
        orc_read_int_column(data, "nope")


_STR_SHAPES = {
    "few_distinct": [f"cat{i % 7}" for i in range(5000)],
    "unique": [f"id-{i:06d}" for i in range(5000)],
    "with_nulls": [f"v{i % 13}" if i % 4 else None for i in range(5000)],
    "unicode": [["один", "δύο", "三", "チカ", "é"][i % 5]
                for i in range(3000)],
    "empty_strings": ["" if i % 3 else "x" * i for i in range(900)],
}


@pytest.mark.parametrize("shape", sorted(_STR_SHAPES))
@pytest.mark.parametrize("thr", [0.0, 1.0])  # direct vs dictionary
def test_string_column_matches_pyarrow(shape, thr):
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_string_column,
    )

    vals = _STR_SHAPES[shape]
    t = pa.table({"w": pa.array(vals, pa.string())})
    for comp in ("uncompressed", "zstd"):
        data = _orc_bytes(t, compression=comp,
                          dictionary_key_size_threshold=thr)
        assert orc_read_string_column(data, "w") == vals


def test_string_column_gates():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_string_column,
    )

    data = _orc_bytes(pa.table({"v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="non-string"):
        orc_read_string_column(data, "v")


def test_date_and_bool_columns_match_pyarrow():
    import datetime

    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_column,
    )

    dates = [datetime.date(2020, 1, 1) + datetime.timedelta(days=i * 3)
             if i % 5 else None for i in range(2000)]
    bools = [bool(i % 3 == 0) if i % 7 else None for i in range(2000)]
    t = pa.table({"d": pa.array(dates, pa.date32()),
                  "b": pa.array(bools, pa.bool_())})
    epoch = datetime.date(1970, 1, 1)
    for comp in ("uncompressed", "zstd"):
        raw = _orc_bytes(t, compression=comp)
        assert orc_read_int_column(raw, "d") == [
            None if d is None else (d - epoch).days for d in dates]
        assert orc_read_int_column(raw, "b") == bools


# --------------------------------------------------------------------------
# r12: TIMESTAMP + DECIMAL columns, and the closestFixedBits
# PATCHED_BASE regression.


def _ts_dec_table(n=400, seed=3, tz=None):
    import decimal
    import random

    rng = random.Random(seed)
    ts_vals, dec_vals = [], []
    for _ in range(n):
        if rng.random() < 0.15:
            ts_vals.append(None)
            dec_vals.append(None)
            continue
        base = rng.choice([0, 1_000_000_000, 1420070400, 1577836800,
                           999999999, -1, -1420070400, -999999999])
        nanos = rng.choice([0, 1, 10, 100, 1000, 123000000,
                            987654321, 500_000_000])
        ts_vals.append(base * 1_000_000_000
                       + (nanos if base >= 0 else -nanos))
        dec_vals.append(
            decimal.Decimal(rng.randrange(-10**9, 10**9)) / 100)
    return pa.table({
        "ts": pa.array(ts_vals, pa.timestamp("ns", tz=tz)),
        "d": pa.array(dec_vals, pa.decimal128(12, 2)),
    })


@pytest.mark.parametrize("codec", ["UNCOMPRESSED", "ZLIB", "SNAPPY",
                                   "ZSTD", "LZ4"])
def test_timestamp_decimal_match_orc_cpp(codec):
    """Raw-stream timestamp/decimal reads == the ORC C++ library's
    own read-back, across codecs, nulls, multi-stripe, pre/post-2015
    and pre-1970 values (signed nanoseconds)."""
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_decimal_column,
        orc_read_timestamp_column,
    )

    t = _ts_dec_table()
    buf = pa.BufferOutputStream()
    orc.write_table(t, buf, compression=codec, stripe_size=4096)
    data = buf.getvalue().to_pybytes()
    assert orc_read_timestamp_column(data, "ts") == \
        t.column("ts").cast(pa.int64()).to_pylist()
    want_d = [None if v is None else int(v.scaleb(2))
              for v in t.column("d").to_pylist()]
    assert orc_read_decimal_column(data, "d") == want_d


def test_timestamp_instant_kind18():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_timestamp_column,
    )

    t = _ts_dec_table(tz="UTC")
    buf = pa.BufferOutputStream()
    orc.write_table(t, buf, compression="ZSTD")
    data = buf.getvalue().to_pybytes()
    assert orc_read_timestamp_column(data, "ts") == \
        t.column("ts").cast(pa.int64()).to_pylist()


def test_patched_base_closest_fixed_bits():
    """Regression for the r12 fix: PATCHED_BASE entries whose
    gap+patch width falls BETWEEN the RLE width-table entries (e.g.
    33 → 40) misaligned the patch list — mixed-magnitude nanosecond
    streams are exactly the trigger."""
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_column,
    )

    # small values with rare ~2^25 outliers force PATCHED_BASE whose
    # gap+patch width is off the table (verified: the pre-fix raw
    # pgw+pw read decodes this WRONG, the closestFixedBits read is
    # exact)
    rng = random.Random(2)
    vals = [rng.randrange(0, 16) for _ in range(250)]
    for i in (5, 99, 200):
        vals[i] = (1 << 25) + 12345
    t = pa.table({"v": pa.array(vals, pa.int64())})
    buf = pa.BufferOutputStream()
    orc.write_table(t, buf, compression="UNCOMPRESSED")
    data = buf.getvalue().to_pybytes()
    assert orc_read_int_column(data, "v") == vals


def test_orc_ts_dec_fixture_inverts():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_decimal_column,
        orc_read_timestamp_column,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_orc_ts_dec,
    )

    nanos_menu = (0, 1, 1000, 123000000, 987654321)
    for seed in (0, 1, 2, 3, 17, 999):
        data = make_orc_ts_dec(seed)
        ts = orc_read_timestamp_column(data, "ts")
        dec = orc_read_decimal_column(data, "d")
        for i in range(50 + seed % 100):
            if (seed + i) % 9 == 8:
                assert ts[i] is None and dec[i] is None
            else:
                sec = 1400000000 + (seed * 13 + 7 * i) % 500000000
                assert ts[i] == sec * 10**9 \
                    + nanos_menu[(seed + 3 * i) % 5]
                assert dec[i] == (seed * 7 + 11 * i) % 2000000 - 1000000


def test_timestamp_decimal_gates():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_decimal_column,
        orc_read_timestamp_column,
    )

    t = pa.table({"v": pa.array([1, 2], pa.int64())})
    buf = pa.BufferOutputStream()
    orc.write_table(t, buf)
    data = buf.getvalue().to_pybytes()
    with pytest.raises(ValueError, match="gated"):
        orc_read_timestamp_column(data, "v")
    with pytest.raises(ValueError, match="gated"):
        orc_read_decimal_column(data, "v")
    with pytest.raises(ValueError, match="no column"):
        orc_read_timestamp_column(data, "nope")


@pytest.mark.parametrize("codec", ["UNCOMPRESSED", "ZLIB", "SNAPPY",
                                   "ZSTD", "LZ4"])
def test_nested_columns_match_orc_cpp(codec):
    """Recursive column-tree materializer (struct/list/map at any
    depth) == the ORC C++ library's own read-back."""
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_nested_column,
    )

    def _norm(v, typ):
        if v is None:
            return None
        if pa.types.is_map(typ):
            return {k: _norm(x, typ.item_type) for k, x in v}
        if pa.types.is_list(typ):
            return [_norm(x, typ.value_type) for x in v]
        if pa.types.is_struct(typ):
            return {f.name: _norm(v[f.name], f.type) for f in typ}
        return v

    shapes = {
        "list3": pa.array([[[["d"]], [["e", None], []]], None, [[]],
                           [None]],
                          pa.list_(pa.list_(pa.list_(pa.string())))),
        "map_of_list": pa.array(
            [[("a", [1, None])], None, [("b", []), ("c", [2, 3])]],
            pa.map_(pa.string(), pa.list_(pa.int64()))),
        "struct_deep": pa.array(
            [{"s": {"q": [True, None]}, "d": 1.5},
             None, {"s": None, "d": None}],
            pa.struct([("s", pa.struct([("q", pa.list_(pa.bool_()))])),
                       ("d", pa.float64())])),
    }
    for name, arr in shapes.items():
        t = pa.table({"v": arr})
        buf = pa.BufferOutputStream()
        orc.write_table(t, buf, compression=codec, stripe_size=4096)
        data = buf.getvalue().to_pybytes()
        want = [_norm(x, t.schema.field("v").type)
                for x in t.column("v").to_pylist()]
        assert orc_read_nested_column(data, "v") == want, (name, codec)


def test_nested_orc_equals_nested_parquet():
    """The SAME planted rows through two independent byte paths land
    on identical Python records — the strongest cross-format pin."""
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_nested_column,
    )
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_nested,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_orc_nested,
        make_parquet_nested,
    )

    for seed in (0, 1, 2, 3, 4, 17, 999):
        assert orc_read_nested_column(make_orc_nested(seed), "v") == \
            parquet_read_nested(make_parquet_nested(seed), "v")


def test_nested_orc_gates():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_nested_column,
    )

    t = pa.table({"v": pa.array([1], pa.timestamp("ns"))})
    buf = pa.BufferOutputStream()
    orc.write_table(t, buf)
    with pytest.raises(ValueError, match="gated"):
        orc_read_nested_column(buf.getvalue().to_pybytes(), "v")
    with pytest.raises(ValueError, match="no column"):
        orc_read_nested_column(buf.getvalue().to_pybytes(), "nope")


def test_writer_timezone_conversion_pinned_vs_spark(spark):
    """Non-UTC writerTimezone (r13): PRC (constant +8) reads back
    unchanged, EET (DST) shifts summer instants by +3600 s — the
    Java ORC reader's conversion rule, pinned here against Spark's
    OWN JVM ORC reader on the same patched bytes."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_timestamp_column,
    )
    from google_analytics_to_s3_spark.testing.fixtures import make_orc_tz

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        for seed in (0, 1, 2, 3, 7, 12):  # seeds 0,3,12: PRC; rest EET
            data = make_orc_tz(seed)
            path = tempfile.mktemp(suffix=".orc")
            try:
                with open(path, "wb") as fh:
                    fh.write(data)
                df = spark.read.orc(path)
                jvm = [
                    None if r["us"] is None else r["us"] * 1000
                    for r in df.select(
                        (F.unix_timestamp("ts").cast("long") * 1000000
                         + (F.col("ts").cast("decimal(30,6)") * 1000000
                            % 1000000).cast("long")).alias("us")
                    ).collect()
                ]
            finally:
                if os.path.exists(path):
                    os.unlink(path)
            ours = orc_read_timestamp_column(data, "ts")
            assert ours == jvm, seed
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_writer_timezone_unknown_zone_named_error():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_timestamp_column,
        parse_orc_meta,
    )
    from google_analytics_to_s3_spark.testing.fixtures import make_orc_tz

    data = bytearray(make_orc_tz(1))
    meta = parse_orc_meta(bytes(data))
    st = meta["stripes"][0]
    lo = (st["offset"] + (st["index_length"] or 0)
          + (st["data_length"] or 0))
    seg = bytes(data[lo:lo + st["footer_length"]])
    k = seg.find(b"EET")
    assert k >= 0
    data[lo + k:lo + k + 3] = b"XXB"
    with pytest.raises(ValueError, match="timezone"):
        orc_read_timestamp_column(bytes(data), "ts")


def test_union_columns_match_orc_cpp():
    """UNION columns (kind 13): the byte-RLE tag stream routes rows
    between dense child slots — pinned against pyarrow's own read of
    the same bytes across codecs."""
    import pyarrow as pa
    from pyarrow import orc as pa_orc

    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_nested_column,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_orc_union,
    )

    for seed in (0, 1, 2, 3, 5, 12, 999):
        data = make_orc_union(seed)
        rb = pa_orc.ORCFile(pa.BufferReader(data)).read()["u"]
        got = orc_read_nested_column(data, "u")
        n = 60 + seed % 40
        tags = [(seed + 3 * i) % 2 for i in range(n)]
        want = [(t, rb.to_pylist()[i]) for i, t in enumerate(tags)]
        assert got == want, seed
