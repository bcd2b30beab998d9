"""From-scratch parquet writer (operators/parquet_write.py) —
cross-validated against parquet-cpp (pyarrow), DuckDB, and the
engine's own reader."""

from __future__ import annotations

import io
import os
import tempfile

import pytest

from google_analytics_to_s3_spark.operators.parquet_raw import (
    parquet_read_column,
)
from google_analytics_to_s3_spark.operators.parquet_write import (
    write_parquet,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    parquet_rt_codec,
    parquet_rt_columns,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7, 29, 999])
@pytest.mark.parametrize("codec", ["uncompressed", "snappy"])
@pytest.mark.parametrize("rgs", [None, 25])
def test_three_readers_agree(seed, codec, rgs):
    import pyarrow.parquet as pq

    cols = parquet_rt_columns(seed)
    blob = write_parquet(cols, codec=codec, row_group_size=rgs)
    t = pq.read_table(io.BytesIO(blob))
    assert t.num_rows == len(cols[0][2])
    for name, _typ, vals in cols:
        assert t.column(name).to_pylist() == vals
    assert parquet_read_column(blob, "id") == cols[0][2]


def test_duckdb_reads_and_stats_prune():
    import pyarrow.parquet as pq

    cols = parquet_rt_columns(3)
    blob = write_parquet(cols, codec=parquet_rt_codec(3),
                         row_group_size=25)
    with tempfile.NamedTemporaryFile(suffix=".parquet",
                                     delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        import duckdb

        r = duckdb.sql(
            f"SELECT count(*), sum(id) FROM read_parquet('{path}')"
        ).fetchall()
        ids = cols[0][2]
        assert r[0][0] == len(ids)
        assert r[0][1] == sum(v for v in ids if v is not None)
    finally:
        os.unlink(path)
    # statistics survive a foreign metadata read
    md = pq.read_metadata(io.BytesIO(blob))
    col0 = md.row_group(0).column(0)
    window = cols[0][2][:25]
    present = [v for v in window if v is not None]
    assert col0.statistics.min == min(present)
    assert col0.statistics.max == max(present)
    assert col0.statistics.null_count == window.count(None)


def test_all_null_and_empty_columns():
    import pyarrow.parquet as pq

    blob = write_parquet([("id", "int64", [None, None, None]),
                          ("s", "string", ["a", None, "bc"])])
    t = pq.read_table(io.BytesIO(blob))
    assert t.column("id").to_pylist() == [None, None, None]
    assert t.column("s").to_pylist() == ["a", None, "bc"]
    empty = write_parquet([("id", "int64", [])])
    t2 = pq.read_table(io.BytesIO(empty))
    assert t2.num_rows == 0


def test_writer_gates_named():
    with pytest.raises(ValueError, match="gated"):
        write_parquet([("id", "int96", [1])])
    with pytest.raises(ValueError, match="gated"):
        write_parquet([("id", "int64", [1])], codec="brotli")
    with pytest.raises(ValueError, match="ragged"):
        write_parquet([("a", "int64", [1]), ("b", "int64", [1, 2])])
    with pytest.raises(ValueError, match="no columns"):
        write_parquet([])


def test_unicode_strings_roundtrip():
    import pyarrow.parquet as pq

    vals = ["héllo", "Ω≈ç", None, "日本語", ""]
    blob = write_parquet([("s", "string", vals)], codec="snappy")
    t = pq.read_table(io.BytesIO(blob))
    assert t.column("s").to_pylist() == vals


# --------------------------------------------------------------------------
# r13: dictionary encoding (PLAIN_DICTIONARY page pair).

@pytest.mark.parametrize("seed", [0, 1, 3, 7])
@pytest.mark.parametrize("codec", ["uncompressed", "snappy"])
@pytest.mark.parametrize("rgs", [None, 25])
def test_dictionary_three_readers_agree(seed, codec, rgs):
    import pyarrow.parquet as pq

    cols = parquet_rt_columns(seed)
    blob = write_parquet(cols, codec=codec, row_group_size=rgs,
                         dictionary=True)
    t = pq.read_table(io.BytesIO(blob))
    for name, _typ, vals in cols:
        assert t.column(name).to_pylist() == vals
    assert parquet_read_column(blob, "id") == cols[0][2]
    # the raw reader returns BYTE_ARRAY columns as bytes
    assert parquet_read_column(blob, "s") == [
        None if v is None else v.encode() for v in cols[2][2]]


def test_dictionary_metadata_and_size():
    import duckdb
    import pyarrow.parquet as pq

    vals = (["ab"] * 60 + ["cd"] * 60) * 10
    blob = write_parquet([("s", "string", vals)], dictionary=True,
                         codec="uncompressed")
    md = pq.read_metadata(io.BytesIO(blob))
    encs = md.row_group(0).column(0).encodings
    assert "PLAIN_DICTIONARY" in encs
    plain = write_parquet([("s", "string", vals)],
                          codec="uncompressed")
    assert len(blob) < len(plain) // 5
    with tempfile.NamedTemporaryFile(suffix=".parquet",
                                     delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        r = duckdb.sql(
            f"SELECT count(*), count(DISTINCT s) "
            f"FROM read_parquet('{path}')").fetchall()
        assert r[0] == (len(vals), 2)
    finally:
        os.unlink(path)
