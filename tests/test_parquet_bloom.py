"""Parquet split-block bloom filters (operators/parquet_raw.py r13):
SBBF insert pinned byte-for-byte against Spark's parquet-mr writer,
lookups with row-group skipping, hand-written fixture validated by
pyarrow + DuckDB as independent readers."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from google_analytics_to_s3_spark.operators.parquet_raw import (
    bloom_hash_int64,
    bloom_insert,
    parquet_bloom_lookup,
    parquet_read_bloom,
    parquet_read_column,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    make_parquet_bloom,
)


def test_sbbf_insert_matches_parquet_mr(spark):
    """Write a bloom-filtered file with Spark (parquet-mr), rebuild
    the bitset with our insert over the same distinct values: the
    bytes must be IDENTICAL — block pick, salts, xxhash64, all of
    it."""
    d = tempfile.mkdtemp()
    try:
        df = spark.range(0, 20000).selectExpr("(id*37)%60000 AS v")
        (df.coalesce(1).write.mode("overwrite")
         .option("parquet.bloom.filter.enabled#v", "true")
         .option("parquet.bloom.filter.expected.ndv#v", "20000")
         .parquet(d + "/t"))
        f = glob.glob(d + "/t/*.parquet")[0]
        data = open(f, "rb").read()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    blooms = parquet_read_bloom(data, "v")
    assert len(blooms) == 1 and blooms[0] is not None
    nbytes, bitset = blooms[0]
    mine = bytearray(nbytes)
    for v in set(parquet_read_column(data, "v")):
        bloom_insert(mine, bloom_hash_int64(v))
    assert bytes(mine) == bitset
    # and lookups behave on the parquet-mr file
    r = parquet_bloom_lookup(data, "v", [37 * 5 % 60000, 59999999])
    assert r["present_pairs"] == 1 and r["found_sum"] >= 1


def test_fixture_reads_in_pyarrow_and_skips_groups():
    """The hand-written fixture file is real parquet (pyarrow reads
    it), lookups never produce false negatives, and absent probes
    actually SKIP row groups (pass_pairs < probes x groups across
    seeds)."""
    any_skip = False
    for seed in (0, 1, 2, 3, 7, 12, 999):
        data, probes = make_parquet_bloom(seed)
        ng = 3 + seed % 2
        t = pq.read_table(pa.BufferReader(data))
        assert t.num_rows == 40 * ng
        assert t["v"].to_pylist() == parquet_read_column(data, "v")
        r = parquet_bloom_lookup(data, "v", list(probes))
        assert r["present_pairs"] == ng
        assert r["found_sum"] == sum(
            2 if ((seed + g) % 40) % 25 < 15 else 1 for g in range(ng))
        assert r["pass_pairs"] >= ng  # no false negatives
        if r["pass_pairs"] < r["n_probes"] * r["n_groups"]:
            any_skip = True
    assert any_skip


def test_bloom_header_gates():
    data, _ = make_parquet_bloom(5)
    # truncate the bitset: named error
    cut = data[: len(data) - 2000]
    with pytest.raises(ValueError):
        parquet_bloom_lookup(cut + data[-8:], "v", [1])
    # a file with no bloom at all
    buf = pa.BufferOutputStream()
    pq.write_table(pa.table({"v": pa.array([1, 2, 3], pa.int64())}),
                   buf)
    plain = buf.getvalue().to_pybytes()
    assert parquet_read_bloom(plain, "v") == [None]
    with pytest.raises(ValueError, match="without a bloom"):
        parquet_bloom_lookup(plain, "v", [1])


# --------------------------------------------------------------------------
# r13 companions in parquet_raw: FLBA decimals + page CRCs.


def test_decimal_flba_sign_and_widths():
    import decimal

    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_read_decimal_column,
    )

    for precision in (9, 18, 30):
        t = pa.table({"d": pa.array(
            [decimal.Decimal("12.34"), None, decimal.Decimal("-0.07"),
             decimal.Decimal("-99999.99")],
            pa.decimal128(precision, 2))})
        buf = pa.BufferOutputStream()
        pq.write_table(t, buf)
        vals, scale = parquet_read_decimal_column(
            buf.getvalue().to_pybytes(), "d")
        assert scale == 2
        assert vals == [1234, None, -7, -9999999], precision


def test_page_crc_verify_and_corruption():
    from google_analytics_to_s3_spark.operators.parquet_raw import (
        parquet_file_meta,
        parquet_verify_page_crcs,
        thrift_compact_struct,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_parquet_crc,
    )

    for seed in (0, 1, 2, 5, 999):
        data = make_parquet_crc(seed)
        r = parquet_verify_page_crcs(data, "v")
        assert r["n_crc"] == r["n_pages"] >= 2, (seed, r)
        # a single flipped byte in the first page BODY is caught
        m = parquet_file_meta(data)
        chunk = m["row_groups"][0]["columns"][0]
        off = chunk["dictionary_page_offset"]
        if off is None:
            off = chunk["data_page_offset"]
        _hdr, body = thrift_compact_struct(data, off)
        bad = bytearray(data)
        bad[body + 3] ^= 0x40
        with pytest.raises(ValueError, match="CRC"):
            parquet_verify_page_crcs(bytes(bad), "v")
    # files WITHOUT checksums verify trivially (n_crc = 0)
    buf = pa.BufferOutputStream()
    pq.write_table(pa.table({"v": pa.array(range(100), pa.int64())}),
                   buf, write_page_checksum=False)
    r = parquet_verify_page_crcs(buf.getvalue().to_pybytes(), "v")
    assert r["n_crc"] == 0 and r["n_pages"] >= 1
