

# --------------------------------------------------------------------------
# r13: row-index pruning.

def test_row_index_prune_vs_full_scan():
    """Pruned range scans must produce exactly a full scan's
    matches (pruning is lossless), while decoding only surviving
    groups."""
    import pyarrow as pa
    from pyarrow import orc as pa_orc

    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_range,
    )

    vals = [g * 100000 + (7 * i) % 5000 for g in range(3)
            for i in range(2000)]
    buf = pa.BufferOutputStream()
    pa_orc.write_table(
        pa.table({"v": pa.array(vals, pa.int64())}), buf,
        compression="UNCOMPRESSED", row_index_stride=1000)
    data = buf.getvalue().to_pybytes()
    for lo, hi in [(0, 4000), (100000, 101000), (0, 300000),
                   (50000, 60000), (199999, 200001)]:
        r = orc_read_int_range(data, "v", lo, hi)
        assert r["matched_rows"] == sum(1 for v in vals
                                        if lo <= v <= hi)
        assert r["matched_sum"] == sum(v for v in vals
                                       if lo <= v <= hi)
        assert r["values_decoded"] == r["groups_read"] * 1000
    # selective window decodes a strict subset
    assert orc_read_int_range(data, "v", 0, 4000)["groups_read"] < 6


def test_row_index_fixture_planted():
    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_range,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_orc_ri,
    )

    for seed in (0, 1, 5, 999):
        for w in range(4):
            lo = w * 100000 + 10
            r = orc_read_int_range(make_orc_ri(seed), "v", lo,
                                   lo + 50000)
            assert r["groups_total"] == 4
            assert r["groups_read"] == 1
            assert r["values_decoded"] == 1000


def test_row_index_compressed_codecs():
    """The 3-entry seek triple works across every chunk codec the
    ORC C++ writer emits."""
    import pyarrow as pa
    from pyarrow import orc as pa_orc

    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_range,
    )

    vals = [g * 100000 + (7 * i) % 5000 for g in range(3)
            for i in range(2000)]
    for codec in ("ZLIB", "SNAPPY", "ZSTD", "LZ4"):
        buf = pa.BufferOutputStream()
        pa_orc.write_table(
            pa.table({"v": pa.array(vals, pa.int64())}), buf,
            compression=codec, row_index_stride=1000)
        r = orc_read_int_range(buf.getvalue().to_pybytes(), "v",
                               0, 4000)
        assert r["matched_rows"] == sum(1 for v in vals
                                        if v <= 4000)
        assert r["groups_read"] < r["groups_total"]


def test_row_index_gates():
    import pyarrow as pa
    import pytest
    from pyarrow import orc as pa_orc

    from google_analytics_to_s3_spark.operators.orc_meta import (
        orc_read_int_range,
    )

    # nullable column gated (PRESENT stream seek not modeled)
    buf2 = pa.BufferOutputStream()
    pa_orc.write_table(
        pa.table({"v": pa.array([1, None] * 1500, pa.int64())}),
        buf2, compression="UNCOMPRESSED", row_index_stride=1000)
    with pytest.raises(ValueError, match="PRESENT"):
        orc_read_int_range(buf2.getvalue().to_pybytes(), "v", 0, 10)
