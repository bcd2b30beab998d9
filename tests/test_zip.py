"""ZIP reader (operators/zip.py): cross-validated both directions
against CPython's zipfile, CRC verification, gates, fuzz."""

import io
import zipfile

import pytest

from google_analytics_to_s3_spark.operators.zip import (
    extract_zip_features,
    parse_zip,
    zip_features,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    make_zip,
    zip_rules,
)


class TestZip:
    def test_parity_with_cpython_zipfile(self):
        for seed in range(0, 60):
            raw = make_zip(seed)
            zf = zipfile.ZipFile(io.BytesIO(raw))
            entries = parse_zip(raw)
            assert [e["name"] for e in entries] == zf.namelist()
            for e in entries:
                assert e["data"] == zf.read(e["name"])

    def test_zipfile_written_archive_parses(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("a.txt", b"hello world" * 50)
            zf.writestr("b/c.bin", bytes(range(256)) * 3)
        es = parse_zip(buf.getvalue())
        assert [e["name"] for e in es] == ["a.txt", "b/c.bin"]
        assert es[1]["data"] == bytes(range(256)) * 3

    def test_crc_and_gates(self):
        raw = bytearray(make_zip(5))
        # corrupt a data byte of the first (stored or deflated) member
        first_data = bytes(raw).find(b"doc000.txt") + 10
        raw[first_data] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-32|deflate|size"):
            parse_zip(bytes(raw))
        # encrypted flag
        raw = bytearray(make_zip(5))
        cd = bytes(raw).find(b"PK\x01\x02")
        raw[cd + 8] |= 0x01
        with pytest.raises(ValueError, match="encrypted"):
            parse_zip(bytes(raw))

    def test_corruption_fuzz_bounded(self):
        import random
        import struct
        import time
        import zlib

        base = make_zip(17)
        rng = random.Random(0xBBBB)
        for _ in range(250):
            b = bytearray(base)
            for _m in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            t0 = time.monotonic()
            try:
                zip_features(bytes(b))
            except (ValueError, IndexError, struct.error, zlib.error,
                    OverflowError, MemoryError):
                pass
            assert time.monotonic() - t0 < 5.0

    def test_wrapper_quarantine(self, spark):
        df = spark.createDataFrame(
            [(0, bytearray(make_zip(3))), (1, bytearray(b"PK\x00\x00"))],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r
                for r in extract_zip_features(df).collect()}
        assert rows[0]["decode_error"] is None
        assert rows[0]["n_entries"] == zip_rules(3)["n"]
        assert rows[1]["decode_error"] is not None
