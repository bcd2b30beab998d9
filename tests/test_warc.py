"""WARC (ISO 28500) reader (operators/warc.py): record grammar,
gzip-member splitting, HTTP response parsing, the 1→N document
explode, gates and corruption robustness."""

import pytest

from google_analytics_to_s3_spark.operators.warc import (
    extract_warc_features,
    parse_warc,
    warc_documents,
    warc_features,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    make_warc,
    warc_rules,
)


class TestParse:
    def test_planted_records_recovered_gzip_and_plain(self):
        for seed in range(0, 120):
            r = warc_rules(seed)
            f = warc_features(make_warc(seed))
            n = r["n_pairs"]
            assert f["n_records"] == 1 + 2 * n
            assert f["n_responses"] == n
            assert f["n_requests"] == n
            assert f["n_warcinfo"] == 1
            assert f["status_sum"] == sum(r["status"])
            assert f["body_len_sum"] == sum(r["body_len"])
            assert f["body_byte_sum"] == sum(
                (seed + 13 * i + j) % 256
                for i in range(n) for j in range(r["body_len"][i]))

    def test_gzip_and_plain_layouts_agree(self):
        # seeds 4 and 5 share no rules, but re-encoding a plain
        # archive as per-record gzip members must parse identically
        import gzip
        import io

        plain = make_warc(5)  # odd seed -> plain
        recs = parse_warc(plain)
        f_plain = warc_features(plain)
        # re-wrap the SAME bytes as one gzip member
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(plain)
        assert warc_features(buf.getvalue()) == f_plain
        assert all(r["type"] in ("warcinfo", "request", "response")
                   for r in recs)

    def test_gates(self):
        raw = bytearray(make_warc(5))
        with pytest.raises(ValueError, match="version"):
            parse_warc(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
        # Content-Length overrun
        idx = bytes(raw).find(b"Content-Length: ")
        end = bytes(raw).find(b"\r\n", idx)
        patched = raw[:idx] + b"Content-Length: 99999" + raw[end:]
        with pytest.raises(ValueError, match="overruns"):
            parse_warc(bytes(patched))
        # chunked transfer encoding decodes for real (r11)
        body = (b"HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n"
                b"\r\n0\r\n\r\n")
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               + b"Content-Length: " + str(len(body)).encode()
               + b"\r\n\r\n" + body + b"\r\n\r\n")
        assert parse_warc(rec)[0]["body"] == b""

    def test_corruption_fuzz_bounded(self):
        import random
        import time
        import zlib

        rng = random.Random(0x8888)
        for base_seed in (4, 5):  # gzip and plain layouts
            base = make_warc(base_seed)
            for _ in range(150):
                b = bytearray(base)
                for _m in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
                t0 = time.monotonic()
                try:
                    warc_features(bytes(b))
                except (ValueError, IndexError, zlib.error):
                    pass
                assert time.monotonic() - t0 < 5.0


class TestSparkWrappers:
    def test_extract_and_quarantine(self, spark):
        good = make_warc(9)
        df = spark.createDataFrame(
            [(0, bytearray(good)), (1, bytearray(b"not a warc"))],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r
                for r in extract_warc_features(df).collect()}
        exp = warc_features(good)
        assert rows[0]["decode_error"] is None
        assert rows[0]["body_byte_sum"] == exp["body_byte_sum"]
        assert rows[1]["decode_error"] is not None

    def test_documents_explode(self, spark):
        seed = 12
        r = warc_rules(seed)
        df = spark.createDataFrame(
            [(0, bytearray(make_warc(seed)))],
            "doc_id long, payload binary",
        )
        rows = sorted(warc_documents(df).collect(),
                      key=lambda x: x["rec_no"])
        assert len(rows) == r["n_pairs"]
        for i, row in enumerate(rows):
            assert row["status"] == r["status"][i]
            assert row["body_len"] == r["body_len"][i]
            assert row["uri"] == f"https://example.com/{seed}/{i}"


class TestCrawlDedup:
    def test_planted_cross_archive_duplicates_group(self, spark):
        """The integration path: WARC bytes -> document explode ->
        exact dedup recovers the planted duplicate structure."""
        from google_analytics_to_s3_spark.operators.warc import (
            warc_documents as wd,
        )
        from google_analytics_to_s3_spark.testing.fixtures import (
            make_warc_dedup,
        )
        rows = [(s, bytearray(make_warc_dedup(s))) for s in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        docs = wd(df)
        from pyspark.sql import functions as F
        groups = {r["body_len"]: r for r in docs.groupBy("body_len")
                  .agg(F.count("*").alias("n")).collect()}
        # independent replay of the planted k multiset
        import collections
        exp = collections.Counter()
        for s in range(12):
            for i in range(2 + s % 3):
                exp[60 + (s + 7 * i) % 40] += 1
        assert {k: v["n"] for k, v in groups.items()} == dict(exp)
