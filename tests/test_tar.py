"""ustar / WebDataset reader (operators/tar.py): header grammar
independently cross-validated against CPython's tarfile module, the
sample-grouping convention, chained real-JPEG decode, gates and
corruption robustness."""

import io
import tarfile

import pytest

from google_analytics_to_s3_spark.operators.tar import (
    decode_webdataset,
    extract_tar_features,
    parse_tar,
    tar_features,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    jpeg_template_round_sums,
    make_webdataset,
    webdataset_rules,
)


class TestUstar:
    def test_parity_with_cpython_tarfile(self):
        """Member names, sizes and exact data must match what
        CPython's own tar implementation extracts — an independent
        implementation, not a fixture replay."""
        for seed in range(0, 60):
            raw = make_webdataset(seed)
            tf = tarfile.open(fileobj=io.BytesIO(raw))
            members = parse_tar(raw)
            assert [m["name"] for m in members] == tf.getnames()
            for m in members:
                assert m["data"] == tf.extractfile(m["name"]).read()

    def test_tarfile_written_archive_parses(self):
        """Archives produced BY CPython's tarfile (not our fixture
        serializer) must parse identically — both directions of the
        cross-validation."""
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            for name, data in (("a/x.txt", b"hello"),
                               ("a/y.bin", bytes(range(200))),
                               ("z.cls", b"42")):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        members = parse_tar(buf.getvalue())
        assert [m["name"] for m in members] == ["a/x.txt", "a/y.bin",
                                                "z.cls"]
        assert members[1]["data"] == bytes(range(200))

    def test_checksum_and_gates(self):
        raw = bytearray(make_webdataset(3))
        raw[0] ^= 0xFF  # corrupt the first header's name byte
        with pytest.raises(ValueError, match="checksum"):
            parse_tar(bytes(raw))
        raw = bytearray(make_webdataset(3))
        # PAX extended header typeflag
        raw[156] = ord("x")
        with pytest.raises(ValueError, match="checksum|PAX"):
            parse_tar(bytes(raw))

    def test_corruption_fuzz_bounded(self):
        import random
        import time

        base = make_webdataset(17)
        rng = random.Random(0x9999)
        for _ in range(250):
            b = bytearray(base)
            for _m in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            t0 = time.monotonic()
            try:
                tar_features(bytes(b))
            except (ValueError, IndexError):
                pass
            assert time.monotonic() - t0 < 5.0


class TestWebdataset:
    def test_samples_grouped_and_decoded(self, spark):
        seed = 11
        r = webdataset_rules(seed)
        rs = jpeg_template_round_sums()
        df = spark.createDataFrame(
            [(0, bytearray(make_webdataset(seed)))],
            "doc_id long, payload binary",
        )
        rows = sorted(decode_webdataset(df).collect(),
                      key=lambda x: x["sample_key"])
        assert len(rows) == r["n"]
        for i, row in enumerate(rows):
            assert row["sample_key"] == f"sample{i:04d}"
            assert row["n_parts"] == 3
            assert row["label"] == r["label"][i]
            assert (row["jpeg_width"], row["jpeg_height"]) == (16, 16)
            sj = r["j_seed"][i]
            ysum = 0
            for b in range(4):
                dc = ((sj * 7 + b * 13) % 121) - 60
                ysum += 64 * (128 + dc) + rs[(sj + b) % 5]
            assert row["jpeg_y_sum"] == ysum
            assert row["text_bytes"] == r["txt_len"][i]

    def test_extract_quarantine(self, spark):
        df = spark.createDataFrame(
            [(0, bytearray(make_webdataset(4))),
             (1, bytearray(b"\x00" * 100))],
            "doc_id long, payload binary",
        )
        rows = {r["doc_id"]: r
                for r in extract_tar_features(df).collect()}
        assert rows[0]["decode_error"] is None
        assert rows[0]["n_members"] == 3 * webdataset_rules(4)["n"]
        assert rows[1]["decode_error"] is not None
