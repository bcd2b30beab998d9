"""Roaring bitmaps + Z85 + Delta deletion vectors
(operators/roaring.py, the DV scan in operators/lakehouse.py).

No independent roaring producer exists in this environment (honesty
note in the module docstring) — the fixtures use a SEPARATE
spec-following encoder; the Z85 leg is pinned on the ZeroMQ RFC's
published vector."""

from __future__ import annotations

import random

import pytest

from google_analytics_to_s3_spark.operators.roaring import (
    parse_deletion_vector,
    roaring32_decode,
    roaring64_decode,
    z85_decode,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    roaring32_encode,
    roaring64_encode,
    z85_encode,
)


def test_z85_rfc_vector():
    # spec 32/Z85's published test case
    assert z85_encode(bytes.fromhex("864FD26FB559F75B")) == \
        "HelloWorld"
    assert z85_decode("HelloWorld") == bytes.fromhex("864FD26FB559F75B")
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abc")
    with pytest.raises(ValueError, match="invalid character"):
        z85_decode("abcd~")


@pytest.mark.parametrize("runs", [False, True])
def test_roaring_container_types(runs):
    rng = random.Random(5)
    cases = [
        [0],
        [65535, 65536],                                   # chunk edge
        sorted(rng.sample(range(200000), 3000)),          # arrays
        sorted(rng.sample(range(60000), 5000)),           # bitmap
        list(range(1000, 9000)) + [70000, 70002],         # runs
        sorted(rng.sample(range(2**40), 500)),            # 64-bit keys
        list(range(4096)) + list(range(100000, 104097)),  # both kinds
    ]
    for vals in cases:
        enc = roaring64_encode(vals, runs)
        assert roaring64_decode(enc) == sorted(set(vals))
        lo32 = sorted(set(v for v in vals if v < 2**32))
        if lo32:
            enc32 = roaring32_encode(lo32, runs)
            got, end = roaring32_decode(enc32)
            assert got == lo32 and end == len(enc32)


def test_deletion_vector_descriptor():
    dead = sorted({3, 8, 13, 100, 65536, 2**33 + 7})
    dv = (1681511377).to_bytes(4, "little") + roaring64_encode(dead)
    got = parse_deletion_vector("u", z85_encode(dv), len(dv),
                                len(dead))
    assert got == set(dead)
    # wrong cardinality / size quarantine
    with pytest.raises(ValueError, match="cardinality"):
        parse_deletion_vector("u", z85_encode(dv), len(dv), 2)
    with pytest.raises(ValueError, match="size"):
        parse_deletion_vector("u", z85_encode(dv), len(dv) + 9,
                              len(dead))
    # file-based storage is a named gate
    with pytest.raises(ValueError, match="gated"):
        parse_deletion_vector("p", "s3://bucket/dv.bin", 10, 1)


def test_corrupt_roaring_named():
    dead = list(range(50))
    enc = roaring64_encode(dead)
    with pytest.raises(ValueError):
        roaring64_decode(enc[:-3])
    with pytest.raises(ValueError, match="cookie"):
        roaring32_decode(b"\x00\x00\x00\x00")
    for seed in range(60):
        rng = random.Random(seed)
        b = bytearray(enc)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            roaring64_decode(bytes(b))
        except (ValueError, IndexError):
            pass


def test_dv_scan_fixture():
    from google_analytics_to_s3_spark.operators.lakehouse import (
        parse_delta_scan_dv,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_delta_dv_bundle,
    )

    for seed in (0, 1, 2, 3, 7, 17, 999):
        got = parse_delta_scan_dv(make_delta_dv_bundle(seed), "v")
        nf = 2 + seed % 3
        ndel = after = vsum = 0
        for f in range(nf):
            n = 40 + (seed * 3 + 11 * f) % 60
            dead = {i for i in range(n) if i % 5 == (seed + f) % 5}
            if f == 1:
                dead |= set(range(10, 10 + seed % 8))
            for i in range(n):
                v = (seed * 7 + 13 * f + 9 * i) % 1000
                if i in dead:
                    ndel += 1
                else:
                    after += 1
                    vsum += v
        assert got == {"n_files": nf, "n_dv": nf,
                       "n_deleted": ndel, "records_after": after,
                       "value_sum": vsum}
