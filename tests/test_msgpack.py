"""MessagePack decoder (operators/msgpack.py): spec-golden byte pins,
planted-document round-trips, corruption discipline."""

from __future__ import annotations

import random
import struct

import pytest

from google_analytics_to_s3_spark.operators.msgpack import (
    msgpack_decode,
)
from google_analytics_to_s3_spark.testing.fixtures import make_msgpack


def _one(data: bytes):
    return msgpack_decode(data)[0]


def test_spec_fix_forms():
    assert _one(b"\x00") == 0
    assert _one(b"\x7f") == 127
    assert _one(b"\xff") == -1
    assert _one(b"\xe0") == -32
    assert _one(b"\xc0") is None
    assert _one(b"\xc2") is False
    assert _one(b"\xc3") is True
    assert _one(b"\xa3foo") == "foo"
    assert _one(b"\x92\x01\x02") == [1, 2]
    assert _one(b"\x81\xa1k\x05") == {"k": 5}


def test_spec_wide_forms_and_signs():
    assert _one(b"\xcc\xff") == 255
    assert _one(b"\xcd\x01\x00") == 256
    assert _one(b"\xce" + (70000).to_bytes(4, "big")) == 70000
    assert _one(b"\xcf" + (1 << 40).to_bytes(8, "big")) == 1 << 40
    assert _one(b"\xd0\x80") == -128
    assert _one(b"\xd1\xff\x00") == -256
    assert _one(b"\xd3" + (-(1 << 40)).to_bytes(8, "big",
                                                signed=True)) \
        == -(1 << 40)
    assert _one(b"\xcb" + struct.pack(">d", 2.5)) == 2.5
    assert _one(b"\xca" + struct.pack(">f", -1.5)) == -1.5


def test_bin_ext_and_long_collections():
    assert _one(b"\xc4\x03abc") == b"abc"
    assert _one(b"\xd6\x01wxyz") == ("ext", 1, b"wxyz")
    assert _one(b"\xc7\x02\x05ab") == ("ext", 5, b"ab")
    assert _one(b"\xdc\x00\x02\x01\x02") == [1, 2]
    assert _one(b"\xde\x00\x01\xa1a\x07") == {"a": 7}
    assert _one(b"\xd9\x03abc") == "abc"


def test_reserved_and_truncation_named():
    with pytest.raises(ValueError, match="0xC1"):
        msgpack_decode(b"\xc1")
    with pytest.raises(ValueError, match="truncated"):
        msgpack_decode(b"\xcd\x01")
    with pytest.raises(ValueError, match="trailing"):
        msgpack_decode(b"\x01\x02")
    with pytest.raises(ValueError, match="truncated"):
        msgpack_decode(b"\x92\x01")


def test_planted_documents():
    for seed in (0, 1, 2, 3, 5, 15, 30, 123, 999):
        v, st = msgpack_decode(make_msgpack(seed))
        assert v["id"] == seed
        assert st.n_maps == 2 and st.n_arrays == 1
        assert st.depth_max == 3


@pytest.mark.parametrize("seed", range(10))
def test_corruption_never_crashes(seed):
    base = make_msgpack(seed * 97 % 1000)
    r = random.Random(seed)
    for _ in range(120):
        b = bytearray(base)
        b[r.randrange(len(b))] ^= 1 << r.randrange(8)
        try:
            msgpack_decode(bytes(b))
        except (ValueError, IndexError):
            pass
