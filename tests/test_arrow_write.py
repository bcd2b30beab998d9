"""From-scratch Arrow IPC stream writer (operators/arrow_write.py)
— FlatBuffers built by hand, read back by pyarrow (the independent
consumer) and the engine's own walker."""

from __future__ import annotations

import pytest

from google_analytics_to_s3_spark.operators.arrow_ipc import (
    arrow_read_column,
)
from google_analytics_to_s3_spark.operators.arrow_write import (
    write_arrow_stream,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    arrow_rt_batch,
    arrow_rt_columns,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 11, 24, 999])
@pytest.mark.parametrize("bsz", [None, 10, 7])
def test_pyarrow_and_own_reader_agree(seed, bsz):
    import pyarrow as pa

    cols = arrow_rt_columns(seed)
    blob = write_arrow_stream(cols, batch_size=bsz)
    t = pa.ipc.open_stream(blob).read_all()
    assert t.num_rows == len(cols[0][2])
    for name, _typ, vals in cols:
        assert t.column(name).to_pylist() == vals
    assert arrow_read_column(blob, "id") == cols[0][2]


def test_schema_metadata_seen_by_pyarrow():
    import pyarrow as pa

    cols = arrow_rt_columns(5)
    rd = pa.ipc.open_stream(write_arrow_stream(cols))
    sch = rd.schema
    assert [f.name for f in sch] == ["id", "x", "s", "b"]
    assert sch.field("id").type == pa.int64()
    assert sch.field("x").type == pa.float64()
    assert sch.field("s").type == pa.string()
    assert sch.field("b").type == pa.bool_()
    assert all(f.nullable for f in sch)


def test_batch_boundaries_match_requested_size():
    import pyarrow as pa

    cols = arrow_rt_columns(1)
    n = len(cols[0][2])
    batches = list(pa.ipc.open_stream(
        write_arrow_stream(cols, batch_size=10)))
    assert [b.num_rows for b in batches] == \
        [10] * (n // 10) + ([n % 10] if n % 10 else [])


def test_all_null_empty_and_unicode():
    import pyarrow as pa

    blob = write_arrow_stream([
        ("a", "int64", [None, None]),
        ("s", "string", ["日本", None]),
    ])
    t = pa.ipc.open_stream(blob).read_all()
    assert t.column("a").to_pylist() == [None, None]
    assert t.column("s").to_pylist() == ["日本", None]
    t0 = pa.ipc.open_stream(
        write_arrow_stream([("a", "int64", [])])).read_all()
    assert t0.num_rows == 0


def test_writer_gates_named():
    with pytest.raises(ValueError, match="gated"):
        write_arrow_stream([("a", "int32", [1])])
    with pytest.raises(ValueError, match="ragged"):
        write_arrow_stream([("a", "int64", [1]),
                            ("b", "int64", [1, 2])])
    with pytest.raises(ValueError, match="no columns"):
        write_arrow_stream([])
