"""CSV dialect sniffing + RFC 4180 parser (operators/csvx.py) —
producer is stdlib csv.writer."""

from __future__ import annotations

import pytest

from google_analytics_to_s3_spark.operators.csvx import (
    csv_table_stats,
    parse_csv,
    sniff_csv_dialect,
)
from google_analytics_to_s3_spark.testing.fixtures import make_csv_doc


def test_rfc4180_worked_shapes():
    # quoted field with embedded delimiter, newline, doubled quote;
    # CRLF records; final record without newline
    text = 'a,"b,c",d\r\n"x""y","l1\nl2",z\r\n1,2,3'
    assert parse_csv(text) == [
        ["a", "b,c", "d"], ['x"y', "l1\nl2", "z"], ["1", "2", "3"]]


def test_rfc4180_structural_errors_named():
    with pytest.raises(ValueError, match="unclosed"):
        parse_csv('a,"bc')
    with pytest.raises(ValueError, match="stray quote"):
        parse_csv('ab"c,d')
    with pytest.raises(ValueError, match="after closing quote"):
        parse_csv('"ab"c,d')


def test_stdlib_writer_roundtrip_all_dialects():
    """Anything stdlib csv.writer writes, parse_csv reads back
    exactly — across delimiters, quoting styles, line endings."""
    import csv as _csv
    import io as _io

    rows = [["a", 'he said "hi"', "x,y"],
            ["", "multi\nline", "|pipe;semi\ttab"],
            ["1", "2.5", "z"]]
    for d in [",", ";", "\t", "|"]:
        for lt in ["\n", "\r\n"]:
            buf = _io.StringIO()
            w = _csv.writer(buf, delimiter=d,
                            quoting=_csv.QUOTE_MINIMAL,
                            lineterminator=lt)
            w.writerows(rows)
            assert parse_csv(buf.getvalue(), delim=d) == rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 5, 10, 999])
def test_planted_stats(seed):
    r = csv_table_stats(make_csv_doc(seed), "id")
    n = 20 + seed % 30
    assert r["delim_id"] == seed % 4
    assert r["n_rows"] == n and r["n_columns"] == 4
    assert r["n_ragged"] == (1 if seed % 5 == 0 else 0)
    assert (r["n_int_cols"], r["n_double_cols"],
            r["n_string_cols"]) == (1, 1, 2)
    assert r["int_sum"] == sum((seed * 7 + 3 * i) % 5000
                               for i in range(n)
                               if (seed + i) % 9 != 8)


def test_sniffer_rejects_non_tabular():
    with pytest.raises(ValueError, match="no consistent dialect"):
        sniff_csv_dialect("justoneword\nanother\nthird\n")


def test_sniffer_header_detection_both_ways():
    assert sniff_csv_dialect("id,v\n1,2\n3,4\n")["header"] is True
    # all-string body -> no type dissonance -> headerless verdict
    assert sniff_csv_dialect("a,b\nc,d\ne,f\n")["header"] is False


def test_missing_and_wrong_typed_column_named():
    with pytest.raises(ValueError, match="no column"):
        csv_table_stats(make_csv_doc(1), "nope")
    with pytest.raises(ValueError, match="not int64"):
        csv_table_stats(make_csv_doc(1), "note")
