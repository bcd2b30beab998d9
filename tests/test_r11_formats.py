"""Round-11 format coverage: PDF 1.5 cross-reference streams and
object streams (ISO 32000-1 §7.5.7/§7.5.8), incl. hybrid-reference
files and the /DecodeParms row predictors."""
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from google_analytics_to_s3_spark.operators.pdf import extract_pdf_text
from google_analytics_to_s3_spark.testing.fixtures import (
    make_pdf,
    make_pdf_xrefstream,
    pdf_word_value,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 10, 15, 20, 999])
def test_pdf_xrefstream_matches_classic(seed):
    # same planted text as make_pdf; the two extra live objects are
    # the /ObjStm container and the xref stream itself
    np1, no1, t1 = extract_pdf_text(make_pdf_xrefstream(seed))
    np0, no0, t0 = extract_pdf_text(make_pdf(seed))
    assert (np1, t1) == (np0, t0)
    assert no1 == no0 + 2
    assert f"w{pdf_word_value(seed, 0, 0)}" in t1


def test_pdf_xrefstream_all_variants():
    # seed sweep covers: /W [1 3 1] vs [1 2 1], predictor
    # none/Up/Paeth, /Index split, raw + Flate content streams
    for seed in range(60):
        np_, no, text = extract_pdf_text(make_pdf_xrefstream(seed))
        assert np_ == 2 + seed % 3
        assert no == 6 + 2 * np_


def _tail_xref_off(raw: bytes) -> int:
    return int(re.search(rb"startxref\s+(\d+)", raw).group(1))


def test_pdf_hybrid_xrefstm_takes_precedence():
    # classic table marks object 5 (page 0 /Contents) FREE, but the
    # trailer's /XRefStm section has it live: §7.5.8.4 — the stream
    # entries win over that section's table rows
    raw = make_pdf_xrefstream(1)
    xref_off = _tail_xref_off(raw)
    size = int(re.search(rb"/Size (\d+)", raw).group(1))
    out = bytearray(raw)
    tbl = len(out)
    out += (b"xref\n0 1\n0000000000 65535 f \n"
            b"5 1\n0000000000 00001 f \n"
            + b"trailer\n<< /Size %d /Root 1 0 R /XRefStm %d >>\n"
            % (size, xref_off)
            + b"startxref\n%d\n%%%%EOF\n" % tbl)
    np_, no, text = extract_pdf_text(bytes(out))
    assert np_ == 3 and "w" in text


def test_pdf_xrefstream_free_entry_shadows_prev():
    # an incremental xref-stream update freeing object 5 must shadow
    # the live entry reachable through /Prev
    raw = make_pdf_xrefstream(1)
    prev_off = _tail_xref_off(raw)
    size = int(re.search(rb"/Size (\d+)", raw).group(1))
    import zlib
    body = zlib.compress(bytes([0, 0, 0, 0]))  # type 0: free
    out = bytearray(raw)
    newoff = len(out)
    out += (b"99 0 obj\n<< /Type /XRef /Size %d /Root 1 0 R "
            b"/Index [5 1] /W [1 2 1] /Prev %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n"
            % (size, prev_off, len(body))
            + body + b"\nendstream\nendobj\n"
            + b"startxref\n%d\n%%%%EOF\n" % newoff)
    with pytest.raises(ValueError, match="not in xref"):
        extract_pdf_text(bytes(out))


def test_pdf_xrefstream_bad_w_rejected():
    raw = make_pdf_xrefstream(1)
    bad = raw.replace(b"/W [1 2 1]", b"/W [1 2 9]")
    with pytest.raises(ValueError):
        extract_pdf_text(bad)


def test_pdf_xrefstream_bad_type_rejected():
    raw = make_pdf_xrefstream(1)
    bad = raw.replace(b"/Type /XRef", b"/Type /XRf2")
    with pytest.raises(ValueError):
        extract_pdf_text(bad)


def test_pdf_objstm_missing_object_named_error():
    # point a type-2 entry at an /ObjStm that doesn't contain it:
    # corrupt the objstm header's first object number
    raw = make_pdf_xrefstream(2)  # /W [1 3 1], no predictor... seed2: pred=2
    # instead: oversized /First is a clean named error
    bad = re.sub(rb"/First \d+", b"/First 99999", raw)
    with pytest.raises(ValueError):
        extract_pdf_text(bad)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 99), frac=st.floats(0.05, 0.98),
       mut=st.integers(0, 2))
def test_pdf_xrefstream_corruption_never_crashes(seed, frac, mut):
    raw = bytearray(make_pdf_xrefstream(seed))
    pos = int(len(raw) * frac)
    if mut == 0:
        raw[pos] ^= 0xFF
    elif mut == 1:
        del raw[pos:pos + 7]
    else:
        raw[pos:pos] = b"\x00\xff\x00"
    try:
        extract_pdf_text(bytes(raw))
    except ValueError:
        pass  # named quarantine is the contract; crashes are not
