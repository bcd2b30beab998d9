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


def test_pdf_objstm_bad_first_named_error():
    # an /ObjStm whose /First points past the decoded data is a named
    # quarantine, not a crash
    raw = make_pdf_xrefstream(2)
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


# ---------------------------------------------------------- TIFF LZW

from google_analytics_to_s3_spark.operators.multimodal import (  # noqa: E402
    _parse_tiff,
    _tiff_lzw_decode,
)
from google_analytics_to_s3_spark.testing.fixtures import (  # noqa: E402
    _tiff_lzw_encode,
    make_tiff,
    tiff_pixel_rule,
)


def _pack_msb(codes, widths):
    bits = "".join(format(c, f"0{w}b") for c, w in zip(codes, widths))
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def test_tiff_lzw_golden_bits_ababab():
    # hand-derived code stream for b"ABABAB": CLEAR, A, B, AB, AB, EOI
    # all at 9 bits, MSB-first — pins the packing convention
    golden = _pack_msb([256, 65, 66, 258, 258, 257], [9] * 6)
    assert _tiff_lzw_encode(b"ABABAB") == golden
    assert _tiff_lzw_decode(golden, 6) == b"ABABAB"


def test_tiff_lzw_early_change_is_load_bearing():
    # data with no repeats grows the table by one entry per input
    # byte; past 253 additions the encoder crosses the 511-entry
    # early-change boundary. A GIF-convention decode (bump at 512)
    # must FAIL on this stream while the TIFF decode inverts it.
    import numpy as np
    rng = np.random.RandomState(3)
    data = bytes(rng.randint(0, 256, 1200, dtype=np.uint8))
    enc = _tiff_lzw_encode(data)
    assert _tiff_lzw_decode(enc, len(data)) == data
    import pytest as _pt
    from google_analytics_to_s3_spark.operators.multimodal import (
        _gif_lzw_decode,
    )
    with _pt.raises(ValueError):
        _gif_lzw_decode(8, enc, len(data))  # late-change misreads


@pytest.mark.parametrize("variant", [4, 5])
@pytest.mark.parametrize("seed", [0, 1, 7, 999])
def test_tiff_lzw_variants_planted(seed, variant):
    import numpy as np
    w_, h_, c, px = _parse_tiff(make_tiff(seed, variant, w=40, h=9))
    spp = 3 if variant == 5 else 1
    assert (w_, h_, c) == (40, 9, spp)
    exp = np.array([[[tiff_pixel_rule(seed, x, y, ch)
                      for ch in range(spp)]
                     for x in range(40)] for y in range(9)],
                   dtype=np.uint8)
    assert (px == exp).all()


def test_tiff_lzw_truncation_and_overrun_named():
    raw = make_tiff(5, 4)
    from google_analytics_to_s3_spark.operators.multimodal import (
        _tiff_lzw_decode as dec,
    )
    enc = _tiff_lzw_encode(b"hello world hello world")
    with pytest.raises(ValueError):
        dec(enc[:-3], 23)
    with pytest.raises(ValueError):
        dec(enc, 5)  # more bytes than expected
    assert _parse_tiff(raw)[0] == 11


# ------------------------------------------- VP8L color transform / meta

from google_analytics_to_s3_spark.operators.webp import (  # noqa: E402
    parse_webp,
)
from google_analytics_to_s3_spark.testing.fixtures import (  # noqa: E402
    make_webp_ext,
    webp_pixel_rule,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 30, 999])
def test_webp_ext_per_pixel_exact(seed):
    d = parse_webp(make_webp_ext(seed))
    w, h = 10 + seed % 9, 8 + seed % 7
    assert (d["width"], d["height"], d["lossless"]) == (w, h, 1)
    for i, p in enumerate(d["pixels"]):
        y, x = divmod(i, w)
        assert ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF) \
            == webp_pixel_rule(seed, x, y)


def test_webp_color_inverse_int8_semantics():
    # the delta is (int8 * int8) >> 5 with ARITHMETIC shift: a
    # multiplier of 0x80 (-128) on green 0x7f (+127) adds
    # (-16256 >> 5) = -508 -> wraps mod 256
    from google_analytics_to_s3_spark.operators.webp import (
        _apply_color_inverse,
    )
    px = [0xFF000000 | (10 << 16) | (0x7F << 8) | 20]
    cte = [0xFF000000 | 0x80]  # g2r = -128, g2b = r2b = 0
    out = _apply_color_inverse(px, 1, 1, 2, cte)
    assert (out[0] >> 16) & 0xFF == (10 + ((-128 * 127) >> 5)) % 256


def test_webp_meta_group_count_bound():
    raw = make_webp_ext(1)  # variant 1: meta prefix stream
    d = parse_webp(raw)
    assert d["n_transforms"] == 0
    # corrupting the stream never crashes (named quarantine)
    for cut in (20, len(raw) // 2, len(raw) - 4):
        try:
            parse_webp(raw[:cut])
        except ValueError:
            pass


# ------------------------------------------------------ PDF filter set

from google_analytics_to_s3_spark.operators.pdf import (  # noqa: E402
    _ascii85_decode,
    _ascii_hex_decode,
    _pdf_lzw_decode,
    _run_length_decode,
)
from google_analytics_to_s3_spark.testing.fixtures import (  # noqa: E402
    make_pdf_filters,
)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 7, 11, 999])
def test_pdf_filters_text_matches_flate(seed):
    np1, _no1, t1 = extract_pdf_text(make_pdf_filters(seed))
    np0, _no0, t0 = extract_pdf_text(make_pdf(seed))
    assert (np1, t1) == (np0, t0)


def test_pdf_ascii85_cross_validated_with_stdlib():
    import base64
    for blob in (b"", b"a", b"ab", b"abc", b"abcd", b"abcde",
                 bytes(range(256)) * 3, b"\x00" * 9):
        enc = base64.a85encode(blob) + b"~>"
        assert _ascii85_decode(enc) == blob


def test_pdf_ascii85_z_shortcut_and_errors():
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        _ascii85_decode(b"!z~>")  # z inside a group
    with pytest.raises(ValueError):
        _ascii85_decode(b"v~>")  # out of range
    with pytest.raises(ValueError):
        _ascii85_decode(b"!~>")  # single trailing char
    with pytest.raises(ValueError):
        _ascii85_decode(b"uuuuu~>")  # > 2^32 - 1


def test_pdf_asciihex_whitespace_and_odd_digit():
    assert _ascii_hex_decode(b"48 65 6c\n6c 6F>") == b"Hello"
    assert _ascii_hex_decode(b"7>") == b"\x70"
    with pytest.raises(ValueError):
        _ascii_hex_decode(b"4g>")


def test_pdf_runlength_roundtrip_and_eod():
    from google_analytics_to_s3_spark.testing.fixtures import (
        _pdf_rl_encode,
    )
    for blob in (b"", b"x", b"aaaaabbbbb", bytes(range(200)),
                 b"ab" * 300, b"\xff" * 1000):
        assert _run_length_decode(_pdf_rl_encode(blob)) == blob
    with pytest.raises(ValueError):
        _run_length_decode(b"\x05abc")  # literal truncated
    with pytest.raises(ValueError):
        _run_length_decode(b"\x00a")  # no EOD


def test_pdf_lzw_earlychange_variants():
    import numpy as np

    from google_analytics_to_s3_spark.testing.fixtures import (
        _tiff_lzw_encode,
    )
    rng = np.random.RandomState(5)
    data = bytes(rng.randint(0, 256, 1500, dtype=np.uint8))
    enc = _tiff_lzw_encode(data)  # early-change encoder
    assert _pdf_lzw_decode(enc, 1) == data
    with pytest.raises(ValueError):
        _pdf_lzw_decode(enc, 0)  # late-change decode must misread


@pytest.mark.parametrize("variant", [6, 7])
@pytest.mark.parametrize("geom", [(11, 7), (40, 20), (33, 17)])
def test_tiff_tiled_variants_planted(variant, geom):
    # tiled TIFFs (TIFF 6.0 §15): 16x16 tiles, edge padding cropped,
    # LZW+Predictor2 (6) and PackBits big-endian RGB (7)
    import numpy as np
    w, h = geom
    for seed in (0, 3, 999):
        w_, h_, c, px = _parse_tiff(make_tiff(seed, variant, w=w, h=h))
        spp = 3 if variant == 7 else 1
        assert (w_, h_, c) == (w, h, spp)
        exp = np.array([[[tiff_pixel_rule(seed, x, y, ch)
                          for ch in range(spp)]
                         for x in range(w)] for y in range(h)],
                       dtype=np.uint8)
        assert (px == exp).all()


def test_tiff_tiled_bad_dimensions_named():
    raw = make_tiff(1, 6, w=40, h=20)
    # TileWidth not a multiple of 16 -> named error (flip 16 -> 17)
    import re as _re
    # locate the 322 entry value: little-endian (v6): tag bytes 42 01
    idx = raw.find(b"\x42\x01")
    bad = bytearray(raw)
    bad[idx + 8] = 17
    with pytest.raises(ValueError):
        _parse_tiff(bytes(bad))


# --------------------------------------------------------------- snappy

from google_analytics_to_s3_spark.operators.snappy import (  # noqa: E402
    crc32c,
    parse_snappy_frame,
    snappy_uncompress,
)
from google_analytics_to_s3_spark.testing.fixtures import (  # noqa: E402
    make_snappy,
    snappy_compress_block,
    snappy_payload_rule,
)


def test_crc32c_published_vectors():
    # RFC 3720 B.4 / Castagnoli check values
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_snappy_golden_rle_bytes():
    # hand-built stream: varint(11), literal 'a', copy-1 len 10 off 1
    golden = bytes([11, 0, ord("a"), 1 | (6 << 2), 1])
    assert snappy_uncompress(golden) == b"a" * 11


def test_snappy_block_roundtrip_regimes():
    import numpy as np
    rng = np.random.RandomState(0)
    for n in (0, 1, 4, 100, 5000, 120000):
        for mode in range(3):
            if mode == 0:
                data = bytes(rng.randint(0, 256, n, dtype=np.uint8))
            elif mode == 1:
                data = (b"abcde" * (n // 5 + 1))[:n]
            else:
                data = (b"the quick brown fox " * (n // 20 + 1))[:n]
            assert snappy_uncompress(
                snappy_compress_block(data)) == data


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 11, 999])
def test_snappy_frame_planted(seed):
    payload, nd, ns = parse_snappy_frame(make_snappy(seed))
    nk = 2 + seed % 4
    assert payload == b"".join(snappy_payload_rule(seed, k)
                               for k in range(nk))
    assert nd == nk
    assert ns == nk // 2 + (1 if seed % 5 == 0 else 0)


def test_snappy_crc_mismatch_named():
    raw = bytearray(make_snappy(1))
    raw[14] ^= 0xFF  # first data chunk's CRC field
    with pytest.raises(ValueError, match="CRC|snappy"):
        parse_snappy_frame(bytes(raw))


def test_snappy_gates_and_corruption():
    with pytest.raises(ValueError, match="identifier"):
        parse_snappy_frame(b"\xff\x06\x00\x00sNaPpX")
    raw = make_snappy(2)
    bad = bytearray(raw)
    bad[10:11] = b"\x27"  # reserved unskippable chunk type
    with pytest.raises(ValueError, match="unskippable"):
        parse_snappy_frame(bytes(bad))
    for cut in (11, len(raw) // 2, len(raw) - 2):
        try:
            parse_snappy_frame(raw[:cut])
        except ValueError:
            pass


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 999), frac=st.floats(0.02, 0.98),
       mut=st.integers(0, 2))
def test_snappy_corruption_never_crashes(seed, frac, mut):
    raw = bytearray(make_snappy(seed))
    pos = int(len(raw) * frac)
    if mut == 0:
        raw[pos] ^= 0xFF
    elif mut == 1:
        del raw[pos:pos + 5]
    else:
        raw[pos:pos] = b"\x00\xff"
    try:
        parse_snappy_frame(bytes(raw))
    except ValueError:
        pass


# -------------------------------------------------------------- charset

from google_analytics_to_s3_spark.operators.charset import (  # noqa: E402
    sniff_charset,
    transcode,
)
from google_analytics_to_s3_spark.testing.fixtures import (  # noqa: E402
    charset_doc_text,
    make_encoded_doc,
)

_EXP_ENC = {0: "utf-8", 1: "utf-8", 2: "utf-16-le", 3: "utf-16-be",
            4: "windows-1252", 5: "windows-1252"}
_EXP_EV = {0: "utf8", 1: "bom", 2: "bom", 3: "bom", 4: "fallback",
           5: "meta"}


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 17, 999])
def test_charset_planted_variants(seed):
    text, enc, ev, nrep = transcode(make_encoded_doc(seed))
    v = seed % 6
    assert (text, enc, ev, nrep) == (charset_doc_text(seed),
                                     _EXP_ENC[v], _EXP_EV[v], 0)


def test_charset_evidence_ladder():
    # header beats meta beats heuristics; BOM beats everything
    cp = "h\xe9llo".encode("cp1252")
    assert sniff_charset(cp, "text/html; charset=ISO-8859-1") \
        == ("windows-1252", "header")
    meta = (b"<html><meta charset=utf-8><body>" + cp)
    assert sniff_charset(meta)[1] == "meta"
    assert sniff_charset(b"\xef\xbb\xbf" + meta,
                         "x; charset=utf-16")[1] == "bom"


def test_charset_bomless_utf16_stripe_beats_utf8_trial():
    # NULs are valid UTF-8, so the stripe test must win
    for codec, enc in (("utf-16-le", "utf-16-le"),
                       ("utf-16-be", "utf-16-be")):
        raw = "plain ascii text only here".encode(codec)
        got_enc, ev = sniff_charset(raw)
        assert (got_enc, ev) == (enc, "utf16-stripe")
        assert transcode(raw)[0] == "plain ascii text only here"


def test_charset_cp1252_holes_latin1_positions():
    text, enc, ev, nrep = transcode(b"ab\x81cd\x90")
    assert nrep == 0 and text == "ab\x81cd\x90"
    assert (enc, ev) == ("windows-1252", "fallback")


def test_charset_utf32_boms():
    raw_le = b"\xff\xfe\x00\x00" + "hi".encode("utf-32-le")
    raw_be = b"\x00\x00\xfe\xff" + "hi".encode("utf-32-be")
    assert transcode(raw_le)[:2] == ("hi", "utf-32-le")
    assert transcode(raw_be)[:2] == ("hi", "utf-32-be")


def test_charset_replacement_counting():
    # invalid utf-16 tail after a BOM: replacement counted
    text, enc, ev, nrep = transcode(b"\xff\xfe" + b"a\x00b")
    assert enc == "utf-16-le" and nrep == 1 and "�" in text
