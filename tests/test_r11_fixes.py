"""Round-11 regression tests for the r10 ADVICE findings:

- warc_html_rows row_id stride (archive with >=10 responses must not
  collide with the next archive's ids);
- robots.txt RFC 9309 §2.2.1 group merge (duplicate user-agent groups);
- tar PAX zero-padded length prefix;
- PDF incremental-update 'f' (free) entries shadowing stale /Prev
  offsets instead of resurrecting deleted objects.
"""
import re

import pytest

from google_analytics_to_s3_spark.operators.pdf import extract_pdf_text
from google_analytics_to_s3_spark.operators.robots import (
    is_allowed,
    parse_robots,
)
from google_analytics_to_s3_spark.operators.tar import parse_tar
from google_analytics_to_s3_spark.operators.warc import parse_warc
from google_analytics_to_s3_spark.testing.fixtures import (
    make_html,
    make_pdf,
)


# ---------------------------------------------------------------- robots

def test_robots_duplicate_agent_groups_merge():
    # RFC 9309 §2.2.1: two groups naming the same agent act as ONE
    # group — the Disallow in the second block binds.
    groups, _ = parse_robots(
        "User-agent: bot\nAllow: /\n\n"
        "User-agent: other\nDisallow: /\n\n"
        "User-agent: bot\nDisallow: /private\n")
    assert not is_allowed(groups, "bot/1.0", "/private/x")
    assert is_allowed(groups, "bot/1.0", "/public")


def test_robots_duplicate_star_groups_merge():
    groups, _ = parse_robots(
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n")
    assert not is_allowed(groups, "anything", "/a/x")
    assert not is_allowed(groups, "anything", "/b/x")
    assert is_allowed(groups, "anything", "/c")


def test_robots_merge_does_not_leak_other_agents():
    # the merge is over groups naming the SELECTED token only
    groups, _ = parse_robots(
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: crawler\nDisallow: /b\n")
    assert is_allowed(groups, "bot", "/b/x")


def test_robots_named_match_excludes_star_groups():
    # RFC 9309: once a named token matches, '*' groups do not apply
    groups, _ = parse_robots(
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n")
    assert is_allowed(groups, "bot", "/b/x")
    assert not is_allowed(groups, "bot", "/a/x")


def test_robots_crawl_delay_from_merged_group(spark):
    # crawl-delay may live in the SECOND group naming the agent
    from pyspark.sql import functions as F  # noqa: F401

    from google_analytics_to_s3_spark.operators.robots import (
        evaluate_robots,
    )
    txt = ("User-agent: bot-a\nDisallow: /x\n\n"
           "User-agent: bot-a\nCrawl-delay: 7\n")
    df = spark.createDataFrame([(1, txt)],
                               "doc_id long, payload string")
    row = evaluate_robots(df, "bot-a", ["/x/1", "/y"]).collect()[0]
    assert row["crawl_delay"] == 7
    assert row["n_allowed"] == 1


# ------------------------------------------------------------------- tar

def _tar_header(name: bytes, size: int, typeflag: bytes) -> bytes:
    hdr = bytearray(512)
    hdr[0:len(name)] = name
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = ("%011o" % size).encode() + b"\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b" " * 8
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = ("%06o" % chk).encode() + b"\x00 "
    return bytes(hdr)


def _tar_member(name: bytes, data: bytes, typeflag: bytes = b"0") -> bytes:
    pad = (512 - len(data) % 512) % 512
    return _tar_header(name, len(data), typeflag) + data + b"\x00" * pad


def test_tar_pax_zero_padded_length_prefix():
    # a zero-padded PAX length field (b"027 key=value\n") must parse
    # to the same record as the canonical form — the prefix width is
    # the bytes actually consumed, not len(str(nl_len))
    rec = b"path=override/name.txt\n"
    body = b"0%d %s" % (len(rec) + 4, rec)  # e.g. b"028 path=...\n"
    assert int(body.split(b" ", 1)[0]) == len(body)
    tar = (_tar_member(b"ignored", body, b"x")
           + _tar_member(b"orig.txt", b"hello")
           + b"\x00" * 1024)
    members = parse_tar(tar)
    assert [m["name"] for m in members] == ["override/name.txt"]
    assert members[0]["data"] == b"hello"


def test_tar_pax_truncated_record_rejected():
    body = b"099 path=short\n"  # length lies past the record
    tar = (_tar_member(b"ignored", body, b"x")
           + _tar_member(b"orig.txt", b"hi")
           + b"\x00" * 1024)
    with pytest.raises(ValueError):
        parse_tar(tar)


def test_tar_pax_missing_space_rejected():
    tar = (_tar_member(b"ignored", b"27path=x\n", b"x")
           + _tar_member(b"orig.txt", b"hi")
           + b"\x00" * 1024)
    with pytest.raises(ValueError):
        parse_tar(tar)


# ------------------------------------------------------------------- pdf

def test_pdf_incremental_free_entry_shadows_prev():
    # Deleting page 0's /Contents object (5) in an incremental update
    # must NOT resurrect it via the stale /Prev offset.
    raw = make_pdf(1)  # seed 1: no incremental update in the fixture
    assert extract_pdf_text(raw)[2]  # sanity: extracts before update
    xref1 = int(re.search(rb"startxref\s+(\d+)", raw).group(1))
    size = int(re.search(rb"/Size (\d+)", raw).group(1))
    out = bytearray(raw)
    xref2 = len(out)
    out += (b"xref\n5 1\n0000000000 00001 f \n"
            + (b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\n"
               b"startxref\n%d\n%%%%EOF\n") % (size, xref1, xref2))
    with pytest.raises(ValueError, match="not in xref"):
        extract_pdf_text(bytes(out))


def test_pdf_plain_incremental_update_still_reads():
    raw = make_pdf(4)  # seed%4==0: fixture appends an update section
    np_, no, text = extract_pdf_text(raw)
    assert np_ == 2 + 4 % 3 and text


# ------------------------------------------------------------------ warc

def _warc_response(uri: str, ctype: str, body: bytes) -> bytes:
    http = (f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    head = [b"WARC/1.0", b"WARC-Type: response",
            b"WARC-Record-ID: <urn:uuid:r11>",
            b"WARC-Date: 2026-08-16T00:00:00Z",
            f"WARC-Target-URI: {uri}".encode(),
            b"Content-Type: application/http;msgtype=response",
            f"Content-Length: {len(http)}".encode()]
    return b"\r\n".join(head) + b"\r\n\r\n" + http + b"\r\n\r\n"


def _warc_many_pages(n: int) -> bytes:
    return b"".join(
        _warc_response(f"https://ex.test/{i}", "text/html",
                       make_html(i % 1000).encode())
        for i in range(n))


def test_warc_row_id_stride_no_collision(spark):
    # two archives with 12 HTML responses each: under the old
    # archive_id*10 scheme, archive 1's pages 10-11 collided with
    # archive 2's pages 0-1
    from google_analytics_to_s3_spark.operators.warc import warc_html_rows
    payload = _warc_many_pages(12)
    assert len(parse_warc(payload)) == 12
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(payload))],
        "doc_id long, payload binary")
    rows = warc_html_rows(df).collect()
    assert len(rows) == 24
    ids = {r["row_id"] for r in rows}
    assert len(ids) == 24
    for r in rows:
        assert r["row_id"] // 1_000_000 == r["archive_id"]
        assert 0 <= r["row_id"] % 1_000_000 < 12
