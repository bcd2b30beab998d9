"""Round-11 driver queries: closing the highest-frequency real-crawl
gates named by the r10 verdict — PDF 1.5 compressed xref (xref
streams + /ObjStm object streams), and the follow-on format work.

Same planted-rule discipline as the r10 plans: a deterministic
fixture is synthesized per event id inside ``mapInPandas``, the REAL
decoder inverts it, and the DuckDB oracle replays the planted rules
in closed form. All oracle output columns are INTEGER/BIGINT.

No counterpart surface exists in the reference repo
(mydatastack/google-analytics-to-s3); this is the beyond-reference
LLM-training-data-pipeline surface the build plan mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_events
from .driver_queries_analytics import _FLAC_MOD, _spread

QUERIES_R11: dict = {}
ORACLES_R11: dict[str, str] = {}


def q_pdf_text_xrefstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF 1.5 compressed-xref extraction driver-checked end-to-end:
    per event a PDF whose catalog/page-tree/font/page objects live in
    a FlateDecode /ObjStm and whose cross-reference is a /Type /XRef
    STREAM (testing/fixtures.make_pdf_xrefstream — /W [1 3 1] and
    [1 2 1] field widths, PNG Up/Paeth + no-predictor variants,
    /Index subsection splits, page 0's /Length indirect THROUGH the
    object stream) is parsed by the real §7.5.7/§7.5.8 path
    (operators/pdf.py), and the oracle replays page/object/word/char
    counts in closed form. The planted text is shared with
    ``pdf_text``; the live-object count differs by exactly the two
    new container objects (/ObjStm + xref stream)."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from ..operators.pdf import extract_pdf_features
    from ..testing.fixtures import make_pdf_xrefstream

    e = _spread(
        load_events(spark, sf_dir).select("event_id").filter(
            F.col("event_id") % _FLAC_MOD == 3
        ),
        spark,
    )

    def _synth(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["event_id"].astype("int64"),
                "payload": [make_pdf_xrefstream(int(i) % 1000)
                            for i in pdf["event_id"]],
            })

    payloads = e.mapInPandas(_synth, schema="doc_id long, payload binary")
    return extract_pdf_features(payloads).drop("extract_error")


_PDF_XREFSTREAM_ORACLE = f"""
WITH e AS (
  SELECT event_id, event_id % 1000 AS seed,
         2 + (event_id % 1000) % 3 AS n_pages
  FROM events WHERE event_id % {_FLAC_MOD} = 3
),
pw AS (
  SELECT e.event_id,
         count(*) AS w,
         sum(CASE WHEN (e.seed*7 + p.p*13 + i.i*3) % 100 < 10
                  THEN 2 ELSE 3 END) AS ch
  FROM e,
       LATERAL (SELECT unnest(range(0, e.n_pages)) AS p) p,
       LATERAL (SELECT unnest(range(0, 5 + (e.seed + p.p) % 7)) AS i) i
  GROUP BY 1
)
SELECT e.event_id AS doc_id,
       CAST(e.n_pages AS INTEGER) AS n_pages,
       CAST(6 + 2*e.n_pages AS INTEGER) AS n_objects,
       CAST(pw.w + 2 AS BIGINT) AS text_words,
       CAST(pw.ch + 5 AS BIGINT) AS word_chars
FROM e JOIN pw ON pw.event_id = e.event_id
"""

QUERIES_R11["pdf_text_xrefstream"] = q_pdf_text_xrefstream
ORACLES_R11["pdf_text_xrefstream"] = _PDF_XREFSTREAM_ORACLE


def q_tiff_decode_lzw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF LZW decode driver-checked end-to-end (TIFF 6.0 §13):
    per event a 40x9 TIFF — grayscale LE LZW + Predictor 2
    (horizontal differencing, the libtiff default pairing) on even
    ids, RGB BIG-endian LZW without predictor on odd — is serialized
    by the real early-change MSB-first encoder
    (testing/fixtures._tiff_lzw_encode) and inverted by
    operators/multimodal._tiff_lzw_decode (early-change width bumps
    pinned against the GIF convention in tests/test_r11_formats).
    The oracle replays the planted sample rule exactly."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from ..operators.multimodal import decode_tiff_meta
    from ..testing.fixtures import make_tiff

    e = _spread(
        load_events(spark, sf_dir).select("event_id").filter(
            F.col("event_id") % _FLAC_MOD == 4
        ),
        spark,
    )

    def _synth(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["event_id"].astype("int64"),
                "payload": [
                    make_tiff(int(i) % 1000, variant=4 + int(i) % 2,
                              w=40, h=9)
                    for i in pdf["event_id"]
                ],
            })

    payloads = e.mapInPandas(_synth, schema="doc_id long, payload binary")
    return decode_tiff_meta(payloads).drop("decode_error")


_TIFF_LZW_ORACLE = f"""
WITH e AS (
  SELECT event_id, event_id % 1000 AS seed,
         CASE WHEN event_id % 2 = 1 THEN 3 ELSE 1 END AS spp
  FROM events WHERE event_id % {_FLAC_MOD} = 4
),
px AS (
  SELECT e.event_id,
         (e.seed + 11*x.x + 17*y.y + 7*c.c) % 256 AS v
  FROM e,
       LATERAL (SELECT unnest(range(0, 9)) AS y) y,
       LATERAL (SELECT unnest(range(0, 40)) AS x) x,
       LATERAL (SELECT unnest(range(0, e.spp)) AS c) c
)
SELECT e.event_id AS doc_id,
       CAST(40 AS INTEGER) AS width,
       CAST(9 AS INTEGER) AS height,
       CAST(e.spp AS INTEGER) AS channels,
       CAST(sum(px.v) AS BIGINT) AS px_sum,
       round(CAST(sum(px.v) AS DOUBLE) / (360.0 * e.spp), 6)
           AS mean_px
FROM e JOIN px ON px.event_id = e.event_id
GROUP BY e.event_id, e.spp
"""

QUERIES_R11["tiff_decode_lzw"] = q_tiff_decode_lzw
ORACLES_R11["tiff_decode_lzw"] = _TIFF_LZW_ORACLE
