"""HTML → text extraction for crawl pipelines (stdlib ``html.parser``).

The first stage of every web-scale LLM training-data pipeline is
turning raw crawl HTML into text: strip markup, drop script/style/
noscript/template payloads and comments, decode character references,
and keep block structure enough to count words/paragraphs/links.
This module implements that stage Spark-first: the parse itself is
inherently imperative (a tolerant SAX-style tag-soup walk — Python's
stdlib ``html.parser`` is the vectorization boundary), so it runs as
an Arrow ``mapInPandas`` with per-payload quarantine, exactly like the
image/audio byte paths (operators/multimodal.py). Everything
downstream (language ID, quality scores, dedup) composes on the
extracted columns via the existing operators.

Semantics (deterministic, oracle-replayable):

- only ``<body>`` text counts (``<head>`` is metadata; the first
  ``<title>`` is reported separately);
- content inside ``script``/``style``/``noscript``/``template`` and
  comments is dropped at any nesting depth;
- character references decode before counting
  (``convert_charrefs=True``);
- ``text_words`` = whitespace-token count, ``word_chars`` = summed
  token length — both invariant to whitespace normalization choices;
- ``n_links`` counts ``<a href=...>``, ``n_headings`` counts
  ``h1..h6``, ``n_paras`` counts ``<p>``.

At 100 TB the plan is scan → mapInPandas → columns: embarrassingly
parallel, no shuffle, cost strictly per-payload. No HTML surface
exists in the reference repo (mydatastack/google-analytics-to-s3).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from .payload_memo import dedup_payload_batches

_SKIP_TAGS = {"script", "style", "noscript", "template"}
_VOID_TAGS = {"br", "img", "hr", "meta", "link", "input", "area",
              "base", "col", "embed", "source", "track", "wbr"}


class _TextExtractor(HTMLParser):
    """Tolerant tag-soup extractor; never raises on malformed HTML."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.text_parts: list[str] = []
        self.n_links = 0
        self.n_headings = 0
        self.n_paras = 0
        self._skip_depth = 0
        self._in_title = False
        self._in_head = False
        self._saw_body = False
        self._title_done = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "head":
            self._in_head = True
        elif tag == "body":
            self._saw_body = True
            self._in_head = False
        elif tag == "title":
            if not self._title_done:
                self._in_title = True
        elif tag == "a":
            if any(k == "href" for k, _ in attrs):
                self.n_links += 1
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self.n_headings += 1
        elif tag == "p":
            self.n_paras += 1
        if tag not in _VOID_TAGS:
            # block boundary: any start tag separates text tokens
            self.text_parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "head":
            self._in_head = False
        elif tag == "title":
            self._in_title = False
            self._title_done = True
        self.text_parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._in_head:
            return
        self.text_parts.append(data)


def extract_html_text(raw: str) -> "tuple[str, str, int, int, int]":
    """Returns (title, text, n_links, n_headings, n_paras).

    ``text`` is newline-joined body text with markup/script/style
    removed and entities decoded; callers derive whitespace-invariant
    stats (token count, summed token length) from it."""
    p = _TextExtractor()
    p.feed(raw)
    p.close()
    title = " ".join("".join(p.title_parts).split())
    text = "".join(p.text_parts)
    return title, text, p.n_links, p.n_headings, p.n_paras


HTML_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("title", StringType()),
    StructField("n_links", IntegerType()),
    StructField("n_headings", IntegerType()),
    StructField("n_paras", IntegerType()),
    StructField("text_words", LongType()),
    StructField("word_chars", LongType()),
    StructField("extract_error", StringType()),
])


def extract_html_features(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Arrow ``mapInPandas`` over :func:`extract_html_text` with
    whitespace-invariant text stats; per-payload quarantine. Scan →
    map → columns: no shuffle, per-payload cost only."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "title", "n_links", "n_headings", "n_paras",
                "text_words", "word_chars", "extract_error")}
            for doc_id, raw in zip(pdf[id_col], pdf[html_col]):
                rows["doc_id"].append(doc_id)
                try:
                    title, text, nl, nh, np_ = extract_html_text(
                        str(raw))
                    toks = text.split()
                    rows["title"].append(title)
                    rows["n_links"].append(nl)
                    rows["n_headings"].append(nh)
                    rows["n_paras"].append(np_)
                    rows["text_words"].append(len(toks))
                    rows["word_chars"].append(
                        sum(len(t) for t in toks))
                    rows["extract_error"].append(None)
                except Exception as e:  # html.parser is tolerant;
                    # anything escaping it is quarantined per payload
                    for k in ("title", "n_links", "n_headings",
                              "n_paras", "text_words", "word_chars"):
                        rows[k].append(None)
                    rows["extract_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "title": pd.Series(rows["title"], dtype=object),
                "n_links": pd.Series(rows["n_links"], dtype="Int32"),
                "n_headings": pd.Series(rows["n_headings"],
                                        dtype="Int32"),
                "n_paras": pd.Series(rows["n_paras"], dtype="Int32"),
                "text_words": pd.Series(rows["text_words"],
                                        dtype="Int64"),
                "word_chars": pd.Series(rows["word_chars"],
                                        dtype="Int64"),
                "extract_error": pd.Series(rows["extract_error"],
                                           dtype=object),
            })

    return df.select(id_col, html_col).mapInPandas(
        dedup_payload_batches(_extract, id_col, html_col), schema=HTML_FEATURES_SCHEMA
    )


class _JsonLdCollector(HTMLParser):
    """Collect <script type="application/ld+json"> block contents."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.blocks: list[str] = []
        self._active = False
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            t = next((v for k, v in attrs if k == "type"), "")
            if (t or "").strip().lower() == "application/ld+json":
                self._active = True
                self._buf = []

    def handle_endtag(self, tag):
        if tag == "script" and self._active:
            self._active = False
            self.blocks.append("".join(self._buf))

    def handle_data(self, data):
        if self._active:
            self._buf.append(data)


JSONLD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_blocks", IntegerType()),
    StructField("n_valid", IntegerType()),
    StructField("n_articles", IntegerType()),
    StructField("n_products", IntegerType()),
    StructField("name_chars", LongType()),
    StructField("extract_error", StringType()),
])


def extract_jsonld(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Harvest schema.org JSON-LD structured data from HTML — the
    signal commercial crawl filters use for document typing. Counts
    ld+json blocks, how many parse as JSON, per-@type tallies
    (Article/Product), and summed entity-name length. Malformed
    blocks count toward ``n_blocks`` only (real pages embed broken
    JSON constantly); per-payload quarantine covers parser escapes."""
    import json as _json

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "n_blocks", "n_valid", "n_articles",
                "n_products", "name_chars", "extract_error")}
            for doc_id, raw in zip(pdf[id_col], pdf[html_col]):
                rows["doc_id"].append(doc_id)
                try:
                    c = _JsonLdCollector()
                    c.feed(str(raw))
                    c.close()
                    n_valid = n_art = n_prod = chars = 0
                    for block in c.blocks:
                        try:
                            obj = _json.loads(block)
                        except _json.JSONDecodeError:
                            continue
                        n_valid += 1
                        items = obj if isinstance(obj, list) else [obj]
                        for it in items:
                            if not isinstance(it, dict):
                                continue
                            t = it.get("@type")
                            if t == "Article":
                                n_art += 1
                            elif t == "Product":
                                n_prod += 1
                            name = it.get("name")
                            if isinstance(name, str):
                                chars += len(name)
                    rows["n_blocks"].append(len(c.blocks))
                    rows["n_valid"].append(n_valid)
                    rows["n_articles"].append(n_art)
                    rows["n_products"].append(n_prod)
                    rows["name_chars"].append(chars)
                    rows["extract_error"].append(None)
                except Exception as e:
                    for k in ("n_blocks", "n_valid", "n_articles",
                              "n_products", "name_chars"):
                        rows[k].append(None)
                    rows["extract_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k], dtype="Int32")
                   for k in ("n_blocks", "n_valid", "n_articles",
                             "n_products")},
                "name_chars": pd.Series(rows["name_chars"],
                                        dtype="Int64"),
                "extract_error": pd.Series(rows["extract_error"],
                                           dtype=object),
            })

    return df.select(id_col, html_col).mapInPandas(
        dedup_payload_batches(_extract, id_col, html_col), schema=JSONLD_SCHEMA
    )
