"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting. All native Catalyst expressions —
at 100 TB these run map-side inside whole-stage codegen, no shuffle, no
Python workers.

Beyond-reference operators (the reference has no document processing);
designed to the same transform pattern as the GA operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal deterministic stopword lists for the language-ID heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "que"],
    "fr": ["le", "les", "et", "est", "une", "des", "du", "dans"],
    "zh": ["de", "shi", "bu", "le", "ren", "wo", "you", "ta"],
}

ENGLISH_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# GPT-2-flavored pre-tokenizer pattern, restricted to constructs both
# Java regex and RE2 support (no lookahead): contractions, letter runs,
# digit runs, punctuation runs, whitespace runs. Token counts from this
# approximate BPE pre-tokenization closely enough for length filtering.
BPE_SPLIT_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization via regexp_extract_all — the
    training-pipeline token counter (whitespace counting undercounts
    punctuation-heavy text)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0)
    # drop pure-whitespace matches: they separate words, they are not tokens
    return F.filter(toks, lambda t: ~t.rlike(r"^\s+$"))


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


def with_text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition quality signals."""
    toks = tokens(text_col)
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(
        F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
    )
    n_distinct = F.size(F.array_distinct(toks))
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_toks,
            "avg_token_len": (
                F.length(F.array_join(toks, "")).cast("double")
                / n_toks.cast("double")
            ),
            "stopword_ratio": n_stop.cast("double") / n_toks.cast("double"),
            "punct_ratio": n_punct.cast("double") / n_chars.cast("double"),
            "distinct_token_ratio": (
                n_distinct.cast("double") / n_toks.cast("double")
            ),
        }
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts (the language-ID signal)."""
    toks = tokens(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
    return out


def language_id(text: Column | str) -> Column:
    """Deterministic argmax over lang_scores with first-wins tie-break in
    fixed language order (sorted by code)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    expr: Column | None = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.when(cond, F.lit(lang))
        expr = branch if expr is None else expr.when(cond, F.lit(lang))
    assert expr is not None
    return expr.otherwise(F.lit(langs[0]))


# Unicode-script character classes (Java regex syntax — Spark's rlike /
# regexp_replace run on the JVM). Script detection is a far stronger
# language signal than stopwords for non-Latin text and costs one
# regexp_replace per script, map-side.
SCRIPT_CLASSES: dict[str, str] = {
    "arabic": r"\p{script=Arabic}",
    "cyrillic": r"\p{script=Cyrillic}",
    "han": r"\p{script=Han}",
    "hangul": r"\p{script=Hangul}",
    "kana": r"\p{script=Hiragana}\p{script=Katakana}",
    "latin": r"\p{script=Latin}",
}

SCRIPT_TO_LANG: dict[str, str] = {
    "arabic": "ar",
    "cyrillic": "ru",
    "han": "zh",
    "hangul": "ko",
    "kana": "ja",
}


def script_counts(text: Column | str) -> dict[str, Column]:
    """Characters per Unicode script (the script-ID signal)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.length(F.regexp_replace(c, f"[^{cls}]", ""))
        for name, cls in SCRIPT_CLASSES.items()
    }


def dominant_script(text: Column | str) -> Column:
    """Argmax over script_counts; ties break in fixed (sorted) script
    order; all-zero (e.g. digits-only text) falls back to 'latin'."""
    counts = script_counts(text)
    names = sorted(counts)
    expr: Column | None = None
    for name in names:
        cond: Column | None = None
        for other in names:
            if other == name:
                continue
            ge = counts[name] >= counts[other]
            cond = ge if cond is None else (cond & ge)
        assert cond is not None
        cond = cond & (counts[name] > 0)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    assert expr is not None
    return expr.otherwise(F.lit("latin"))


def language_id_scripted(text: Column | str) -> Column:
    """Two-stage language ID: non-Latin scripts map straight to their
    language (han→zh, hangul→ko, kana→ja, cyrillic→ru, arabic→ar);
    Latin text falls through to the stopword argmax. For Latin-only
    corpora this agrees with :func:`language_id` exactly, so the
    text_stats oracle is unaffected."""
    script = dominant_script(text)
    expr: Column | None = None
    for name, lang in sorted(SCRIPT_TO_LANG.items()):
        branch_cond = script == F.lit(name)
        expr = (
            F.when(branch_cond, F.lit(lang))
            if expr is None
            else expr.when(branch_cond, F.lit(lang))
        )
    assert expr is not None
    return expr.otherwise(language_id(text))


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive bag-of-words content fingerprint:
    md5 over the sorted distinct token set."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def char_entropy(text: Column | str) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    classic gibberish/boilerplate quality signal (low → repeated
    padding, high → random noise; natural language sits ~3.5-4.5).

    Pure Catalyst higher-order functions, no explode: the histogram is
    built per row as transform-over-sorted-distinct-chars (O(distinct ×
    len) inside codegen — distinct ≤ alphabet size), so nothing
    shuffles and the whole expression pipelines into the scan. The
    summation folds over SORTED distinct chars, making the double
    accumulation order engine-portable (the DuckDB oracle sums in the
    same order)."""
    t = F.col(text) if isinstance(text, str) else text
    n = F.length(t)
    chars = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substr(t, i, F.lit(1))
    )
    ds = F.array_sort(F.array_distinct(chars))
    counts = F.transform(
        ds, lambda d: F.size(F.filter(chars, lambda c: c == d))
    )
    terms = F.transform(counts, lambda k: (k / n) * F.log2(k / n))
    return F.when(
        n > 0, -F.aggregate(terms, F.lit(0.0), lambda a, v: a + v)
    ).otherwise(F.lit(0.0))
