"""Unit truth tables for the text operators (script detection,
language ID, tokenization) over literal rows."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.text import (
    bpe_token_count,
    dominant_script,
    language_id,
    language_id_scripted,
    token_count,
)

SCRIPT_CASES = [
    ("the quick brown fox", "latin", "en"),
    ("der Hund und die Katze ist nicht da", "latin", "de"),
    ("el perro y los gatos es un animal que", "latin", "es"),
    ("le chien et le chat est dans une maison", "latin", "fr"),
    ("这是一个中文测试句子", "han", "zh"),
    ("это тест на русском языке", "cyrillic", "ru"),
    ("هذا اختبار باللغة العربية", "arabic", "ar"),
    ("한국어 테스트 문장입니다", "hangul", "ko"),
    ("これはにほんごのテストです", "kana", "ja"),
    ("12345 67890", "latin", None),  # digits-only falls back to latin
]


def test_script_and_language_truth_table(spark):
    rows = [(i, t) for i, (t, _, _) in enumerate(SCRIPT_CASES)]
    df = spark.createDataFrame(rows, ["i", "text"]).select(
        "i",
        dominant_script("text").alias("script"),
        language_id_scripted("text").alias("lang"),
    )
    got = {r["i"]: (r["script"], r["lang"]) for r in df.collect()}
    for i, (_, script, lang) in enumerate(SCRIPT_CASES):
        assert got[i][0] == script, (i, got[i])
        if lang is not None:
            assert got[i][1] == lang, (i, got[i])


def test_scripted_agrees_with_stopword_id_on_latin(spark, sf_smoke):
    from google_analytics_to_s3_spark.sources.testdata import load_table

    d = load_table(spark, sf_smoke, "documents").select(
        language_id("text").alias("a"),
        language_id_scripted("text").alias("b"),
    )
    assert d.filter(F.col("a") != F.col("b")).count() == 0


def test_token_counters(spark):
    df = spark.createDataFrame(
        [("Hello, world! It's 2026.",), ("one two three",)], ["text"]
    ).select(
        token_count("text").alias("ws"),
        bpe_token_count("text").alias("bpe"),
    )
    rows = df.collect()
    # "Hello," counts once for whitespace but Hello + , for BPE-ish
    assert rows[0]["bpe"] > rows[0]["ws"]
    assert rows[1]["ws"] == 3 and rows[1]["bpe"] == 3


def test_prefix_filter_is_lossless(spark, sf_smoke):
    """Thresholded prefix-filtered join returns exactly the naive
    all-pairs join filtered to >= t, for several thresholds."""
    from google_analytics_to_s3_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_thresholded,
    )
    from google_analytics_to_s3_spark.sources.testdata import load_table

    d = load_table(spark, sf_smoke, "documents")
    naive = ngram_jaccard_pairs(d, block_col="source", n=3)
    for t in (0.1, 0.5):
        want = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in naive.filter(F.col("jaccard") >= t).collect()
        }
        got = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ngram_jaccard_thresholded(
                d, t, block_col="source", n=3
            ).collect()
        }
        assert got == want, (t, got ^ want)


def test_winnow_native_arrow_parity(spark):
    """The pure-Catalyst winnow expression and the Arrow fast path must
    produce the same fingerprint SET (np.unique sorts; array_distinct
    keeps first-occurrence order — compare sorted)."""
    from google_analytics_to_s3_spark.operators.text import (
        winnow_fingerprints,
        winnow_fingerprints_pandas,
    )

    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(100)
        .select(
            F.array_sort(winnow_fingerprints("text", k=8, w=4)).alias("a"),
            F.array_sort(
                winnow_fingerprints_pandas("text", k=8, w=4)
            ).alias("b"),
        )
    )
    assert d.filter(F.col("a") != F.col("b")).count() == 0


def test_winnow_guarantee_and_edges(spark):
    """Winnowing's core property: two docs sharing a substring of
    length >= k+w-1 share at least one fingerprint. Plus short-text
    edge cases."""
    from google_analytics_to_s3_spark.operators.text import (
        winnow_fingerprints_pandas,
    )

    rows = [
        ("a", "xxxx one shared common phrase here yyyy"),
        ("b", "qq one shared common phrase here pp zz"),
        ("short", "tiny"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: set(r["f"] or [])
        for r in df.select(
            "doc_id",
            winnow_fingerprints_pandas("text", k=8, w=4).alias("f"),
        ).collect()
    }
    assert got["a"] & got["b"], "shared >=11-char substring must collide"
    assert got["short"] == set() and got["empty"] == set()


def test_tfidf_top_terms_finds_distinctive_words(spark):
    from google_analytics_to_s3_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common unicorn"),
            (2, "common common common"),
            (3, "common common common"),
        ],
        ["doc_id", "text"],
    )
    top = {r["doc_id"]: r for r in
           tfidf_top_terms(df, k=1).collect()}
    # equal tf in doc 1, but 'unicorn' is rare (df=1 vs 3) -> higher idf
    assert top[1]["word"] == "unicorn"
    assert top[2]["word"] == "common" and top[3]["word"] == "common"


def test_bm25_search_ranks_matching_docs_first(spark):
    from google_analytics_to_s3_spark.operators.text import bm25_search

    df = spark.createDataFrame(
        [
            (1, "spark data query spark data"),   # all three terms
            (2, "spark filler filler filler"),    # one term
            (3, "nothing relevant here at all"),  # none
            (4, "data query other words again"),  # two terms
        ],
        ["doc_id", "text"],
    )
    rows = bm25_search(df, ["data", "query", "spark"], k=4).collect()
    order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order[0] == 1            # most term mass wins
    assert order[-1] == 3           # no-match doc last
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[3] == 0.0 and scores[1] > scores[4] > scores[2]


class TestPositionalIndex:
    def test_index_query_equals_scan_local(self, spark):
        """The k-way positional-index join and the scan-local HOF give
        identical results — same operator, different cost point."""
        from google_analytics_to_s3_spark.operators.text import (
            build_positional_index, phrase_query_index, phrase_search,
        )

        rows = [
            (1, "a b c a b c a b"),
            (2, "b c b c"),
            (3, "a a a a"),
            (4, "x y z"),
            (5, "a"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        phrases = ["a b", "b c b", "a a a", "q z"]
        want = sorted(map(tuple, phrase_search(df, phrases).collect()))
        idx = build_positional_index(df)
        got = sorted(map(tuple,
                         phrase_query_index(idx, phrases).collect()))
        assert got == want
        # overlapping matches counted: 'a a a' in doc 3 has 2 starts
        assert ("a a a", 3, 2, 1) in got

    def test_persisted_index_prunes_partitions(self, spark, tmp_path):
        """partitionBy(term_bucket) + the per-term bucket filter ->
        the scan reads only the touched buckets (the nprobe analogue)."""
        from google_analytics_to_s3_spark.operators.text import (
            build_positional_index, phrase_query_index,
        )

        rows = [(i, f"w{i % 40} common w{(i + 1) % 40}")
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path / "pidx")
        build_positional_index(df).write.partitionBy(
            "term_bucket"
        ).parquet(path)
        idx = spark.read.parquet(path)
        q = phrase_query_index(idx, ["w3 common"])
        plan = q._jdf.queryExecution().executedPlan().toString()
        # partition filter on term_bucket made it into the scan
        assert "term_bucket" in plan
        got = {(r.doc_id, r.n_matches) for r in q.collect()}
        want = {(i, 1) for i in range(200) if i % 40 == 3}
        assert got == want


def test_char_entropy_stats_matches_hof(spark):
    """r14: the Arrow char_entropy_stats rewrite must stay
    value-identical to the higher-order-function expression form it
    replaced (same sorted-distinct fold order, same round(6))."""
    from pyspark.sql import functions as F

    from google_analytics_to_s3_spark.operators.text import (
        char_entropy,
        char_entropy_stats,
    )
    from google_analytics_to_s3_spark.sources.testdata import load_parallel

    d = load_parallel(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # empty strings excluded: there the HOF form's sequence(1,0) quirk
    # (n_distinct=1) diverges from the SQL oracle's range(1,1) (0) and
    # the Arrow op follows the oracle
    extra = spark.createDataFrame(
        [(100002, None), (100003, "aaaa"), (100004, "ab☃☃")],
        "doc_id long, text string",
    )
    d = d.unionByName(extra)
    n = F.length("text")
    chars = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.substr(F.col("text"), i, F.lit(1)),
    )
    hof = d.select(
        "doc_id",
        n.alias("n_chars"),
        F.size(F.array_distinct(chars)).alias("n_distinct_chars"),
        F.round(char_entropy("text"), 6).alias("entropy_bits"),
    )
    arrow = char_entropy_stats(d, "doc_id", "text")
    assert hof.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(hof).count() == 0
