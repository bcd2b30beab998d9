"""Corpus-curation operators: PII scan/redact, quality filter,
contamination screen, bigram-LM typicality."""

import pyspark.sql.functions as F

from google_analytics_to_s3_spark.operators.curation import (
    bigram_lm_scores,
    contamination_pairs,
    pii_signals,
    plant_pii,
    quality_signals,
)


def test_pii_detect_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.smith+x@corp.example.org or bob@ex.io"),
            (2, "call +1-555-0099 from 192.168.1.200 please"),
            (3, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_signals(df).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 0
    assert rows[2]["n_phones"] == 1 and rows[2]["n_ips"] == 1
    assert rows[3]["n_emails"] == rows[3]["n_phones"] == rows[3]["n_ips"] == 0
    assert rows[1]["redacted"] == "write to [EMAIL] or [EMAIL]"
    assert rows[2]["redacted"] == "call [PHONE] from [IP] please"
    assert rows[3]["redacted"] == "no pii here at all"


def test_plant_pii_deterministic_and_detectable(spark):
    df = spark.createDataFrame(
        [(i, "plain words only") for i in range(106)], ["doc_id", "text"]
    )
    sig = pii_signals(plant_pii(df))
    agg = sig.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
    ).collect()[0]
    # ids 0..105: 36 multiples of 3, 22 of 5, 16 of 7
    assert (agg["e"], agg["p"], agg["i"]) == (36, 22, 16)
    # redaction strips every planted item
    red = sig.select(F.col("doc_id"), F.col("redacted").alias("text"))
    again = pii_signals(red).agg(
        F.sum("n_emails") + F.sum("n_phones") + F.sum("n_ips")
    ).collect()[0][0]
    assert again == 0


def test_quality_signals_flags_repetition(spark):
    good = " ".join(f"w{i}" for i in range(60))  # 60 distinct words
    bad = "spam " * 60  # one word repeated
    df = spark.createDataFrame(
        [(1, good), (2, bad.strip()), (3, "tiny doc")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in quality_signals(df).collect()}
    assert rows[1]["keep"] is True
    assert rows[1]["n_words"] == 60 and rows[1]["distinct_ratio"] == 1.0
    assert rows[2]["keep"] is False  # top_word_frac == 1.0
    assert rows[2]["top_word_frac"] == 1.0
    assert rows[3]["keep"] is False  # too short
    assert rows[3]["mean_word_len"] == 3.5


def test_contamination_excludes_self_and_counts_distinct_grams(spark):
    a = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, a),  # eval doc
            (2, "x y " + a),  # contains all of a's 4-grams
            (3, "alpha beta gamma nope more words here"),  # none shared
        ],
        ["doc_id", "text"],
    )
    ev = df.filter(F.col("doc_id") == 1)
    got = {
        (r["doc_id"], r["eval_doc_id"]): r["n_shared"]
        for r in contamination_pairs(df, ev, n=4).collect()
    }
    assert got == {(2, 1): 3}  # a has 3 distinct 4-grams, no self pair


def test_bigram_lm_typicality_orders_outliers_last(spark):
    typical = "the cat sat on the mat and the cat sat again"
    df = spark.createDataFrame(
        [(i, typical) for i in range(9)] + [(9, "zzqq jjxx vvkk wwyy")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    scores = [rows[i]["typicality"] for i in range(10)]
    assert all(0.0 < s <= 1.0 for s in scores)
    # the mojibake-ish doc is the statistical outlier
    assert scores[9] == min(scores)
    # margin, not just ordering: the outlier's own bigrams are in the
    # model too (tiny alphabet), so the gap is real but bounded
    assert scores[0] > 1.2 * scores[9]


def test_pack_sequences_layout(spark):
    from google_analytics_to_s3_spark.operators.curation import pack_sequences

    docs = [
        (1, "s", " ".join(["w"] * 300)),
        (2, "s", " ".join(["w"] * 300)),
        (3, "s", " ".join(["w"] * 100)),
        (10, "t", " ".join(["w"] * 600)),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    rows = {r["doc_id"]: r for r in
            pack_sequences(df, budget=512).collect()}
    # shard s: doc1 at 0 (fits), doc2 at 300 (straddles 512), doc3 at 600
    assert (rows[1]["pack_id"], rows[1]["offset_in_pack"],
            rows[1]["spans_boundary"]) == (0, 0, False)
    assert (rows[2]["pack_id"], rows[2]["spans_boundary"]) == (0, True)
    assert (rows[3]["pack_id"], rows[3]["offset_in_pack"]) == (1, 88)
    # shard t packs independently from offset 0
    assert (rows[10]["pack_id"], rows[10]["offset_in_pack"],
            rows[10]["spans_boundary"]) == (0, 0, True)


def test_mixture_sample_rates_and_split(spark):
    from google_analytics_to_s3_spark.operators.curation import mixture_sample
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh", "some words here")
         for i in range(2000)],
        ["doc_id", "lang", "text"],
    )
    out = mixture_sample(df, {"en": 1.0, "zh": 0.25}).cache()
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == 1000            # rate 1.0 keeps everything
    assert 150 < by_lang["zh"] < 350        # ~25% of 1000, hash-binomial
    splits = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert splits["val"] < splits["train"]  # ~5% val
    # determinism: same inputs -> identical kept set
    again = mixture_sample(df, {"en": 1.0, "zh": 0.25})
    assert out.exceptAll(again).count() == 0
    out.unpersist()


def test_vocab_stats_min_count_and_oov(spark):
    from google_analytics_to_s3_spark.operators.curation import vocab_stats

    df = spark.createDataFrame(
        [
            (1, "apple apple apple banana"),
            (2, "apple apple banana cherry"),
            (3, "apple banana banana dragonfruit"),
        ],
        ["doc_id", "text"],
    )
    vocab, per_doc = vocab_stats(df, min_count=3)
    v = {r["word"]: r["corpus_count"] for r in vocab.collect()}
    assert v == {"apple": 6, "banana": 4}  # cherry/dragonfruit below cut
    rows = {r["doc_id"]: r for r in per_doc.collect()}
    assert rows[1]["n_oov"] == 0 and rows[1]["oov_rate"] == 0.0
    assert rows[2]["n_oov"] == 1 and rows[2]["oov_rate"] == 0.25
    assert rows[3]["n_words"] == 4 and rows[3]["n_oov"] == 1


def test_scd2_versions_runs_and_intervals(spark):
    from google_analytics_to_s3_spark.operators.scd import scd2_versions

    obs = spark.createDataFrame(
        [
            (1, "A", 10, 100),
            (1, "A", 20, 101),  # no change -> folded into v1
            (1, "B", 30, 102),  # change -> v2
            (1, "A", 40, 103),  # back to A -> v3 (runs, not distinct)
            (2, "X", 10, 200),
        ],
        ["k", "attr", "eff", "tb"],
    )
    rows = {(r["k"], r["version_n"]): r for r in
            scd2_versions(obs, "k", "attr", "eff", "tb").collect()}
    assert len(rows) == 4
    v1, v2, v3 = rows[(1, 1)], rows[(1, 2)], rows[(1, 3)]
    assert (v1["attr"], v1["valid_from"], v1["valid_to"]) == ("A", 10, 30)
    assert (v2["attr"], v2["valid_from"], v2["valid_to"]) == ("B", 30, 40)
    assert (v3["attr"], v3["valid_to"], v3["is_current"]) == ("A", None, True)
    assert not v1["is_current"] and not v2["is_current"]
    assert rows[(2, 1)]["is_current"]


def test_value_histograms_degenerate_span(spark, tmp_path):
    """A constant-valued event_type must land all rows in bin 0 on BOTH
    engines (the unguarded formula hits 0/0 -> NaN, which Spark and
    DuckDB floor differently)."""
    import datetime

    from google_analytics_to_s3_spark.plans.driver_queries_curation import (
        SQL_VALUE_HISTOGRAMS,
        q_value_histograms,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(t0, "constant", 7.5, i) for i in range(5)] + [
        (t0, "varying", float(i), i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value", "user_id"])
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    out = {
        (r["event_type"], r["bin"]): r["n"]
        for r in q_value_histograms(spark, str(tmp_path)).collect()
    }
    assert out[("constant", 0)] == 5
    assert ("constant", None) not in out
    assert sum(n for (t, _), n in out.items() if t == "varying") == 20

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    ora = {
        (t, b): n
        for t, b, n in con.execute(SQL_VALUE_HISTOGRAMS).fetchall()
    }
    assert ora == out


def test_scd2_versions_null_attribute_transitions(spark):
    """NULL is an ordinary attribute value: NULL->a, a->NULL and runs
    of NULLs must version like any other change (the naive `prev !=
    attr` predicate silently drops them)."""
    from google_analytics_to_s3_spark.operators.scd import scd2_versions

    obs = spark.createDataFrame(
        [
            (1, None, 10, 100),  # v1: starts NULL
            (1, None, 20, 101),  # run of NULLs -> folded
            (1, "A", 30, 102),   # v2: NULL -> A
            (1, None, 40, 103),  # v3: A -> NULL
            (2, "X", 10, 200),   # v1
            (2, None, 20, 201),  # v2: X -> NULL
        ],
        "k int, attr string, eff int, tb int",
    )
    rows = {(r["k"], r["version_n"]): r for r in
            scd2_versions(obs, "k", "attr", "eff", "tb").collect()}
    assert len(rows) == 5
    assert rows[(1, 1)]["attr"] is None
    assert (rows[(1, 1)]["valid_from"], rows[(1, 1)]["valid_to"]) == (10, 30)
    assert rows[(1, 2)]["attr"] == "A"
    assert rows[(1, 3)]["attr"] is None and rows[(1, 3)]["is_current"]
    assert rows[(2, 2)]["attr"] is None and rows[(2, 2)]["is_current"]


def test_hll_users_raw_path_parity_and_accuracy(spark, tmp_path):
    """With ~20k distinct users every register fills (V=0), forcing the
    raw-HLL branch that sf0.01 (150 users -> linear counting) never
    exercises: both engines must agree bit-for-bit AND stay within the
    ~3.25% relative-error envelope of p=10 HLL."""
    import datetime

    import duckdb

    from google_analytics_to_s3_spark.plans.driver_queries_curation import (
        SQL_HLL_USERS,
        q_hll_users,
    )

    t0 = datetime.datetime(2024, 1, 1)
    n = 20_000
    rows = [(t0, "view", 1.0, i) for i in range(n)]
    spark.createDataFrame(
        rows, ["ts", "event_type", "value", "user_id"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    got = q_hll_users(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["occupied"] == 1024  # raw branch: no empty registers
    assert abs(r["hll_estimate"] - n) / n < 0.1
    assert r["exact_users"] == n

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    ora = con.execute(SQL_HLL_USERS).fetchall()
    assert len(ora) == 1
    assert ora[0][1] == r["occupied"]
    assert ora[0][2] == r["hll_estimate"]
    assert ora[0][3] == r["exact_users"]


def test_dsir_weights_separate_target_from_background(spark):
    """DSIR: documents drawn from the target word distribution must
    outscore background documents, and scores are finite/deterministic."""
    from google_analytics_to_s3_spark.operators.curation import dsir_weights

    en = "the quick brown fox jumps over the lazy dog and runs home"
    de = "der schnelle braune fuchs springt ueber den faulen hund heim"
    rows = [
        (0, "en", en), (1, "en", en + " again and again"),
        (2, "de", de), (3, "de", de + " nochmal und nochmal"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_weights(
            d, d.filter("lang = 'en'")
        ).collect()
    }
    assert len(out) == 4
    assert min(out[0], out[1]) > max(out[2], out[3]), out


def test_upsample_mixture_copies_and_determinism(spark):
    """upsample_mixture: integer rates give exact copy counts, the
    fractional part picks a stable hash-subset (re-run identical),
    rate<1 downsamples, absent stratum drops."""
    from google_analytics_to_s3_spark.operators.curation import (
        upsample_mixture,
    )

    df = spark.createDataFrame(
        [(i, ["en", "de", "fr", "zh"][i % 4]) for i in range(400)],
        "doc_id long, lang string",
    )
    rates = {"en": 2.0, "de": 1.5, "fr": 0.5}
    out = upsample_mixture(df, rates).collect()
    again = upsample_mixture(df, rates).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # exact integer rate: every en doc exactly twice, numbered 1..2
    en_docs = {r["doc_id"] for r in by_lang["en"]}
    assert len(by_lang["en"]) == 2 * len(en_docs) == 200
    assert {r["copy_n"] for r in by_lang["en"]} == {1, 2}
    # fractional: de between 1x and 2x, roughly 1.5x
    n_de_docs = len({r["doc_id"] for r in by_lang["de"]})
    assert n_de_docs == 100
    assert 100 < len(by_lang["de"]) < 200
    # downsample: fr docs appear at most once, roughly half
    fr = by_lang["fr"]
    assert len(fr) == len({r["doc_id"] for r in fr})
    assert 20 < len(fr) < 80
    # absent stratum drops entirely
    assert "zh" not in by_lang


def test_logreg_quality_learns_planted_signal(spark, sf_smoke):
    """The integer-grid GD must actually LEARN: marker-frequency weight
    ends positive, distinct-ratio weight negative (planted docs repeat
    the marker), and the scored predictions separate the planted half
    perfectly on the smoke corpus."""
    import pyspark.sql.functions as F

    from google_analytics_to_s3_spark.plans.driver_queries import QUERIES
    from google_analytics_to_s3_spark.plans.driver_queries_curation import (
        q_logreg_quality,
    )
    from google_analytics_to_s3_spark.operators.curation import (
        logreg_train_scores,
    )
    from google_analytics_to_s3_spark.operators.text import tokens
    from google_analytics_to_s3_spark.sources.testdata import load_parallel

    scored = q_logreg_quality(spark, sf_smoke)
    acc = scored.select(
        F.avg(
            (F.col("pred").cast("long") == F.col("label")).cast("double")
        )
    ).first()[0]
    # sf0.001 is ~10x smaller than the oracle SF (where separation is
    # perfect, acc 1.0 verified against the oracle); three rounds on
    # the tiny corpus land ~0.9 — assert clear separation, not
    # perfection
    assert acc >= 0.85, acc

    # weight signs: rebuild the same features and inspect the weights
    d = load_parallel(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    )
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" spamspam" * 16)),
        ).otherwise(F.col("text")).alias("text"),
    )
    t = tokens("text")
    X = 1_000_000
    feats = planted.select(
        "doc_id",
        F.lit(X).cast("long").alias("x0"),
        F.call_function(
            "div", F.lit(X) * F.size(F.array_distinct(t)), F.size(t)
        ).alias("x1"),
        F.call_function(
            "div",
            F.lit(X) * F.size(F.filter(t, lambda x: x == F.lit("spamspam"))),
            F.size(t),
        ).alias("x2"),
        (F.col("doc_id") % 2 == 0).cast("long").alias("y"),
    )
    w, _ = logreg_train_scores(feats, ["x0", "x1", "x2"], "y", rounds=3)
    spark.catalog.clearCache()
    assert w[2] > 0, w     # marker frequency pushes toward "planted"
    assert w[1] < 0, w     # high distinct ratio pushes toward "clean"
