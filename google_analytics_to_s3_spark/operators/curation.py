"""Corpus-curation operators for LLM training-data pipelines.

The curation stages a 100 TB text pipeline runs between ingestion and
tokenization, each expressed as native Catalyst plans with DuckDB-
reproducible arithmetic (see plans/driver_queries_curation.py for the
oracle mirrors):

- PII detection + redaction (regex scan/replace — emails, phones,
  IPv4), the compliance pass every crawl corpus needs.
- Gopher/C4-flavored heuristic quality signals (word stats, repetition,
  alpha fraction) with a keep/drop verdict — the cheap filter that runs
  before any model-based scoring.
- Benchmark-contamination screening: word n-gram overlap between the
  corpus and a held-out eval set, the decontamination join every
  training run needs (inverted-index equi-join on shingle digests,
  never an all-pairs comparison).
- Corpus-statistics typicality scoring (CCNet-style): a char-bigram
  language model trained ON the corpus scores each document by mean
  within-corpus bigram probability; outliers (mojibake, binary spill,
  wrong-language text) score low. The probability accumulator runs on
  a floor(p * 2^30) integer grid so partial-aggregation order cannot
  perturb the result and any SQL engine reproduces it bit-for-bit.
- Training-data assembly: GPT-style concat-and-chunk sequence packing
  (per-shard window cumsum, integer-exact pack layout) and
  deterministic temperature-mixture sampling with a hash-stable
  train/val split.

Scale notes: every stage is one or two hash-partitioned aggregations
over (doc_id, token)-grain rows; only fixed-width digests / small ints
shuffle (document text never leaves the scan stage except inside the
map-side projection); the bigram model is O(alphabet^2) rows and is
broadcast. The synthetic documents table has no natural PII, so the
PII query plants deterministic addresses/numbers first — mirrored
literally in the oracle — exactly like similarity.planted_copies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles
from .text import tokens

# Patterns restricted to syntax Java regex and RE2 (DuckDB) both accept
# (no lookaround, no \b): good-enough recall for crawl-corpus hygiene;
# swap in a dedicated scrubber for regulated data.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"

# (pattern, replacement) in application order — emails first so their
# digit runs can't be half-eaten by the later numeric patterns.
PII_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
]


def plant_pii(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Append deterministic PII to a synthetic corpus (test scaffold).

    Every doc_id % 3 gets an email, % 5 a phone, % 7 an IPv4 — pure
    integer/string arithmetic the SQL oracle reproduces exactly
    (PLANT_PII_SQL must stay in lockstep).
    """
    i = F.col(id_col)
    s = i.cast("string")
    planted = F.concat(
        F.col(text_col),
        F.when(
            i % 3 == 0,
            F.concat(F.lit(" contact user"), s, F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            i % 5 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((i % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            i % 7 == 0,
            F.concat(
                F.lit(" from 10."),
                (i % 256).cast("string"),
                F.lit("."),
                ((i * 7) % 256).cast("string"),
                F.lit("."),
                ((i * 13) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    return df.withColumn(text_col, planted)


# oracle mirror of plant_pii — identical literals and concat order
PLANT_PII_SQL = """
text
|| CASE WHEN doc_id % 3 = 0
        THEN ' contact user' || doc_id || '@example.com now'
        ELSE '' END
|| CASE WHEN doc_id % 5 = 0
        THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        ELSE '' END
|| CASE WHEN doc_id % 7 = 0
        THEN ' from 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
             || '.' || ((doc_id * 13) % 256)
        ELSE '' END
"""


def pii_signals(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document PII counts + redacted text.

    Counts are taken on the raw text; redaction applies the rules in
    PII_RULES order. One map-side projection — no shuffle at all.
    """
    c = F.col(text_col)
    red = c
    for pat, rep in PII_RULES:
        red = F.regexp_replace(red, pat, rep)
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ips"),
        red.alias("redacted"),
    )


def quality_signals(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Gopher/C4-flavored heuristic quality columns + keep verdict.

    One explode over words then two hash aggregations ((doc, word) →
    doc); only (doc_id, word, count) rows shuffle. Signals: word count,
    distinct-word ratio (low = repetitive), top-word fraction (high =
    boilerplate/keyword stuffing), mean word length (extremes =
    non-linguistic), alphabetic-word fraction (low = markup/binary
    spill). Thresholds are the documented Gopher-rule shapes scaled to
    corpus stats; tune per corpus.
    """
    w = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    hist = w.groupBy(id_col, "word").agg(F.count("*").alias("c"))
    sig = hist.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_cnt"),
        F.sum(F.length("word") * F.col("c")).alias("char_sum"),
        F.sum(F.when(F.col("word").rlike("^[a-z]+$"), F.col("c"))
              .otherwise(F.lit(0))).alias("alpha_cnt"),
    )
    n = F.col("n_words").cast("double")
    return sig.select(
        F.col(id_col),
        F.col("n_words"),
        F.col("n_distinct"),
        F.round(F.col("n_distinct").cast("double") / n, 6)
         .alias("distinct_ratio"),
        F.round(F.col("top_cnt").cast("double") / n, 6).alias("top_word_frac"),
        F.round(F.col("char_sum").cast("double") / n, 6).alias("mean_word_len"),
        F.round(F.col("alpha_cnt").cast("double") / n, 6).alias("alpha_frac"),
        (
            (F.col("n_words") >= 30)
            & (F.col("top_cnt").cast("double") / n <= 0.15)
            & (F.col("n_distinct").cast("double") / n >= 0.45)
        ).alias("keep"),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style n-gram repetition signals (Rae et al. 2021 §A1.1):
    per document, the fraction of 2-/3-gram occurrences claimed by the
    single most frequent gram (``top{n}_frac`` — high = template/chant
    text) and the fraction of occurrences whose gram repeats at all
    (``dup{n}_frac`` — high = loops and boilerplate). The word-level
    complement of :func:`quality_signals`'s top-word fraction.

    Plan shape per n: one explode over shingles, then (doc, gram) →
    doc hash aggregations — only (doc_id, gram, count) rows shuffle,
    text never does. The n=2 and n=3 legs join on ``id_col`` AFTER
    both aggregations, so the join reuses the aggregation partitioning
    (no extra exchange at any scale). Docs shorter than n yield one
    whole-doc shingle: top_frac = 1, dup_frac = 0.
    """

    def leg(n: int) -> DataFrame:
        g = df.select(
            F.col(id_col),
            F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram"),
        )
        hist = g.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
        agg = hist.groupBy(id_col).agg(
            F.sum("c").alias("total"),
            F.max("c").alias("top"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
             .alias("dup"),
        )
        t = F.col("total").cast("double")
        return agg.select(
            F.col(id_col),
            F.col("total").alias(f"n{n}_grams"),
            F.round(F.col("top").cast("double") / t, 6).alias(
                f"top{n}_frac"
            ),
            F.round(F.col("dup").cast("double") / t, 6).alias(
                f"dup{n}_frac"
            ),
        )

    return leg(2).join(leg(3), id_col)


def contamination_pairs(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """(corpus doc, eval doc, shared n-gram count) decontamination join.

    Each side reduces to DISTINCT word n-gram digests (56-bit md5
    prefixes — the corpus text never shuffles); candidates come from an
    equi-join on the digest. The eval side is small by definition and
    broadcast. Output: one row per contaminated (doc, eval doc) pair
    with the shared-shingle count — the standard eval-overlap report.
    """
    def grams(df: DataFrame, out_id: str) -> DataFrame:
        sh = F.array_distinct(shingles(tokens(F.col(text_col)), n))
        return df.select(
            F.col(id_col).alias(out_id), F.explode(sh).alias("s")
        ).select(
            out_id,
            F.conv(F.substring(F.md5("s"), 1, 14), 16, 10)
             .cast("long").alias("h"),
        )

    c = grams(corpus, "doc_id")
    e = grams(eval_docs, "eval_doc_id")
    return (
        c.join(F.broadcast(e), "h")
        .filter(F.col("doc_id") != F.col("eval_doc_id"))
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


# Integer grid for the bigram-probability accumulator: floor(p * 2^30).
# p = cnt/total is one IEEE-exact double division; scaling by a power
# of two is exponent arithmetic (no rounding); floor is tie-free — so
# the quantized value is identical in any engine, and the per-document
# SUM is integer (order-independent under partial aggregation).
LM_SCALE = 1 << 30


def bigram_lm_scores(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Corpus-statistics typicality score per document (CCNet shape).

    Trains a char-bigram model on the corpus itself (P(c2|c1) =
    bigram_count / first_char_count — O(alphabet²) rows, broadcast) and
    scores each document by its mean within-corpus bigram probability.
    Low scores flag statistical outliers: mojibake, binary spill,
    wrong-language contamination. Plan: one explode to (doc, bigram)
    rows, (doc, bigram) and (bigram) hash aggregations, broadcast
    model join, integer-grid accumulate (see LM_SCALE).
    """
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - 1),
        lambda i: c.substr(i, F.lit(2)),
    )
    bi = df.select(F.col(id_col), F.explode(grams).alias("bg"))
    # r13 opt: the corpus model is derivable from the per-doc counts
    # (sum of c per bigram == count over the raw explode), so the
    # expensive explode pass runs ONCE behind a checkpoint of the
    # compact (doc, bigram, c) aggregate instead of once per consumer
    doc_bi = (
        bi.groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    model = doc_bi.groupBy("bg").agg(F.sum("c").alias("bg_cnt"))
    first_totals = model.groupBy(
        F.substring("bg", 1, 1).alias("c1")
    ).agg(F.sum("bg_cnt").alias("c1_cnt"))
    model_q = (
        model.withColumn("c1", F.substring("bg", 1, 1))
        .join(F.broadcast(first_totals), "c1")
        .select(
            "bg",
            F.floor(
                F.col("bg_cnt").cast("double")
                / F.col("c1_cnt").cast("double")
                * F.lit(float(LM_SCALE))
            ).alias("q"),
        )
    )
    return (
        doc_bi.join(F.broadcast(model_q), "bg")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.col("q")).alias("qsum"),
            F.sum("c").alias("n_bigrams"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            F.round(
                F.col("qsum").cast("double")
                / (F.col("n_bigrams").cast("double") * F.lit(float(LM_SCALE))),
                6,
            ).alias("typicality"),
        )
    )


DSIR_SCALE = 1 << 20
DSIR_BUCKETS = 4096


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS'23
    DSIR): score every raw document by how much its hashed-unigram
    distribution looks like the ``target`` corpus — the standard
    pretraining-data reweighting/selection step.

    Per bucket ``b`` (md5-hashed words into ``n_buckets``), the model
    weight is the smoothed log-likelihood ratio
    ``ln((target_count+1)/(raw_count+1))`` on a ``floor(·scale)``
    integer grid; a document's score is the feature-count-weighted mean
    of its buckets' weights. Positive → target-like, negative →
    background-like.

    Determinism: the only transcendental (ln) is evaluated ONCE per
    model bucket and immediately floored to the integer grid; document
    accumulation is pure BIGINT sums, so partial-aggregation order
    cannot perturb scores and any SQL engine reproduces them.

    Scale: two corpus-sized word aggregations (raw + target); the
    model is ≤ ``n_buckets`` rows, broadcast; nothing else shuffles
    but (doc, bucket, count) rows. Raise ``n_buckets`` with vocabulary
    size the way DSIR does (the paper uses 10k for unigrams).
    """

    def feats(df: DataFrame) -> DataFrame:
        word = F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("word")
        w = df.select(F.col(id_col), word).filter(F.length("word") > 0)
        bucket = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("g-"), F.col("word"))), 1, 14),
                16,
                10,
            ).cast("long")
            % n_buckets
        )
        return w.select(F.col(id_col), bucket.alias("b"))

    raw_f = feats(raw)
    n_r = raw_f.groupBy("b").agg(F.count("*").alias("cr"))
    n_t = feats(target).groupBy("b").agg(F.count("*").alias("ct"))
    model = (
        n_r.join(n_t, "b", "left")
        .select(
            "b",
            F.floor(
                F.lit(float(scale))
                * F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("cr") + 1).cast("double")
                )
            ).alias("q"),
        )
    )
    doc_counts = raw_f.groupBy(id_col, "b").agg(F.count("*").alias("c"))
    return (
        doc_counts.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("q")).alias("_qsum"),
        )
        .select(
            F.col(id_col),
            F.col("n_feats"),
            F.round(
                F.col("_qsum").cast("double")
                / (F.col("n_feats").cast("double") * F.lit(float(scale))),
                6,
            ).alias("dsir_score"),
        )
    )


# --------------------------------------------------------------------------
# Training-data assembly: sequence packing + mixture sampling
# --------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "source",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing metadata.

    Documents are concatenated in deterministic (partition, id) order
    and the token stream is chunked into ``budget``-token training
    sequences; each document lands at (pack_id, offset_in_pack) and may
    straddle one pack boundary (``spans_boundary``) — the standard
    trade that keeps packing a pure window computation instead of a
    stateful bin-packer. Packing runs independently PER ``part_col``
    (source shard), so the cumulative-sum window partitions by shard —
    no global sort, arbitrarily many shards pack in parallel at 100 TB.
    All arithmetic is integer (token counts), so any engine reproduces
    the layout exactly.
    """
    from pyspark.sql import Window

    from .text import token_count

    n = token_count(F.col(text_col))
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.select(
        F.col(id_col), F.col(part_col), n.cast("long").alias("n_tokens")
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    d = d.withColumn("start", start)
    # integer `div`, not float division: at 100 TB the token offset
    # exceeds 2^53 and double division would corrupt pack ids
    pack = F.expr(f"start div {budget}")
    end_pack = F.expr(f"(start + n_tokens - 1) div {budget}")
    return d.select(
        id_col,
        part_col,
        "n_tokens",
        pack.alias("pack_id"),
        (F.col("start") % budget).alias("offset_in_pack"),
        (pack != end_pack).alias("spans_boundary"),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic mixture sampling + train/val split per document.

    The temperature-rebalancing step of corpus assembly: each stratum
    (language/source) keeps a target fraction of its documents, chosen
    by an md5-derived hash of the id — reproducible on any engine and
    stable under re-runs/backfills (no RNG state). A second independent
    hash assigns train/val. Pure map-side projection; no shuffle.

    Returns the kept rows with (sample_hash, split) attached.
    """
    from .text import token_count

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 14), 16, 10
    ).cast("long") % 1_000_000
    h2 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#split"))),
            1, 14,
        ), 16, 10,
    ).cast("long") % 100
    rate = None
    for k, v in sorted(rates.items()):
        cond = F.when(F.col(stratum_col) == k, F.lit(int(v * 1_000_000)))
        rate = cond if rate is None else rate.when(
            F.col(stratum_col) == k, F.lit(int(v * 1_000_000))
        )
    rate = rate.otherwise(F.lit(0))
    return (
        df.select(
            F.col(id_col),
            F.col(stratum_col),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
            h.alias("sample_hash"),
            F.when(h2 < val_pct, F.lit("val")).otherwise(F.lit("train"))
             .alias("split"),
        )
        .filter(F.col("sample_hash") < rate)
    )


def vocab_stats(
    df: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Corpus vocabulary + per-document OOV rate.

    Stage one builds the vocabulary (words with corpus frequency >=
    min_count — one hash aggregation over (word) after a map-side
    partial agg). Stage two re-joins the word stream against the
    vocabulary to compute each document's out-of-vocabulary token rate
    — the tokenizer-coverage report run before committing to a vocab.
    The vocab is broadcast (it is the distinct-word set, orders of
    magnitude smaller than the corpus); document text never shuffles.

    Returns (vocab, per_doc) DataFrames.
    """
    w = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    vocab = (
        w.groupBy("word")
        .agg(F.count("*").alias("corpus_count"))
        .filter(F.col("corpus_count") >= min_count)
    )
    per_doc = (
        w.join(F.broadcast(vocab.select("word")).withColumn(
            "in_vocab", F.lit(1)), "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
             .alias("n_oov"),
        )
        .select(
            F.col(id_col),
            "n_words",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double")
                / F.col("n_words").cast("double"), 6
            ).alias("oov_rate"),
        )
    )
    return vocab, per_doc


def upsample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic mixture UPSAMPLING — the rates>1 half of
    temperature rebalancing that :func:`mixture_sample` (keep-rates
    <= 1) cannot express: a stratum with rate 2.5 emits every doc
    twice plus a third copy for the hash-chosen half, so epoch
    composition matches the target mixture without RNG state.

    Each doc emits ``floor(rate)`` copies + 1 more iff an md5-derived
    fraction of the id < frac(rate); rate 0 drops the stratum. Copies
    are numbered (``copy_n``) so downstream shuffles/packing can
    treat them as distinct rows.

    Pure map-side: one ``explode`` of a per-row sequence; fan-out =
    the mixture rate itself (bounded by design — a corpus rebalance
    uses single-digit rates). No shuffle, no RNG, replayable on any
    engine.
    """
    grid = 1_000_000
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#up"))),
                1, 14,
            ), 16, 10,
        ).cast("long")
        % grid
    )
    ncopies = None
    for k, v in sorted(rates.items()):
        base = int(v)
        frac = int(round((v - base) * grid))
        n = F.lit(base) + (h < F.lit(frac)).cast("int")
        cond = F.col(stratum_col) == k
        ncopies = (
            F.when(cond, n) if ncopies is None else ncopies.when(cond, n)
        )
    ncopies = ncopies.otherwise(F.lit(0))
    return (
        df.select(F.col(id_col), F.col(stratum_col), ncopies.alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            stratum_col,
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy_n"),
        )
    )


LOGREG_W_GRID = 1 << 20   # weight grid (power of two: exact scaling)
LOGREG_X_GRID = 1_000_000  # feature grid (matches the module's 1e6 grids)


def logreg_train_scores(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    rounds: int = 3,
    lr_den: int = 4,
    id_col: str = "doc_id",
):
    """Distributed logistic-regression training (full-batch gradient
    descent) with EXACT cross-engine arithmetic — the learned quality
    classifier of a curation pipeline (fastText-style filtering à la
    GPT-3/LLaMA data work), reduced to the only Spark shapes that
    scale: per round, ONE aggregate over the feature table computes
    the gradient; the (few) weights come back to the driver and
    re-enter the next round's plan as literals — the k×d "driver
    pull" pattern of the k-means trainer (similarity.py), here d×1.

    Exactness: true sigmoid needs exp(), whose libm/JVM ULP
    differences would break oracle parity — replaced by the
    hard-sigmoid surrogate clamp(z/4 + 1/2, 0, 1), which is rational,
    so every value stays on an integer grid: features on 1e6
    (callers build them with integer div), weights on 2^20, the
    per-row activation uses floor(z/2^22) — a power-of-two divide is
    EXACT in double, so floor is bit-identical everywhere — gradient
    sums are BIGINT (order-independent), and the weight update uses
    TRUNCATING integer division (Python // floors; SQL engines'
    integer '/' truncates — the update divides via abs to match what
    the oracle's `//` computes on negative gradients). Headroom:
    |err·x| <= 1e12/row, so int64 holds ~9e6 rows per partition-free
    sum — beyond that, pre-scale the error grid down.

    Labels must be 0/1 integers; ``features[feature_cols]`` integer
    columns on the 1e6 grid (bias column included by the caller).

    Returns ``(weights, scored)``: the final integer-grid weights and
    a per-row DataFrame with the final score ``z`` (BIGINT),
    ``pred`` (z > 0) — scoring is one map-side projection.
    """
    S, X = LOGREG_W_GRID, LOGREG_X_GRID
    w = [0] * len(feature_cols)
    feats = features.persist()
    for _ in range(rounds):
        z = None
        for wj, c in zip(w, feature_cols):
            term = F.lit(wj) * F.col(c)
            z = term if z is None else z + term
        h = F.greatest(
            F.lit(0),
            F.least(
                F.lit(X),
                F.floor(z / F.lit(float(4 * S))).cast("long")
                + F.lit(X // 2),
            ),
        )
        err = h - F.col(label_col) * F.lit(X)
        aggs = [
            F.sum(err * F.col(c)).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ] + [F.count("*").alias("n")]
        row = feats.agg(*aggs).first()
        n = row["n"]

        def tdiv(a: int, b: int) -> int:
            """Truncating int division (SQL semantics), b > 0."""
            q = abs(a) // b
            return q if a >= 0 else -q

        for j in range(len(w)):
            g = int(row[f"g{j}"])
            w[j] -= tdiv(tdiv(g, X) * S, X * n * lr_den)
    z = None
    for wj, c in zip(w, feature_cols):
        term = F.lit(wj) * F.col(c)
        z = term if z is None else z + term
    scored = feats.select(
        F.col(id_col),
        z.cast("long").alias("z"),
        (z > 0).alias("pred"),
        F.col(label_col).cast("long").alias("label"),
    )
    return w, scored


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "ws0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis A-Res key (IPL 2006): each row gets ``u^(1/w)`` for an
    md5-derived uniform ``u`` and weight ``w``; the k largest keys are
    a weight-proportional sample — exactly, not approximately, and
    deterministically (fixing the seed fixes the sample on any engine).

    The complement of :func:`mixture_sample`: that one keeps a FRACTION
    per stratum; this one keeps an exact COUNT with per-row weights
    (sample 10 M docs proportional to quality score). The top-k is
    orderBy+limit — Spark compiles it to TakeOrderedAndProject, a
    per-partition heap + driver merge of k rows, never a global sort
    exchange. Weights must be > 0 (u^(1/w) -> pow of a (0,1) uniform).

    Returns (id, weight, sample_key) for the k selected rows, ordered.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "#"),
                               F.col(id_col).cast("string"))),
                1, 14,
            ), 16, 10,
        ).cast("double")
        / F.lit(float(1 << 56))
    )
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.select(
            F.col(id_col),
            w.alias("weight"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), id_col)
        .limit(k)
        .select(
            id_col,
            "weight",
            F.round("_key", 6).alias("sample_key"),
        )
    )


SPLIT_HASH_SPACE = 100


def hash_split(
    df: DataFrame,
    key_col: str,
    bounds: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed key — the
    leakage-safe dataset split: membership depends only on the key, so
    re-runs, incremental appends, and different partitionings all send
    the same document to the same split (no row ever migrates between
    train and test across pipeline versions).

    ``bounds`` maps split name -> exclusive upper percentile in
    ascending order (default train<80, val<90, test<100). Pure
    map-side projection (md5 prefix -> bucket 0..99), zero shuffle;
    the split column is a partition/filter key downstream.
    """
    if bounds is None:
        bounds = {"train": 80, "val": 90, "test": 100}
    items = sorted(bounds.items(), key=lambda kv: kv[1])
    if items[-1][1] != SPLIT_HASH_SPACE:
        raise ValueError(f"last bound must be {SPLIT_HASH_SPACE}")
    # bounds must be strictly increasing positive ints: a duplicate or
    # non-positive bound would silently produce an EMPTY split (the
    # when-chain is keyed on strictly increasing thresholds)
    ubs = [ub for _, ub in items]
    if ubs[0] <= 0 or any(a >= b for a, b in zip(ubs, ubs[1:])):
        raise ValueError(
            f"bounds must be strictly increasing and positive, got "
            f"{dict(items)}"
        )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split-"),
                               F.col(key_col).cast("string"))),
                1, 10,
            ),
            16, 10,
        ).cast("long")
        % SPLIT_HASH_SPACE
    )
    # one when-chain over a single md5 evaluation (CSE folds the
    # repeated bucket references)
    expr = F.lit(items[-1][0])
    for name, ub in reversed(items[:-1]):
        expr = F.when(bucket < ub, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def neyman_allocation(
    df: DataFrame,
    stratum_cols: "list[str] | tuple[str, ...]",
    value_col: str,
    budget: int,
    id_col: str,
    seed: str = "ney",
) -> "tuple[DataFrame, DataFrame]":
    """Neyman-optimal stratified sampling: stratum h gets sample share
    proportional to ``N_h * S_h`` (size x std-dev) — the allocation
    that minimizes the variance of the estimated population mean at a
    fixed budget (Neyman 1934), vs the proportional allocation
    ``stratified_sample`` hardcodes.

    Pass 1 is one hash aggregation: per-stratum N and the exact
    integer sufficient statistics for the sample variance
    (``(n*Σx² - (Σx)²) / (n*(n-1))`` on DECIMAL(38), one sqrt).
    Allocation ``round(budget * N_h S_h / Σ N_h S_h)`` is clamped to
    ``N_h``; degenerate strata (n<2 or zero variance) allocate 0.
    Sampling is the deterministic md5-grid Bernoulli thinning at rate
    ``alloc_h / N_h`` on a 10^6 grid — map-side, reproducible across
    engines/partitionings (realized sizes are Binomial around the
    allocation; exact-size sampling would need a per-stratum rank).

    Returns ``(sampled_df, allocation_table)``; the allocation table
    (stratum..., n_rows, stddev, alloc, rate_ppm) is broadcast back
    for the filter — the fact table never shuffles.
    """
    scols = list(stratum_cols)
    v = F.col(value_col).cast("decimal(38,0)")
    stats = df.groupBy(*scols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(v).alias("_sx"),
        F.sum(v * v).alias("_sxx"),
    )
    n = F.col("n_rows").cast("decimal(38,0)")
    var = F.when(
        F.col("n_rows") > 1,
        (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
        / (n * (n - 1)).cast("double"),
    )
    # std-dev quantized to a 10^6 integer grid BEFORE the cross-stratum
    # total: the total is then an exact BIGINT sum (a cross-row sum of
    # irrational doubles would be addition-order-dependent and could
    # flip a round() boundary between engines)
    stats = stats.select(
        *scols, "n_rows",
        F.coalesce(
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))) * 1e6)
            .cast("long"),
            F.lit(0).cast("long"),
        ).alias("_sdq"),
    )
    total = stats.agg(
        F.sum(F.col("n_rows") * F.col("_sdq")).cast("long").alias("_tot")
    )
    alloc = (
        stats.crossJoin(F.broadcast(total))
        .select(
            *scols, "n_rows",
            (F.col("_sdq").cast("double") / F.lit(1e6)).alias("stddev"),
            F.least(
                F.col("n_rows"),
                F.when(
                    F.col("_tot") > 0,
                    F.round(
                        F.lit(float(budget))
                        * (F.col("n_rows") * F.col("_sdq")).cast("double")
                        / F.col("_tot").cast("double")
                    ).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ).alias("alloc"),
        )
        .withColumn(
            "rate_ppm",
            F.round(
                F.col("alloc").cast("double")
                / F.col("n_rows").cast("double") * 1e6
            ).cast("long"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.lit(seed),
                                  F.col(id_col).cast("string"))), 1, 14
            ), 16, 10,
        ).cast("long") % 1000000
    )
    sampled = (
        df.join(F.broadcast(alloc.select(*scols, "rate_ppm")), scols)
        .filter(u < F.col("rate_ppm"))
        .drop("rate_ppm")
    )
    return sampled, alloc
