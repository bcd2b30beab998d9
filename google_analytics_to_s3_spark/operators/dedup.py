"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard. Beyond-reference capability,
designed shuffle-consciously for 100 TB:

- Signatures (minhash/simhash/fingerprints) are pure map-side
  expressions over the token/shingle arrays — no explode, no shuffle,
  computed inside codegen in one pass over the scan.
- Candidate generation shuffles only the (band, band_key) pairs —
  k/bands small strings per doc — never document text. The self-join
  per bucket is an equi-join Catalyst can plan as sort-merge with AQE
  skew splitting (hot buckets = near-duplicate clusters).
- All hashes are md5-derived so results are engine-portable (the
  DuckDB oracles compute identical values).

Cache ownership: the pair-generating operators ``persist()`` an
intermediate that feeds both sides of a self-join (and sometimes a size
table). The returned DataFrame is lazy, so the operator cannot unpersist
it — CALLERS own cleanup: after materializing the result, call
``spark.catalog.clearCache()`` (what bench.py does per query) or keep a
handle and ``unpersist()`` it. Long-lived drivers that skip this
accumulate cached blocks until storage eviction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

HEX = "0123456789abcdef"


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles; docs shorter than n yield one whole-doc
    shingle (so every doc has a non-empty shingle set).

    Formulated as an (n-1)-fold ``zip_with`` over shifted views of the
    token array — one O(len) pass building each shingle by string
    concat. Measured ~2x faster than the transform-over-indices +
    per-index ``slice`` version (which allocates an n-element array per
    position); identical output sets.
    """
    size = F.size(toks)
    m = size - (n - 1)  # number of shingles
    out = F.slice(toks, 1, m)
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(size >= n, out).otherwise(F.array(F.array_join(toks, " ")))


def minhash_signature(text: Column | str, k: int = 16, shingle_n: int = 3) -> Column:
    """k-way MinHash signature as an array of 56-bit integer minima.

    Carter-Wegman family: ``family_i(s) = h1(s) + i * h2(s)`` where
    h1/h2 are independent 56-bit ints parsed from md5 prefixes — two
    md5s per shingle instead of k (measured ~3x faster at sf0.1 than
    the md5-per-family formulation), md5-derived so the DuckDB oracle
    computes identical values. 56-bit h's keep ``h1 + (k-1)*h2`` well
    inside int64 for any practical k (no ANSI overflow).

    The md5s are materialized once per shingle via a ``transform`` into
    (h1, h2) structs; the fold then only does integer arithmetic —
    codegen CSE does not cross lambda scopes, so without the transform
    each of the k family lanes would recompute its md5.
    """
    sh = shingles(tokens(text), shingle_n)

    def h(s: Column, tag: str) -> Column:
        return F.conv(
            F.substring(F.md5(F.concat(s, F.lit(tag))), 1, 14), 16, 10
        ).cast("long")

    hs = F.transform(
        sh, lambda s: F.struct(h(s, "#a").alias("h1"), h(s, "#b").alias("h2"))
    )
    init = F.array_repeat(F.lit(2**62).cast("long"), k)
    return F.aggregate(
        hs,
        init,
        lambda acc, p: F.zip_with(
            acc,
            F.array(*[p["h1"] + F.lit(i) * p["h2"] for i in range(k)]),
            lambda a, b: F.least(a, b),
        ),
    )


def with_minhash(df: DataFrame, text_col: str = "text", k: int = 16) -> DataFrame:
    return df.withColumn("minhash", minhash_signature(text_col, k=k))


def _band_key(sig: Column, start: int, n: int) -> Column:
    """md5 digest of a signature slice (longs rendered as decimal
    strings joined with '|') — the bucket key that shuffles."""
    return F.md5(
        F.array_join(
            F.transform(F.slice(sig, start, n), lambda x: x.cast("string")),
            "|",
        )
    )


def lsh_bands(df: DataFrame, id_col: str, k: int = 16, bands: int = 4) -> DataFrame:
    """Explode the signature into (id, band, band_key) rows — the only
    data that shuffles in LSH dedup."""
    rows_per_band = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _band_key(
                    F.col("minhash"), b * rows_per_band + 1, rows_per_band
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return df.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, "bk.band", "bk.band_key"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket,
    with the minhash-estimated Jaccard similarity."""
    # Persist the signatures: they are tiny (k * 32 bytes/doc) and feed
    # both sides of the bucket self-join — without persist the whole
    # shingle+md5 subtree re-executes per consumer.
    sig = with_minhash(df.select(id_col, text_col), text_col, k=k).select(
        id_col, "minhash"
    ).persist()
    b = sig.select(id_col, "minhash", *[]).select(
        F.col(id_col),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        _band_key(
                            F.col("minhash"),
                            band * (k // bands) + 1,
                            k // bands,
                        ).alias("band_key"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "minhash", "bk.band", "bk.band_key")
    left, right = b.alias("l"), b.alias("r")
    est = F.size(
        F.filter(
            F.zip_with(F.col("l.minhash"), F.col("r.minhash"), lambda x, y: x == y),
            lambda e: e,
        )
    ).cast("double") / F.lit(float(k))
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .distinct()
    )


def simhash(text: Column | str, bits: int = 16) -> Column:
    """SimHash over whitespace tokens using md5-nibble bits.

    Bit b comes from hex digit b//4 of md5(token); the signature bit is
    the sign of the per-bit vote sum. Integer-only arithmetic → exact
    oracle parity.
    """
    # Per-bit fold over the token md5s. The md5 is nominally recomputed
    # per bit, but each fold is a flat codegen loop — measured 2x faster
    # at sf0.1 than a "compute each md5 once" array-of-bits formulation,
    # whose per-token array allocations cost more than the hashing.
    toks_md5 = F.transform(tokens(text), lambda t: F.md5(t))

    def bit_of(h: Column, b: int) -> Column:
        """Bit b (MSB-first within each hex digit) of md5 hex string h."""
        nib = (F.instr(F.lit(HEX), F.substring(h, b // 4 + 1, 1)) - 1).cast("int")
        return F.floor(nib / F.lit(2 ** (3 - b % 4))).cast("int") % 2

    def voter(b: int):
        return lambda acc, h: acc + bit_of(h, b) * 2 - 1

    votes = [F.aggregate(toks_md5, F.lit(0), voter(b)) for b in range(bits)]
    out = F.lit(0)
    for b, v in enumerate(votes):
        out = out + F.when(v > 0, F.lit(2**b)).otherwise(F.lit(0))
    return out


def with_simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    return df.withColumn("simhash", simhash(text_col, bits=bits))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: banded candidate generation +
    exact Hamming filter.

    Pigeonhole recall guarantee: two signatures with Hamming distance
    ≤ ``bands - 1`` must agree on at least one of the ``bands``
    contiguous bit-bands, so with ``max_hamming < bands`` no qualifying
    pair is missed. Only (band, band_value, id, signature) ints shuffle
    — never documents; the Hamming check is one xor+popcount."""
    if max_hamming >= bands:
        raise ValueError("recall guarantee requires max_hamming < bands")
    w = bits // bands
    mask = (1 << w) - 1
    sig = df.select(
        F.col(id_col), simhash(text_col, bits=bits).alias("sh")
    ).persist()
    banded = sig.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(sh, {b * w}) & {mask}").alias(
                            "bval"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "sh", "bk.band", "bk.bval")
    left, right = banded.alias("l"), banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("l.sh").bitwiseXOR(F.col("r.sh"))
            ).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = "source",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for doc pairs sharing at least one
    shingle (jaccard > 0), optionally blocked on a key.

    Inverted-index shape — the scalable formulation: explode shingles,
    equi-join on the shingle to count intersections, recover the union
    as |A| + |B| - |A∩B|. Shuffles (shingle, id) pairs, never whole
    documents, and pair work is proportional to actual overlap instead
    of all-pairs × set-ops. Skew note: at web scale, drop ultra-common
    shingles (stop-shingles) before the join — they dominate buckets
    and contribute little to similarity.
    """
    sh = F.array_distinct(shingles(tokens(text_col), n))
    base_cols = [F.col(id_col), sh.alias("sh")]
    if block_col:
        base_cols.append(F.col(block_col))
    d = df.select(*base_cols).persist()  # feeds sizes + both join sides
    sizes = d.select(F.col(id_col), F.size("sh").alias("n_sh"))

    ex_cols = [F.col(id_col), F.explode("sh").alias("s")]
    if block_col:
        ex_cols.insert(1, F.col(block_col))
    ex = d.select(*ex_cols)
    left, right = ex.alias("l"), ex.alias("r")
    cond = (F.col("l.s") == F.col("r.s")) & (
        F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    )
    if block_col:
        cond = (F.col(f"l.{block_col}") == F.col(f"r.{block_col}")) & cond
    inter = (
        left.join(right, cond)
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_thresholded(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ ``threshold`` pairs with prefix filtering
    (the AllPairs/PPJoin candidate-pruning technique) — the scale path
    for thresholded similarity joins.

    Shingles are put in a canonical rarest-first order (ascending
    global document frequency); a qualifying pair must share ≥
    ``ceil(t·|A|)`` shingles, so the smaller-id doc must share one of
    its first ``|A| - ceil(t·|A|) + 1`` shingles with the other doc —
    only that prefix is probed against the inverted index. Candidates
    then get the exact jaccard from an array intersect. Lossless
    (returns exactly the naive join's ≥ t pairs), but the join input
    shrinks from every (doc, shingle) pair to the rare-shingle
    prefixes, which is what keeps bucket sizes bounded at corpus scale.
    """
    sh = F.array_distinct(shingles(tokens(text_col), n))
    bcols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    # persist: the tokenize+shingle pass is the expensive map stage and
    # feeds both the frequency count and the per-doc ordering.
    base = df.select(*bcols, sh.alias("sh")).filter(F.size("sh") > 0).persist()
    names = [id_col] + ([block_col] if block_col else [])
    ex = base.select(*bcols, F.explode("sh").alias("s"))
    # document frequency per shingle: small after aggregation -> broadcast
    # back onto the exploded rows (no shuffle of the big side).
    freq = ex.groupBy("s").agg(F.count("*").alias("df_s"))
    ordered = (
        ex.join(F.broadcast(freq), "s")
        .groupBy(*names)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df_s", "s"))),
                lambda x: x["s"],
            ).alias("sh")
        )
        .persist()
    )
    t = float(threshold)
    sz = F.size("sh")
    plen = (sz - F.ceil(F.lit(t) * sz) + 1).cast("int")
    probe = ordered.select(
        F.col(id_col).alias("id_a"),
        *([F.col(block_col).alias("blk")] if block_col else []),
        sz.alias("sz_a"),
        F.explode(F.slice(F.col("sh"), F.lit(1), plen)).alias("s"),
    )
    index = ordered.select(
        F.col(id_col).alias("id_b"),
        *([F.col(block_col).alias("blk_b")] if block_col else []),
        sz.alias("sz_b"),
        F.explode("sh").alias("s"),
    )
    # size-compatibility: J(A,B) >= t forces t·|A| <= |B| <= |A|/t —
    # a free residual predicate that kills most candidates in the join.
    cond = (
        (probe["s"] == index["s"])
        & (F.col("id_a") < F.col("id_b"))
        & (F.col("sz_b") >= F.ceil(F.lit(t) * F.col("sz_a")))
        & (F.col("sz_b") * F.lit(t) <= F.col("sz_a"))
    )
    if block_col:
        cond = cond & (F.col("blk") == F.col("blk_b"))
    cand = probe.join(index, cond).select("id_a", "id_b").distinct()
    a = ordered.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = ordered.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id row per exact content hash (hash-groupBy —
    shuffles only (hash, id), not text)."""
    h = F.md5(F.col(text_col))
    ranked = df.withColumn("_h", h).withColumn(
        "_rk", F.row_number().over(Window.partitionBy("_h").orderBy(id_col))
    )
    return ranked.filter(F.col("_rk") == 1).drop("_h", "_rk")


def _dup_span_table(
    df: DataFrame, k: int, id_col: str, text_col: str, min_docs: int
) -> DataFrame:
    """(id, s, e) maximal duplicated-span table shared by
    :func:`duplicate_spans` and :func:`remove_duplicate_spans` — s/e
    are the first/last flagged k-gram START positions; the covered
    token range is [s, e + k - 1]. Persists the (id, pos, digest)
    projection (feeds the frequency agg and the join-back); caller
    owns cache cleanup."""
    toks = tokens(text_col)
    d = df.select(F.col(id_col), toks.alias("t"))
    kg = d.filter(F.size("t") >= k).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - k),
                lambda i: F.md5(F.concat_ws(" ", F.slice("t", i + 1, k))),
            )
        ).alias("pos", "g"),
    )
    dig = kg.select(
        id_col,
        "pos",
        F.conv(F.substring("g", 1, 14), 16, 10).cast("long").alias("h"),
    ).persist()
    dup = (
        dig.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    flagged = dig.join(dup, "h").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = flagged.withColumn(
        "_new",
        F.coalesce(
            (F.col("pos") - F.lag("pos").over(w) > k).cast("int"), F.lit(0)
        ),
    ).withColumn("_isl", F.sum("_new").over(w))
    return isl.groupBy(id_col, "_isl").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e")
    )


def duplicate_spans(
    df: DataFrame,
    k: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-substring detection (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22), distributed.

    The paper's suffix array is replaced by a hashed k-gram inverted
    index — the formulation that shards: every length-``k`` token
    window is digested (56-bit md5, engine-portable); a digest seen in
    ``>= min_docs`` distinct documents marks duplicated text; flagged
    windows whose token ranges overlap or touch merge into MAXIMAL
    duplicated spans per document (gaps-and-islands over start
    positions: a new island starts when the gap to the previous
    flagged start exceeds ``k``). Exact for duplicate runs of >= k
    tokens, modulo 56-bit collisions.

    Returns one row per input document: ``n_tokens``, ``n_dup_spans``,
    ``dup_tokens`` (union size of duplicated token ranges),
    ``dup_frac``.

    Scale notes: the only data-sized exchange is (digest, doc, pos) —
    one hash agg for document frequency, one equi-join back (flagged
    digests ∝ duplicated mass, not corpus). The span-merge window runs
    over flagged positions only. Document text never shuffles. The
    (doc, pos, digest) projection is persisted because it feeds both
    the frequency agg and the join-back — caller owns cache cleanup
    (module convention above).
    """
    toks = tokens(text_col)
    spans = _dup_span_table(df, k, id_col, text_col, min_docs)
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("_n_spans"),
        F.sum(F.col("e") - F.col("s") + k).alias("_dup_tokens"),
    )
    base = df.select(F.col(id_col), F.size(toks).cast("long").alias("n_tokens"))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("_n_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("_dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("_dup_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("dup_frac"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """The removal half of substring dedup (Lee et al. ACL'22): strip
    every duplicated >= k-token span from every document, keeping the
    unique text. Conservative all-occurrence removal — the variant a
    contamination/boilerplate scrub wants; a keep-one-occurrence
    policy needs a global occurrence order and is a different op.

    Returns one row per input document: ``cleaned`` (tokens outside
    every duplicated span, space-joined; '' when the whole doc is
    duplicated), ``n_tokens``, ``n_kept``. Matching is case-folded
    (the hash side normalizes like every dedup op here) but the kept
    text preserves the ORIGINAL casing — lowercasing never moves
    whitespace, so the original-case token at position i is exactly
    the text the normalized k-grams matched. Whitespace runs collapse
    to single spaces (the token grain; byte-exact reassembly would
    need offset tracking, a different op).

    Scale notes: on top of :func:`_dup_span_table`'s exchanges, spans
    aggregate to one array per affected doc (spans ∝ duplicated mass)
    and broadcast-or-hash join back onto the corpus by id; the token
    filter is then pure map-side (``F.filter`` with an ``exists`` over
    the span array — no explode of the corpus for reassembly).
    """
    spans = _dup_span_table(df, k, id_col, text_col, min_docs)
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("_spans")
    )
    toks = tokens(text_col, lowercase=False)
    joined = df.select(F.col(id_col), toks.alias("_t")).join(
        span_arr, id_col, "left"
    )
    sp = F.coalesce(
        "_spans", F.array().cast("array<struct<s:int,e:int>>")
    )
    idx = F.sequence(F.lit(0), F.size("_t") - 1)
    kept = F.filter(
        F.zip_with(
            "_t", idx, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
        ),
        lambda p: ~F.exists(
            sp,
            lambda r: (p["i"] >= r["s"]) & (p["i"] <= r["e"] + F.lit(k - 1)),
        ),
    )
    return joined.select(
        id_col,
        F.array_join(F.transform(kept, lambda p: p["t"]), " ").alias(
            "cleaned"
        ),
        F.size("_t").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept"),
    )


def fuzzy_dedup(
    df: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_iters: int = 25,
) -> DataFrame:
    """End-to-end MinHash fuzzy dedup — the composition production
    corpus builds run (candidates are estimates; clusters need exact
    verification; pairs aren't groups until a transitive closure):

      LSH band candidates (:func:`minhash_lsh_pairs`)
      → exact shingle-Jaccard verification ``>= threshold``
      → connected components (min-label propagation,
        :func:`..graph.connected_components`)
      → canonical keep-lowest-id per cluster.

    Returns one row per input document: ``component`` (lowest doc id
    reachable through verified near-duplicate pairs; own id for unique
    docs) and ``is_canonical`` (the row a dedup keep-pass retains).

    Scale notes: inherits the LSH exchange bound (band digests only),
    the verification join carries shingle arrays for CANDIDATE pairs
    only (∝ near-dup mass), and components iterate over the verified
    edge set (≪ corpus). The final left join is corpus-sized on the id
    column alone.
    """
    cand = minhash_lsh_pairs(df, id_col, text_col, k=k, bands=bands).select(
        "id_a", "id_b"
    )
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(text_col), shingle_n)).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(inter.cast("double") / union.cast("double") >= threshold)
        .select("id_a", "id_b")
    )
    # star contraction, not min-label propagation: propagation needs
    # diameter rounds and a template evolving across >max_iters crawl
    # snapshots (each version near-dup of its neighbor) forms exactly
    # such a chain — the O(log n)-round variant converges on any shape
    # for ~the same per-round primitives. Values are identical (both
    # fixpoints are the min-id transitive closure).
    from .graph import connected_components_star

    comps = connected_components_star(
        verified,
        src="id_a",
        dst="id_b",
        id_out=id_col,
        comp_out="_comp",
        max_iters=max_iters,
    )
    return (
        df.select(id_col)
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce("_comp", F.col(id_col)).cast("long").alias("component"),
            (F.coalesce("_comp", F.col(id_col)) == F.col(id_col)).alias(
                "is_canonical"
            ),
        )
    )


def dedup_against_reference(
    new_docs: DataFrame,
    reference: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental (cross-corpus) near-dup screen: flag each NEW
    document that is a verified near-duplicate of the EXISTING corpus
    — the admission check an incremental corpus build runs per crawl
    batch, where re-deduping the whole corpus from scratch would be
    O(corpus) per batch instead of O(batch).

    Same candidate/verify machinery as :func:`fuzzy_dedup` but across
    two tables: LSH band buckets of the new batch equi-join the
    reference's band buckets; candidates are verified with exact
    shingle Jaccard >= ``threshold``; no transitive closure (a new doc
    either matches the reference or it doesn't — components are the
    WITHIN-corpus problem).

    Returns one row per new document: ``matched_ref`` (lowest matching
    reference id, NULL if unique) and ``is_dup``.

    Scale notes: only band digests shuffle for candidate generation;
    the reference side's bands can be precomputed once and reused
    across batches (the "index"); shingle arrays travel for candidate
    pairs only. Signature frames persist (feed bands + verification)
    — caller owns cache cleanup (module convention above).
    """
    def prep(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.array_distinct(shingles(tokens(text_col), shingle_n)).alias(
                "sh"
            ),
            minhash_signature(text_col, k=k).alias("minhash"),
        ).persist()

    new_p, ref_p = prep(new_docs), prep(reference)
    nb = lsh_bands(new_p, id_col, k=k, bands=bands).alias("n")
    rb = lsh_bands(ref_p, id_col, k=k, bands=bands).alias("r")
    cand = (
        nb.join(
            rb,
            (F.col("n.band") == F.col("r.band"))
            & (F.col("n.band_key") == F.col("r.band_key")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"r.{id_col}").alias("ref_id"),
        )
        .distinct()
    )
    a = new_p.select(F.col(id_col).alias("new_id"), F.col("sh").alias("sh_a"))
    b = ref_p.select(F.col(id_col).alias("ref_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    matched = (
        cand.join(a, "new_id")
        .join(b, "ref_id")
        .filter(inter.cast("double") / union.cast("double") >= threshold)
        .groupBy("new_id")
        .agg(F.min("ref_id").alias("matched_ref"))
    )
    return (
        new_docs.select(F.col(id_col))
        .join(matched, new_docs[id_col] == matched["new_id"], "left")
        .select(
            id_col,
            F.col("matched_ref").cast("long").alias("matched_ref"),
            F.col("matched_ref").isNotNull().alias("is_dup"),
        )
    )
