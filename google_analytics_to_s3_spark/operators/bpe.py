"""Distributed BPE merge training — learn byte-pair-encoding merges
from a corpus, the tokenizer-training step of an LLM data pipeline
(Sennrich et al., ACL'16 "Neural Machine Translation of Rare Words
with Subword Units"). Beyond-reference capability.

The classic algorithm is a corpus-sized loop; the distributed form
exploits the standard factorization: BPE statistics depend only on the
WORD-FREQUENCY table, so the corpus pays exactly one word-count
aggregation and every merge round runs over the (tiny, vocab-sized)
weighted word table:

1. words → (word, freq) hash aggregation — the only corpus-sized step;
2. each word's symbol sequence is a space-delimited string
   (`" a b c "`); adjacent-pair counts come from one explode + hash
   agg over the word table, weighted by freq;
3. the best pair (max count; ties broken lexicographically so every
   engine agrees) is a 1-row aggregate CROSS-JOIN-broadcast onto the
   table — no driver collect;
4. the merge applies as a plain string replace over a WRAPPED-token
   representation: every symbol is stored as ``" sym "`` (own leading
   and trailing space), so adjacent tokens share no characters and the
   pair pattern ``" a  b "`` consumes exactly its two tokens. With a
   single shared delimiter space, replace's no-rescan-after-replacement
   rule would skip the second of two immediately adjacent occurrences
   (``[h,a,h,a]`` with pair (h,a) must become ``[ha,ha]``, not
   ``[ha,h,a]``); with wrapped tokens, left-to-right non-overlapping
   replacement IS the classic greedy merge, in every SQL engine —
   which is what makes the whole computation carry a full value oracle
   (chained CTEs replay each round bit-for-bit).

Scale notes: rounds are unrolled plans over the vocab table; each
round is one explode + one hash agg + one broadcast. At web scale the
word table is millions of rows where the corpus is billions of
documents — the round cost is independent of corpus size. The round-N
plan recomputes rounds 1..N-1's replaces (cheap string ops over the
vocab table); persist the seq table between rounds if the vocab itself
is huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 12,
) -> DataFrame:
    """(word, freq) over lowercase alpha words — the only corpus-sized
    aggregation BPE training needs."""
    w = docs.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("word")
    ).filter(
        (F.length("word") >= min_len) & (F.length("word") <= max_len)
    )
    return w.groupBy("word").agg(F.count("*").alias("freq"))


def bpe_apply(
    words: DataFrame,
    merges: DataFrame,
    n_merges: int,
    word_col: str = "word",
) -> DataFrame:
    """Encode words with a trained merge table — the tokenizer-apply
    step that turns the learned BPE into token sequences.

    Applies the ``n_merges`` learned merges in round order via the same
    wrapped-token replace as training (so encode ∘ train is exactly the
    classic greedy BPE). Each round is a 1-row broadcast joined with
    ``lit(True)`` LEFT OUTER — a round with no learned merge (vocab
    exhausted early) passes rows through unchanged instead of wiping
    the table the way a bare crossJoin against an empty side would.

    Returns the input plus ``tokens`` (array<string>) and ``n_tokens``.
    Scale: the corpus-sized encode is usually a broadcast-join of this
    VOCAB-sized result back onto documents — encode the vocab once,
    never re-derive per document.
    """
    seqs = words.withColumn(
        "_seq", F.regexp_replace(word_col, "(.)", " $1 ")
    )
    for r in range(1, n_merges + 1):
        m_r = merges.filter(F.col("merge_round") == r).select(
            F.col("a").alias("_ma"), F.col("b").alias("_mb")
        )
        seqs = (
            seqs.join(F.broadcast(m_r), F.lit(True), "left")
            .withColumn(
                "_seq",
                F.when(
                    F.col("_ma").isNotNull(),
                    F.expr(
                        "replace(_seq, concat(' ', _ma, '  ', _mb, ' '), "
                        "concat(' ', _ma, _mb, ' '))"
                    ),
                ).otherwise(F.col("_seq")),
            )
            .drop("_ma", "_mb")
        )
    return (
        seqs.withColumn("tokens", F.split(F.trim(F.col("_seq")), "  "))
        .withColumn("n_tokens", F.size("tokens"))
        .drop("_seq")
    )


def bpe_train_merges(words: DataFrame, n_merges: int = 3) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Returns (merge_round, a, b, cnt): per round, the merged symbol pair
    and its weighted occurrence count. Fully declarative — the best
    pair is a TakeOrdered 1-row subquery broadcast onto the seq table,
    never a driver collect.
    """
    seqs = words.select(
        F.regexp_replace("word", "(.)", " $1 ").alias("seq"),
        "freq",
    )
    out = None
    for r in range(1, n_merges + 1):
        pairs = (
            seqs.withColumn("s", F.split(F.trim(F.col("seq")), "  "))
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(s, 1, size(s) - 1), "
                        "(x, i) -> struct(x AS a, "
                        "element_at(s, i + 2) AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .select("p.a", "p.b", "freq")
        )
        counts = pairs.groupBy("a", "b").agg(F.sum("freq").alias("cnt"))
        best = counts.orderBy(F.desc("cnt"), "a", "b").limit(1)
        row = best.select(
            F.lit(r).alias("merge_round"), "a", "b", "cnt"
        )
        out = row if out is None else out.unionByName(row)
        seqs = (
            seqs.crossJoin(F.broadcast(best.select("a", "b")))
            .select(
                F.expr(
                    "replace(seq, concat(' ', a, '  ', b, ' '), "
                    "concat(' ', a, b, ' '))"
                ).alias("seq"),
                "freq",
            )
        )
    return out
