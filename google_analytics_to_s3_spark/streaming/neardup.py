"""Streaming near-duplicate ledger: flag each arriving document as
novel or a duplicate of an earlier one, with provenance.

Beyond-reference operator (the reference has no document processing);
the LLM-training-data use case is an ingest firehose where duplicates
must be dropped ON ARRIVAL and every drop must name the document it
duplicated (for audit / backfill reversal). Spark's native
``dropDuplicates`` on a signature column does streaming exact dedup
but cannot emit the canonical mapping — that is what the custom
stateful operator adds.

Design: documents are keyed by their winnowing content signature
(operators/text.py:winnow_signature — md5 over the sorted winnow
fingerprint set, a high-threshold near-dup key). ``groupBy(sig).
applyInPandasWithState`` keeps one long per group — the canonical
(first-arrived, ties broken by id) doc_id — and emits a ledger row per
document. State is O(1) per distinct signature; groups distribute by
signature hash across executors, and only (doc_id, sig) rows reach the
stateful exchange — never text.

Banded-OR LSH semantics (duplicate if ANY band matches) would need a
second stateful stage over the band explosion; multiple stateful
operators in one streaming query are restricted, so that variant stays
a batch operator (operators/text.py:winnow_dup_pairs,
operators/similarity.py sign-LSH). Documented trade: the signature key
catches exact and profile-identical near-dups on the stream; fuzzier
matches are a nightly batch sweep.

On clusters, Spark 4's ``transformWithStateInPandas`` is the upgrade
path: per-signature ValueState with a TTL bounds the dedup horizon so
state stops growing with stream lifetime. Its Python worker needs
``google.protobuf``, which this container lacks (verified: the driver
worker crashes on import), so this repo ships and tests the
``applyInPandasWithState`` form only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.text import winnow_signature

LEDGER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sig", StringType()),
        StructField("canonical_id", LongType()),
        StructField("is_novel", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("canonical_id", LongType())])


def stream_neardup_ledger(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Per-document novelty ledger over a streaming DataFrame.

    Canonical id is first-arrival; within one micro-batch ties break to
    the smallest id, so feeding the whole corpus as one batch matches
    the batch semantics ``min(doc_id) over (partition by sig)``
    (asserted in tests/test_neardup_stream.py).
    """
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        winnow_signature(text_col, k=k, w=w).alias("sig"),
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (sig,) = key
        canon = state.get[0] if state.exists else None
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        rows = []
        for i in sorted(ids):
            if canon is None:
                canon = i
                rows.append((i, sig, i, True))
            else:
                rows.append((i, sig, canon, False))
        state.update((canon,))
        yield pd.DataFrame(
            rows, columns=["doc_id", "sig", "canonical_id", "is_novel"]
        )

    return keyed.groupBy("sig").applyInPandasWithState(
        fn,
        outputStructType=LEDGER_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Stream-static reference screen (the streaming twin of
# operators/dedup.dedup_against_reference)
# --------------------------------------------------------------------------

def build_reference_index(
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
):
    """(bands_df, shingles_df) for a standing corpus — the static side
    of :func:`reference_screen`. Persist both to parquet once per
    corpus version; every ingest micro-batch reuses them unchanged
    (that is the point: the index is amortized across batches)."""
    from ..operators.dedup import (
        lsh_bands,
        minhash_signature,
        shingles,
    )
    from ..operators.text import tokens

    sig = reference.select(
        F.col(id_col).alias("ref_id"),
        minhash_signature(text_col, k=k).alias("minhash"),
    )
    bands_df = lsh_bands(sig, "ref_id", k=k, bands=bands)
    shingles_df = reference.select(
        F.col(id_col).alias("ref_id"),
        F.array_distinct(shingles(tokens(text_col), shingle_n)).alias(
            "ref_sh"
        ),
    )
    return bands_df, shingles_df


def reference_screen(
    new_docs: DataFrame,
    ref_bands: DataFrame,
    ref_shingles: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Screen arriving documents against a STATIC reference corpus —
    stateless, so the identical plan runs as a batch job or a
    Structured Streaming query (stream-static equi-joins are append-
    mode safe; no watermark, no state store). Complements the
    stateful ledger above, which dedups WITHIN the stream: this
    catches "we already have this document in the training set".

    Emits verified matches (doc_id, ref_id, jaccard). A pair sharing
    several band buckets emits once per shared band (identical
    jaccard): collapsing those would need ``distinct()``, which on a
    stream means a state store — against the whole point of the
    stateless screen. The consumer dedups per micro-batch
    (foreachBatch ``dropDuplicates``/min-aggregate) when it picks the
    canonical match.

    Scale notes per micro-batch: band computation is map-side on the
    batch only; the joins touch the static index partitions matching
    the batch's band keys; shingle arrays travel for candidate pairs
    only. The reference index is built ONCE per corpus version
    (:func:`build_reference_index`), not per batch.
    """
    from ..operators.dedup import (
        lsh_bands,
        minhash_signature,
        shingles,
    )
    from ..operators.text import tokens

    prepped = new_docs.select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(text_col), shingle_n)).alias("sh"),
        minhash_signature(text_col, k=k).alias("minhash"),
    )
    nb = lsh_bands(prepped.select(id_col, "minhash"), id_col, k=k,
                   bands=bands)
    cand = nb.join(ref_bands, ["band", "band_key"]).select(
        F.col(id_col), "ref_id"
    )
    inter = F.size(F.array_intersect("sh", "ref_sh"))
    union = F.size("sh") + F.size("ref_sh") - inter
    return (
        cand.join(prepped.select(id_col, "sh"), id_col)
        .join(ref_shingles, "ref_id")
        .withColumn(
            "jaccard",
            F.round(inter.cast("double") / union.cast("double"), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(id_col, "ref_id", "jaccard")
    )


def build_image_reference_index(
    reference_payloads: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Banded perceptual-hash index over a standing IMAGE corpus —
    the static side of :func:`image_reference_screen`: REAL-decode +
    dHash every reference image (operators/multimodal.dhash_images),
    collapse to the distinct-hash table, and explode the 64-bit hash
    into four 16-bit band keys. Persist to parquet once per corpus
    version (partition by ``band`` so each micro-batch's join prunes
    to the band partitions it actually touches)."""
    from ..operators.multimodal import dhash_images

    hashed = (
        dhash_images(reference_payloads, id_col, payload_col)
        .filter(F.col("decode_error").isNull())
        .groupBy("phash_hi", "phash_lo")
        .agg(F.min(id_col).alias("ref_id"))
    )
    bands = []
    for i, (col, sh) in enumerate([
        ("phash_lo", 0), ("phash_lo", 16),
        ("phash_hi", 0), ("phash_hi", 16),
    ]):
        bands.append(
            hashed.select(
                F.col("ref_id"),
                F.col("phash_hi").alias("ref_hi"),
                F.col("phash_lo").alias("ref_lo"),
                F.lit(i).alias("band"),
                F.shiftright(F.col(col), sh)
                .bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def image_reference_screen(
    new_payloads: DataFrame,
    ref_band_index: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Screen arriving IMAGES against a static reference corpus — the
    perceptual twin of :func:`reference_screen`, stateless by the
    same design: dHash the micro-batch (Arrow ``mapInPandas`` works
    unchanged on streaming DataFrames), explode its four band keys,
    stream-static equi-join the banded index, exact Hamming verify
    (lossless for ``max_hamming`` < 4 by pigeonhole). Append-mode
    safe: no watermark, no state store; the identical plan runs
    batch or streaming. A pair sharing several bands emits once per
    shared band (identical hamming) — the consumer dedups per
    micro-batch, same contract as the text screen.

    Emits ``(doc_id, ref_id, hamming)`` per verified near-match."""
    from ..operators.multimodal import dhash_images

    hashed = dhash_images(new_payloads, id_col, payload_col).filter(
        F.col("decode_error").isNull()
    )
    bands = []
    for i, (col, sh) in enumerate([
        ("phash_lo", 0), ("phash_lo", 16),
        ("phash_hi", 0), ("phash_hi", 16),
    ]):
        bands.append(
            hashed.select(
                F.col(id_col),
                F.col("phash_hi").alias("hi"),
                F.col("phash_lo").alias("lo"),
                F.lit(i).alias("band"),
                F.shiftright(F.col(col), sh)
                .bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    ham = (
        F.bit_count(F.col("lo").bitwiseXOR(F.col("ref_lo")))
        + F.bit_count(F.col("hi").bitwiseXOR(F.col("ref_hi")))
    )
    return (
        banded.join(ref_band_index, ["band", "key"])
        .select(
            id_col, "ref_id", ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
