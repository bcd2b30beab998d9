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
