"""Multimodal (image / audio / video) columns: opaque ``binary``
payloads + typed metadata, with decode / feature-extract / frame-sample
as Arrow-batched ``mapInPandas`` operators.

Beyond-reference capability (the reference is clickstream-only); part
of the training-data-pipeline surface alongside operators/dedup.py and
operators/text.py.

The real codec libraries (PIL / libav / soundfile) are NOT in this
container, so the byte-level decode is STUBBED: metadata is derived
deterministically from the payload's sha256 digest. Everything
Spark-side — the binary column handling, Arrow batch transfer, schemas,
partition-preserving plumbing, and the 1→N frame fan-out shape — is
real and tested. A real decoder drops into the same ``mapInPandas``
body behind ``use_real_decoder=True`` (raises ``NotImplementedError``
until the library exists).

Scale notes: ``mapInPandas`` streams Arrow record batches — payloads
never materialize on the driver and per-executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary columns pass
through Parquet scans with predicate pushdown on the *metadata*
columns, so "select frames of videos longer than X" prunes before any
decode work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload_sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
        StructField("frame_sha256", StringType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (here: the UTF-8
    bytes of a text column — the stand-in for real image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_decoder: bool = False,
) -> DataFrame:
    """Decode image payloads → (n_bytes, sha256, width, height).

    Stub decode: width/height are the first two bytes of the sha256
    digest — deterministic, engine-portable (the driver oracle
    recomputes them in DuckDB with ``sha256``/hex-cast).
    """
    if use_real_decoder:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent here
            raise NotImplementedError(
                "real image decode needs PIL, which is not installed; "
                "use the deterministic stub (use_real_decoder=False)"
            ) from e

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf[payload_col].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "payload_sha256": digests,
                    "width": digests.map(lambda h: int(h[0:2], 16)).astype(
                        "int32"
                    ),
                    "height": digests.map(lambda h: int(h[2:4], 16)).astype(
                        "int32"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _decode, schema=IMAGE_META_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 16,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame sampling: 1→N fan-out per payload via mapInPandas.

    Stub sampling: frame i is the i-th ``frame_bytes`` slice of the
    payload, up to ``min(max_frames, ceil(len/frame_bytes))`` frames —
    the real implementation would seek keyframes with a codec. The
    output batch shape (multiple rows per input row, binary frame
    column + digest) is the real contract.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads, digests = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                n = min(max_frames, max(1, -(-len(raw) // frame_bytes)))
                for i in range(n):
                    chunk = raw[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    payloads.append(chunk)
                    digests.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": pd.Series(payloads, dtype=object),
                    "frame_sha256": pd.Series(digests, dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _sample, schema=FRAME_SCHEMA
    )
