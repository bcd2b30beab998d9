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
    ArrayType,
    BinaryType,
    DoubleType,
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("payload_sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_real_decoder: bool = False,
) -> DataFrame:
    """Image resize: binary → binary map at a fixed target geometry.

    Stub resize: the output payload is the input repeated/truncated to
    ``target_w * target_h`` bytes (1 byte/pixel stand-in) — a real
    implementation decodes, resamples, and re-encodes in the same
    ``mapInPandas`` body. Deterministic, so downstream exact-dedup over
    resized payloads is testable.
    """
    if use_real_decoder:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent here
            raise NotImplementedError(
                "real image resize needs PIL, which is not installed; "
                "use the deterministic stub (use_real_decoder=False)"
            ) from e
    size = target_w * target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, digests = [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) or b"\x00"
                out = (raw * (size // len(raw) + 1))[:size]
                payloads.append(out)
                digests.append(hashlib.sha256(out).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": pd.Series(payloads, dtype=object),
                    "payload_sha256": pd.Series(digests, dtype=object),
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _resize, schema=RESIZED_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_bytes: int = 64,
    sample_rate_hz: int = 16_000,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Audio feature extraction: payload → fixed-rate windowed feature
    vector (``array<double>``) + duration metadata.

    Stub features: per-window mean byte value (an "energy envelope") —
    a real implementation computes MFCC/log-mel per window with a DSP
    library in the same body. The Spark-side contract is the real
    one: bounded Arrow batches, one array column out, duration derived
    from payload length at ``sample_rate_hz`` (1 byte/sample stand-in).
    The feature column feeds the existing embedding operators
    (knn/LSH dedup) unchanged.
    """
    if use_real_decoder:
        try:
            import soundfile  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent here
            raise NotImplementedError(
                "real audio decode needs soundfile/libsndfile, which is "
                "not installed; use the stub (use_real_decoder=False)"
            ) from e

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_windows, durations, feats = [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                wins = [
                    raw[i : i + window_bytes]
                    for i in range(0, len(raw), window_bytes)
                ] or [b""]
                feats.append(
                    [sum(w) / len(w) if w else 0.0 for w in wins]
                )
                n_windows.append(len(wins))
                durations.append(len(raw) * 1000 // sample_rate_hz)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_windows": pd.Series(n_windows, dtype="int32"),
                    "duration_ms": pd.Series(durations, dtype="int64"),
                    "features": pd.Series(feats, dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema=AUDIO_FEATURE_SCHEMA
    )


def detect_shot_boundaries(
    frames: DataFrame,
    threshold: int = 16384,
    id_col: str = "doc_id",
) -> DataFrame:
    """Shot-boundary detection over sampled frames.

    The classic video-segmentation pass: a frame starts a new shot when
    its feature distance to the previous frame exceeds a threshold.
    Feature here is the stub frame "energy" — the first 16 bits of the
    frame digest (deterministic, oracle-reproducible); a real codec
    build would swap in a histogram/SSIM distance, the windowed plan is
    identical. Native Catalyst after the Arrow fan-out: one window over
    (doc, frame_idx) — frames of one document are already co-located.
    """
    from pyspark.sql import Window

    energy = F.conv(
        F.substring("frame_sha256", 1, 4), 16, 10
    ).cast("long")
    w = Window.partitionBy(id_col).orderBy("frame_idx")
    d = frames.select(
        F.col(id_col), "frame_idx", energy.alias("energy")
    ).withColumn("prev_e", F.lag("energy").over(w))
    d = d.withColumn(
        "is_boundary",
        F.col("prev_e").isNull()
        | (F.abs(F.col("energy") - F.col("prev_e")) > threshold),
    )
    wdoc = Window.partitionBy(id_col)
    return d.select(
        id_col,
        "frame_idx",
        "energy",
        "is_boundary",
        F.sum(F.col("is_boundary").cast("long")).over(wdoc)
         .alias("n_shots"),
    )
