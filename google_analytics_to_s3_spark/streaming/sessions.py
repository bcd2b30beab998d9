"""Structured Streaming sessionization (SURVEY.md §2.10, build-plan M6).

The reference has no true streaming engine — "streaming" is Kinesis
Firehose micro-batching (reference cloudformation/collector-ga.yaml:195-197)
plus per-file Lambda triggers, and sessions are recomputed nightly in
batch. This module is the idiomatic Spark extension the survey calls
for: ``readStream`` file source → ``session_window`` gap sessions with
a watermark for late data → append-mode sink. The batch W1–W5 window
chain (operators/sessionize.py) and this operator agree on session
boundaries: a session is a maximal run of events per visitor with gaps
below 30 minutes.

Scale notes
-----------
- State per visitor-session lives in the state store, keyed by
  (visitor, session_window); the watermark bounds state retention, so
  memory is O(active sessions), not O(history) — unlike the
  reference's recompute-the-world design.
- ``foreachBatch`` re-uses the batch transforms (plans/pipeline.py) per
  micro-batch, giving the Firehose-equivalent ingestion path with
  exactly-once parquet sinks via checkpointing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, StructField, StructType

STREAM_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_ms", LongType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = STREAM_EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of JSONL event envelopes (the S7 micro-batch
    reader, reference enrichment/adapters/sns_reader.py:10-55, as a
    Structured Streaming source). Schema explicit — inference is
    disabled just like the batch scan (S1)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.json(path)
    return df.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))


def stream_sessionize(
    events: DataFrame,
    visitor_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """W1–W5 wholesale via ``session_window`` + watermark.

    Emits one row per closed session: (visitor, session_start_ms,
    session_end_ms, n_events). In append mode a session is emitted once
    the watermark passes its window end (start of a gap ≥ ``gap`` after
    the last event), i.e. once it can no longer be extended by
    late-but-within-watermark events.
    """
    gap_ms = _duration_ms(gap)
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(visitor_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(visitor_col),
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            (F.unix_millis(F.col("w.end")) - F.lit(gap_ms)).alias(
                "session_end_ms"
            ),
            F.col("n_events"),
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with bounded state (beyond-reference: the
    reference joins only within one batch file; Spark can correlate two
    live streams).

    Both sides carry a watermark and the join predicate bounds
    ``right_ts`` to [left_ts, left_ts + within], so the state store can
    expire buffered rows once the watermark passes — state is
    O(in-flight interval), not O(stream history). Pre-rename the
    non-key columns of one side; Spark will reject ambiguous names.
    """
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(r[key])


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state — the streaming
    counterpart of operators/dedup.dedup_exact for at-least-once
    sources (the reference's Firehose retries can duplicate records;
    the reference itself never dedups).

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    key state once the watermark passes, so state is O(keys per
    watermark window), not O(stream history) — the property that makes
    exact dedup viable on an unbounded stream.
    """
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


def _duration_ms(spec: str) -> int:
    n, unit = spec.split()
    mult = {
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(n) * mult


def write_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
) -> StreamingQuery:
    """Append-mode sink with checkpointed exactly-once semantics,
    drained with ``availableNow`` (the batch-like trigger; swap for
    ``processingTime='60 seconds'`` to mirror the reference's Firehose
    buffering, collector-ga.yaml:195-197)."""
    return (
        df.writeStream.outputMode(output_mode)
        .format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def write_foreach_batch(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
) -> StreamingQuery:
    """``foreachBatch`` runner: apply the batch pipeline transforms to
    each micro-batch (EP2/EP3 enrichment reuse)."""
    return (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
