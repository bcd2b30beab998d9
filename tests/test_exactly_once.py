"""Exactly-once foreachBatch delivery: replayed batch ids must not
duplicate rows; torn (uncommitted) writes stay invisible."""

import os

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.streaming.exactly_once import (
    IdempotentBatchSink,
    read_committed,
)


def test_replayed_batch_is_dropped(spark, tmp_path):
    base = str(tmp_path / "sink")
    sink = IdempotentBatchSink(base)
    b0 = spark.range(10).select(F.col("id"), F.lit("a").alias("v"))
    b1 = spark.range(10, 15).select(F.col("id"), F.lit("b").alias("v"))

    sink(b0, 0)
    sink(b1, 1)
    # crash-replay of batch 1 with identical data (the streaming
    # checkpoint contract): must be a no-op
    sink(b1, 1)
    assert sink.skipped_replays == 1

    got = read_committed(spark, base)
    assert got.count() == 15
    assert got.filter(F.col("v") == "b").count() == 5


def test_mid_write_crash_then_replay_overwrites(spark, tmp_path):
    """Crash AFTER the data write but BEFORE the marker: directory
    exists, marker doesn't. The replay must overwrite (not append) and
    then commit."""
    base = str(tmp_path / "sink")
    sink = IdempotentBatchSink(base)
    b0 = spark.range(8).select(F.col("id"), F.lit("x").alias("v"))

    # simulate the torn write: data only, no marker
    b0.write.mode("overwrite").parquet(sink.data_dir(0))
    assert not os.path.exists(os.path.join(base, "_commits", "0"))

    sink(b0, 0)  # replay completes the batch
    got = read_committed(spark, base)
    assert got.count() == 8  # overwrite semantics: no duplication
    assert sink.skipped_replays == 0


def test_streaming_end_to_end_exactly_once(spark, tmp_path):
    """availableNow file stream delivered via the sink; re-running the
    query over the same checkpoint delivers nothing twice."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    rows = [{"event_id": i, "user_id": i % 3, "ts_ms": 1_000_000 + i}
            for i in range(12)]
    (src / "f1.json").write_text("\n".join(json.dumps(r) for r in rows))

    from google_analytics_to_s3_spark.streaming.sessions import (
        read_events_stream,
    )

    base = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    sink = IdempotentBatchSink(base)

    def run():
        q = (
            read_events_stream(spark, str(src))
            .drop("ts")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert read_committed(spark, base).count() == 12
    # second run: checkpoint says everything is processed → no new
    # batches, still 12 rows
    run()
    assert read_committed(spark, base).count() == 12
