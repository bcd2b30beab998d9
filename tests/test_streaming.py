"""Streaming sessionization must agree with the batch session_window
computation once the watermark closes all sessions."""

import json
import os

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.sources.testdata import load_events
from google_analytics_to_s3_spark.streaming.sessions import (
    read_events_stream,
    stream_sessionize,
    write_stream,
)

SENTINEL_USER = -1


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_sessionize_matches_batch(spark, sf_smoke, tmp_path):
    events = (
        load_events(spark, sf_smoke)
        .select("event_id", "user_id", "ts_ms")
        .filter(F.col("user_id") < 5)
    )
    rows = [r.asDict() for r in events.collect()]
    assert rows, "fixture slice empty"
    max_ts = max(r["ts_ms"] for r in rows)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # Batch 1: the real events.
    _write_jsonl(f"{in_dir}/part-0.json", rows)
    stream = read_events_stream(spark, in_dir)
    q = write_stream(
        stream_sessionize(stream, watermark_delay="1 minutes"), out_dir, ckpt
    )
    q.awaitTermination()

    # Batch 2: a far-future sentinel advances the watermark past every
    # real session's end, flushing them from the state store.
    _write_jsonl(
        f"{in_dir}/part-1.json",
        [
            {
                "event_id": 10**12,
                "user_id": SENTINEL_USER,
                "ts_ms": max_ts + 10 * 86400000,
            }
        ],
    )
    q = write_stream(
        stream_sessionize(read_events_stream(spark, in_dir), watermark_delay="1 minutes"),
        out_dir,
        ckpt,
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] != SENTINEL_USER
    }

    expected = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in (
            events.withColumn("ts", F.timestamp_millis("ts_ms"))
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.unix_millis("w.start").alias("session_start_ms"),
                (F.unix_millis(F.col("w.end")) - F.lit(30 * 60 * 1000)).alias(
                    "session_end_ms"
                ),
                "n_events",
            )
            .collect()
        )
    }
    assert got == expected
    assert len(got) > 0


def test_stream_static_broadcast_join(spark, sf_smoke, tmp_path):
    """Stream-static enrichment: each micro-batch joins the static dim
    (broadcast — no stream-side shuffle, no state store)."""
    events = (
        load_events(spark, sf_smoke)
        .select("event_id", "user_id", "ts_ms")
        .filter(F.col("user_id") < 5)
    )
    rows = [r.asDict() for r in events.collect()]
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_jsonl(f"{in_dir}/part-0.json", rows)

    dim = spark.read.parquet(f"{sf_smoke}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("user_id"),
        F.col("n_name").alias("user_nation"),
    )
    stream = read_events_stream(spark, in_dir)
    enriched = stream.join(F.broadcast(dim), "user_id", "left_outer")
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    assert got.count() == len(rows)
    nations = {
        r["user_id"]: r["user_nation"]
        for r in dim.filter(F.col("user_id") < 5).collect()
    }
    for r in got.select("user_id", "user_nation").distinct().collect():
        assert r["user_nation"] == nations[r["user_id"]]


def test_foreach_batch_reuses_batch_transforms(spark, sf_smoke, tmp_path):
    from google_analytics_to_s3_spark.operators.sessionize import sessionize
    from google_analytics_to_s3_spark.streaming.sessions import (
        write_foreach_batch,
    )

    events = (
        load_events(spark, sf_smoke)
        .select("event_id", "user_id", "ts_ms")
        .filter(F.col("user_id") < 3)
    )
    rows = [r.asDict() for r in events.collect()]
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_jsonl(f"{in_dir}/part-0.json", rows)

    def handle(batch_df, batch_id):
        out = sessionize(
            batch_df.drop("ts"),
            visitor_col="user_id",
            ts_col="ts_ms",
            tiebreak_cols=("event_id",),
        )
        out.write.mode("append").parquet(out_dir)

    q = write_foreach_batch(
        read_events_stream(spark, in_dir), handle, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    assert got.count() == len(rows)
    assert "visit_id" in got.columns


def test_stream_stream_interval_join(spark, tmp_path):
    """Two live streams (clicks, purchases) correlated within a
    30-minute interval; watermark + interval bound the join state."""
    from google_analytics_to_s3_spark.streaming.sessions import (
        stream_stream_join,
    )

    t0 = 1_700_000_000_000
    m = 60_000
    clicks = [
        {"event_id": 1, "user_id": 1, "ts_ms": t0},
        {"event_id": 2, "user_id": 1, "ts_ms": t0 + 40 * m},
        {"event_id": 3, "user_id": 2, "ts_ms": t0},
        {"event_id": 4, "user_id": 3, "ts_ms": t0},
    ]
    purchases = [
        # within 30 min of click 1 only
        {"event_id": 101, "user_id": 1, "ts_ms": t0 + 10 * m},
        # within 30 min of click 2 only (50m after click 1)
        {"event_id": 102, "user_id": 1, "ts_ms": t0 + 50 * m},
        # before any click of user 2 -> no match
        {"event_id": 103, "user_id": 2, "ts_ms": t0 - 5 * m},
        # user 4 has no clicks -> no match
        {"event_id": 104, "user_id": 4, "ts_ms": t0 + 1 * m},
    ]
    c_dir, p_dir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    _write_jsonl(f"{c_dir}/part-0.json", clicks)
    _write_jsonl(f"{p_dir}/part-0.json", purchases)

    c = read_events_stream(spark, c_dir).select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    p = read_events_stream(spark, p_dir).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    joined = stream_stream_join(
        c, p, key="user_id", left_ts="ts", right_ts="p_ts",
        within="30 minutes",
    ).select("user_id", "click_id", "purchase_id")

    out_dir = str(tmp_path / "out")
    q = write_stream(joined, out_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(1, 101), (2, 102)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once delivery duplicates collapse to one row per key."""
    from google_analytics_to_s3_spark.streaming.sessions import stream_dedup

    t0 = 1_700_000_000_000
    rows = [
        {"event_id": 1, "user_id": 1, "ts_ms": t0},
        {"event_id": 1, "user_id": 1, "ts_ms": t0},  # exact retry
        {"event_id": 2, "user_id": 1, "ts_ms": t0 + 60_000},
        {"event_id": 1, "user_id": 1, "ts_ms": t0 + 1_000},  # late retry
        {"event_id": 3, "user_id": 2, "ts_ms": t0},
    ]
    in_dir = str(tmp_path / "in")
    _write_jsonl(f"{in_dir}/part-0.json", rows)

    deduped = stream_dedup(
        read_events_stream(spark, in_dir), keys=["event_id"]
    ).select("event_id", "user_id", "ts_ms")
    out_dir = str(tmp_path / "out")
    q = write_stream(deduped, out_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    assert got.count() == 3
    assert {r["event_id"] for r in got.collect()} == {1, 2, 3}
