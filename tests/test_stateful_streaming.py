"""applyInPandasWithState sessionizer must agree with the batch
gap-session computation once per-user sentinels close every session."""

import json
import os

import pytest
from pyspark.sql import functions as F

from google_analytics_to_s3_spark.sources.testdata import load_events
from google_analytics_to_s3_spark.streaming.sessions import (
    read_events_stream,
)
from google_analytics_to_s3_spark.streaming.stateful import (
    stateful_sessionize,
)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stateful_sessionize_matches_batch(spark, sf_smoke, tmp_path):
    events = (
        load_events(spark, sf_smoke)
        .select("event_id", "user_id", "ts_ms")
        .filter(F.col("user_id") < 5)
    )
    rows = [r.asDict() for r in events.collect()]
    users = sorted({r["user_id"] for r in rows})
    max_ts = max(r["ts_ms"] for r in rows)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            stateful_sessionize(read_events_stream(spark, in_dir))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_jsonl(f"{in_dir}/part-0.json", rows)
    run_once()
    # one far-future sentinel PER USER closes every real session
    _write_jsonl(
        f"{in_dir}/part-1.json",
        [
            {"event_id": 10**12 + u, "user_id": u, "ts_ms": max_ts + 10 * 86400000}
            for u in users
        ],
    )
    run_once()

    flush_ts = max_ts + 10 * 86400000
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
        if r["session_start_ms"] != flush_ts
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


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_processor_logic_matches_apply_variant(spark, sf_smoke):
    """The SessionStatefulProcessor's emit logic (protobuf-free) must
    equal the applyInPandasWithState sessionizer's on the same event
    stream, driven directly with a fake ValueState — so the algorithm
    is pinned even where the TWS plumbing can't run; and without
    protobuf the operator must gate cleanly instead of crashing the
    query mid-run."""
    import pandas as pd
    import pytest

    from google_analytics_to_s3_spark.streaming.stateful import (
        SessionStatefulProcessor,
        stateful_sessionize_tws,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    events = (
        load_events(spark, sf_smoke)
        .select("user_id", "ts_ms")
        .filter(F.col("user_id") < 5)
        .collect()
    )
    by_user = {}
    for r in events:
        by_user.setdefault(r["user_id"], []).append(r["ts_ms"])

    proc = SessionStatefulProcessor()
    got = set()
    for u, ts in by_user.items():
        proc.state = FakeState()
        # two chunks exercise cross-batch state carry
        half = len(ts) // 2
        for chunk in (ts[:half], ts[half:]):
            for out in proc.handleInputRows(
                (u,), iter([pd.DataFrame({"ts_ms": chunk})]), None
            ):
                got.update(map(tuple, out.itertuples(index=False)))
        # flush the trailing open session like the sentinel protocol
        start, last, n = proc.state.get()
        got.add((u, start, last, n))

    expected = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"],
         r["n_events"])
        for r in (
            spark.createDataFrame(
                [(u, t) for u, ts in by_user.items() for t in ts],
                "user_id LONG, ts_ms LONG",
            )
            .withColumn("ts", F.timestamp_millis("ts_ms"))
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.unix_millis("w.start").alias("session_start_ms"),
                (
                    F.unix_millis(F.col("w.end")) - F.lit(30 * 60 * 1000)
                ).alias("session_end_ms"),
                "n_events",
            )
            .collect()
        )
    }
    assert got == expected and len(got) > 0

    if not _has_protobuf():
        df = spark.createDataFrame([(1, 2)], "user_id LONG, ts_ms LONG")
        with pytest.raises(NotImplementedError, match="protobuf"):
            stateful_sessionize_tws(df)


@pytest.mark.skipif(
    not _has_protobuf(), reason="TWS state protocol needs protobuf"
)
def test_tws_sessionize_matches_batch(spark, sf_smoke, tmp_path):
    """The transformWithStateInPandas sessionizer must emit the same
    sessions as the applyInPandasWithState one (and therefore the
    batch computation) under the same sentinel-flush protocol."""
    from google_analytics_to_s3_spark.streaming.stateful import (
        stateful_sessionize_tws,
    )

    events = (
        load_events(spark, sf_smoke)
        .select("event_id", "user_id", "ts_ms")
        .filter(F.col("user_id") < 5)
    )
    rows = [r.asDict() for r in events.collect()]
    users = sorted({r["user_id"] for r in rows})
    max_ts = max(r["ts_ms"] for r in rows)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            stateful_sessionize_tws(read_events_stream(spark, in_dir))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_jsonl(f"{in_dir}/part-0.json", rows)
    run_once()
    _write_jsonl(
        f"{in_dir}/part-1.json",
        [
            {"event_id": 10**12 + u, "user_id": u,
             "ts_ms": max_ts + 10 * 86400000}
            for u in users
        ],
    )
    run_once()

    flush_ts = max_ts + 10 * 86400000
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"],
         r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
        if r["session_start_ms"] != flush_ts
    }
    expected = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"],
         r["n_events"])
        for r in (
            events.withColumn("ts", F.timestamp_millis("ts_ms"))
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.unix_millis("w.start").alias("session_start_ms"),
                (
                    F.unix_millis(F.col("w.end")) - F.lit(30 * 60 * 1000)
                ).alias("session_end_ms"),
                "n_events",
            )
            .collect()
        )
    }
    assert got == expected
    assert len(got) > 0
