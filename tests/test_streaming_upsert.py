"""Streaming CDC upsert: snapshot maintenance semantics, batch-replay
idempotence, and torn-write isolation (streaming/upsert.py)."""

import json

from google_analytics_to_s3_spark.streaming.upsert import StreamingUpsertSink


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        rows, ["k", "val", "version", "is_deleted"]
    )


def _snap(sink):
    df = sink.read_snapshot()
    return {r["k"]: r["val"] for r in df.collect()} if df is not None else None


def test_upsert_sink_applies_batches_in_order(spark, tmp_path):
    sink = StreamingUpsertSink(spark, str(tmp_path / "snap"), ["k"])
    assert _snap(sink) is None
    sink(_mk_batch(spark, [(1, "a", 1, False), (2, "b", 1, False)]), 0)
    assert _snap(sink) == {1: "a", 2: "b"}
    # batch 1: update 2 (latest version wins inside the batch),
    # tombstone 1, insert 3
    sink(
        _mk_batch(
            spark,
            [
                (2, "b1", 2, False),
                (2, "b2", 3, False),
                (1, "a", 2, True),
                (3, "c", 1, False),
            ],
        ),
        1,
    )
    assert _snap(sink) == {2: "b2", 3: "c"}


def test_upsert_sink_replay_is_idempotent(spark, tmp_path):
    sink = StreamingUpsertSink(spark, str(tmp_path / "snap"), ["k"])
    sink(_mk_batch(spark, [(1, "a", 1, False)]), 0)
    b1 = _mk_batch(spark, [(1, "a2", 1, False), (2, "b", 1, False)])
    sink(b1, 1)
    first = _snap(sink)
    # crash-after-commit replay: same batch_id, same data → same bytes,
    # no double-apply
    sink(b1, 1)
    assert _snap(sink) == first == {1: "a2", 2: "b"}


def test_upsert_sink_ignores_torn_writes(spark, tmp_path):
    sink = StreamingUpsertSink(spark, str(tmp_path / "snap"), ["k"])
    sink(_mk_batch(spark, [(1, "a", 1, False)]), 0)
    # simulate a mid-write crash: v=1 data lands but no commit marker
    _mk_batch(spark, [(9, "zzz", 1, False)]).drop(
        "version", "is_deleted"
    ).write.parquet(str(tmp_path / "snap" / "v=1"))
    assert _snap(sink) == {1: "a"}
    # the replayed batch 1 merges against v=0, overwriting the torn dir
    sink(_mk_batch(spark, [(2, "b", 1, False)]), 1)
    assert _snap(sink) == {1: "a", 2: "b"}


def test_upsert_sink_streaming_end_to_end(spark, tmp_path):
    """availableNow JSON change stream → snapshot; rerun over the same
    checkpoint changes nothing."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"k": 1, "val": "a", "version": 1, "is_deleted": False},
        {"k": 2, "val": "b", "version": 1, "is_deleted": False},
        {"k": 1, "val": "a2", "version": 2, "is_deleted": False},
        {"k": 2, "val": "b", "version": 2, "is_deleted": True},
        {"k": 3, "val": "c", "version": 1, "is_deleted": False},
    ]
    (src / "changes.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    sink = StreamingUpsertSink(spark, str(tmp_path / "snap"), ["k"])
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("k INT, val STRING, version INT, "
                                    "is_deleted BOOLEAN")
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert _snap(sink) == {1: "a2", 3: "c"}
    run()
    assert _snap(sink) == {1: "a2", 3: "c"}
