"""The stateless curation stages (PII redaction, mixture sampling) must
run UNCHANGED under Structured Streaming and agree row-for-row with the
batch computation — the unified batch/stream property that lets one
curation codebase serve both the backfill and the live ingest path."""

import pyspark.sql.functions as F

from google_analytics_to_s3_spark.operators.curation import (
    mixture_sample,
    pii_signals,
    plant_pii,
)


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh", f"word{i} common text body")
         for i in range(n)],
        ["doc_id", "lang", "text"],
    )


def _stream_vs_batch(spark, tmp_path, build):
    batch_src = _docs(spark)
    batch_src.write.mode("overwrite").parquet(str(tmp_path / "in"))
    stream_src = (
        spark.readStream.schema(batch_src.schema)
        .parquet(str(tmp_path / "in"))
    )
    q = (
        build(stream_src)
        .writeStream.format("memory")
        .queryName("cur_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("cur_stream")
    want = build(batch_src)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_pii_redaction_streams_unchanged(spark, tmp_path):
    _stream_vs_batch(
        spark, tmp_path, lambda df: pii_signals(plant_pii(df))
    )


def test_mixture_sample_streams_unchanged(spark, tmp_path):
    _stream_vs_batch(
        spark, tmp_path,
        lambda df: mixture_sample(df, {"en": 1.0, "zh": 0.5}),
    )


def test_streaming_anomaly_flags_match_batch(spark, tmp_path):
    """Streaming volume monitoring: per-(type, day) counts aggregate on
    the stream with availableNow, then join the BATCH-trained robust
    thresholds (median/MAD — the stream-static broadcast pattern: the
    model is static, the traffic is not). Flags must equal the batch
    anomaly computation row-for-row."""
    import pyspark.sql.functions as F

    rows = []
    for day in range(30):
        n = 5 if day != 17 else 50  # planted burst
        for i in range(n):
            rows.append((day * 1000 + i, "click", day))
    src = spark.createDataFrame(rows, "event_id long, event_type string, day long")
    src.write.mode("overwrite").parquet(str(tmp_path / "in"))

    daily_batch = src.groupBy("event_type", "day").agg(
        F.count("*").alias("n")
    )
    med = daily_batch.groupBy("event_type").agg(
        F.percentile(F.col("n"), F.lit(0.5)).alias("med")
    )
    dev = daily_batch.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("n").cast("double") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad")
    )
    thresholds = med.join(mad, "event_type")  # the trained monitor

    stream = (
        spark.readStream.schema(src.schema).parquet(str(tmp_path / "in"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(thresholds), "event_type")
        .select(
            "event_type", "day", "n",
            (F.abs(F.col("n").cast("double") - F.col("med"))
             > 2.0 * F.col("mad")).alias("is_anomaly"),
        )
    )
    q = (
        stream.writeStream.format("memory").queryName("anom_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("anom_stream")
    assert got.count() == 30
    flagged = [r["day"] for r in got.filter(F.col("is_anomaly")).collect()]
    assert flagged == [17]
    want = (
        daily_batch.join(F.broadcast(thresholds), "event_type")
        .select(
            "event_type", "day", "n",
            (F.abs(F.col("n").cast("double") - F.col("med"))
             > 2.0 * F.col("mad")).alias("is_anomaly"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_count_min_sketch_streams_unchanged(spark, tmp_path):
    """count_min_build is a pure explode + hash aggregation, so the
    SAME function is the streaming sketch: counters accumulate across
    micro-batches (forced via maxFilesPerTrigger=1) and the final
    complete-mode table equals the batch sketch — the mergeability
    contract, exercised through the streaming engine."""
    from google_analytics_to_s3_spark.operators.stats import (
        count_min_build,
    )

    rows = [(i, f"w{i % 7}") for i in range(300)]
    batch_src = spark.createDataFrame(rows, ["i", "word"])
    # two files -> at least two micro-batches
    batch_src.filter("i % 2 = 0").write.mode("overwrite").parquet(
        str(tmp_path / "in" / "a.parquet")
    )
    batch_src.filter("i % 2 = 1").write.mode("append").parquet(
        str(tmp_path / "in" / "b.parquet")
    )
    stream_src = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in" / "*"))
    )
    q = (
        count_min_build(stream_src, "word", width=32)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("cms_stream")
    want = count_min_build(batch_src, "word", width=32)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_srm_guardrail_streams_unchanged(spark, tmp_path):
    """The SRM guardrail's data-sized half is a plain arm-count
    aggregation, which streams natively in complete mode; the k-row
    chi-square finalization (srm_from_counts) then runs against the
    standing counts exactly as it would against a batch aggregate —
    the streaming guardrail equals the one-shot batch check."""
    from google_analytics_to_s3_spark.operators.stats import (
        srm_check,
        srm_from_counts,
    )

    rows = [(i, "a" if i % 5 < 3 else "b") for i in range(400)]
    batch_src = spark.createDataFrame(rows, ["i", "arm"])
    batch_src.filter("i % 2 = 0").write.mode("overwrite").parquet(
        str(tmp_path / "in" / "a.parquet")
    )
    batch_src.filter("i % 2 = 1").write.mode("append").parquet(
        str(tmp_path / "in" / "b.parquet")
    )
    stream_src = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in" / "*"))
    )
    counts = stream_src.groupBy(F.col("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("srm_counts_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_srm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    weights = {"a": 1.0, "b": 1.0}
    got = srm_from_counts(spark.table("srm_counts_stream"), weights)
    want = srm_check(batch_src, "arm", weights)
    assert got.count() == want.count() == 2
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # 240/160 split is a real mismatch: the alarm must fire
    assert all(r["srm_alarm"] for r in got.collect())


def test_rollup_mart_streams_unchanged(spark, tmp_path):
    """StreamingRollupSink: per-batch partial aggregation + algebraic
    merge into the standing mart (versioned exactly-once dirs) must
    equal the one-shot batch rollup of the same rows — the incremental
    materialized-view contract, exercised through the engine across
    multiple micro-batches."""
    from google_analytics_to_s3_spark.streaming.upsert import (
        StreamingRollupSink,
    )

    rows = [(i, f"t{i % 3}", i * 7 % 50) for i in range(300)]
    batch_src = spark.createDataFrame(rows, ["i", "k", "v"])
    for part in range(3):  # three files -> multiple micro-batches
        batch_src.filter(F.col("i") % 3 == part).write.mode(
            "append"
        ).parquet(str(tmp_path / "in" / f"p{part}.parquet"))

    def partial(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("sv"),
            F.min("v").cast("long").alias("mn"),
            F.max("v").cast("long").alias("mx"),
        )

    sink = StreamingRollupSink(
        spark, str(tmp_path / "mart"), key_cols=["k"],
        partial_fn=partial, sum_cols=["n", "sv"],
        min_cols=["mn"], max_cols=["mx"],
    )
    stream = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in" / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sink.read_snapshot()
    want = partial(batch_src)
    assert got is not None
    assert sorted(map(tuple, got.select(*want.columns).collect())) == \
        sorted(map(tuple, want.collect()))
    # replay idempotence (crash between write and commit): re-running a
    # batch id against the sink re-derives the same snapshot from the
    # same base. Driven manually because the engine's file->batch
    # assignment order is not observable from outside.
    sink2 = StreamingRollupSink(
        spark, str(tmp_path / "mart2"), key_cols=["k"],
        partial_fn=partial, sum_cols=["n", "sv"],
        min_cols=["mn"], max_cols=["mx"],
    )
    b0 = batch_src.filter(F.col("i") < 150)
    b1 = batch_src.filter(F.col("i") >= 150)
    sink2(b0, 0)
    sink2(b1, 1)
    once = sorted(map(tuple, sink2.read_snapshot()
                      .select(*want.columns).collect()))
    sink2(b1, 1)  # replay
    again = sorted(map(tuple, sink2.read_snapshot()
                       .select(*want.columns).collect()))
    assert once == again == sorted(map(tuple, want.collect()))
