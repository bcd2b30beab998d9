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
