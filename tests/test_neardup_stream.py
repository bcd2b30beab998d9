"""Streaming near-dup ledger must agree with the batch canonical
mapping when originals arrive before their copies, and must keep
canonical provenance ACROSS micro-batches (the state-store property
dropDuplicates cannot give you)."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import Window

from google_analytics_to_s3_spark.operators.text import winnow_signature
from google_analytics_to_s3_spark.streaming.neardup import (
    stream_neardup_ledger,
)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ledger_matches_batch(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )
    originals = [r.asDict() for r in docs.collect()]
    copies = [
        {"doc_id": r["doc_id"] + 100000, "text": r["text"]}
        for r in originals
        if r["doc_id"] % 5 == 0
    ]

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir, exist_ok=True)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(in_dir)
    )

    def run_once():
        q = (
            stream_neardup_ledger(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: originals; batch 2: copies (state must remember batch 1)
    _write_jsonl(f"{in_dir}/part-0.json", originals)
    run_once()
    _write_jsonl(f"{in_dir}/part-1.json", copies)
    run_once()

    got = {
        (r["doc_id"], r["canonical_id"], r["is_novel"])
        for r in spark.read.parquet(out_dir).collect()
    }

    all_rows = spark.createDataFrame(
        originals + copies, "doc_id long, text string"
    )
    w = Window.partitionBy("sig")
    expected = {
        (r["doc_id"], r["canonical_id"], r["is_novel"])
        for r in all_rows.select(
            "doc_id", winnow_signature("text").alias("sig")
        )
        .select(
            "doc_id",
            F.min("doc_id").over(w).alias("canonical_id"),
            (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_novel"),
        )
        .collect()
    }
    assert got == expected
    # every planted copy was flagged non-novel (exact canonical id is
    # covered by the set equality above — the original itself may be a
    # signature-dup of an earlier doc)
    flagged = {d for d, _, novel in got if not novel}
    assert {c["doc_id"] for c in copies} <= flagged


def test_reference_screen_stream_matches_batch(spark, tmp_path):
    """The stream-static reference screen is stateless: the IDENTICAL
    plan over a file stream (availableNow) emits the same verified
    matches as the batch run; a planted near-copy of a reference doc
    is caught with its ref id, fresh docs pass."""
    import pyspark.sql.functions as F

    from google_analytics_to_s3_spark.streaming.neardup import (
        build_reference_index,
        reference_screen,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ref = spark.createDataFrame(
        [(i, f"{base} ref{i} tail{i}") for i in range(10)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, base + " ref3 other"),  # near-copy of ref 3
            (101, "completely different content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    ref_bands, ref_sh = build_reference_index(ref)
    # statics materialized once, as production would
    ref_bands.write.mode("overwrite").parquet(str(tmp_path / "bands"))
    ref_sh.write.mode("overwrite").parquet(str(tmp_path / "sh"))
    rb = spark.read.parquet(str(tmp_path / "bands"))
    rs = spark.read.parquet(str(tmp_path / "sh"))

    batch.write.mode("overwrite").parquet(str(tmp_path / "in"))
    stream_src = spark.readStream.schema(batch.schema).parquet(
        str(tmp_path / "in")
    )
    q = (
        reference_screen(stream_src, rb, rs, threshold=0.5)
        .writeStream.format("memory")
        .queryName("ref_screen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # collected-set compare: exceptAll over the memory-sink table hits
    # an INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND planner bug in Spark 4.1
    # when combined with dropDuplicates; the row sets are tiny here
    got_set = {
        (r["doc_id"], r["ref_id"], r["jaccard"])
        for r in spark.table("ref_screen").collect()
    }
    want_set = {
        (r["doc_id"], r["ref_id"], r["jaccard"])
        for r in reference_screen(batch, rb, rs, threshold=0.5).collect()
    }
    assert got_set == want_set and got_set
    rows = [
        {"doc_id": d, "ref_id": rid, "jaccard": j}
        for d, rid, j in got_set
    ]
    assert any(r["doc_id"] == 100 and r["ref_id"] == 3 for r in rows), rows
    assert not any(r["doc_id"] == 101 for r in rows)


def test_image_reference_screen_stream_matches_batch(spark, tmp_path):
    """The IMAGE reference screen (decode -> dHash -> banded
    stream-static join -> exact Hamming verify) is stateless: the
    identical plan over a file stream emits the same verified
    matches as the batch run. An exact re-encode of a reference
    image is caught at hamming 0; a visually distinct image passes."""
    import pandas as pd

    from google_analytics_to_s3_spark.streaming.neardup import (
        build_image_reference_index,
        image_reference_screen,
    )
    from google_analytics_to_s3_spark.testing.fixtures import make_ppm

    ref = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(10)),
        "payload": [make_ppm(18, 16, s, 1) for s in range(10)],
    }))
    idx = build_image_reference_index(ref)
    idx.write.mode("overwrite").partitionBy("band").parquet(
        str(tmp_path / "idx")
    )
    ridx = spark.read.parquet(str(tmp_path / "idx"))

    batch = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100, 101],
        # 100 = exact dup of reference seed 3; 101 = far seed
        "payload": [make_ppm(18, 16, 3, 1), make_ppm(18, 16, 131, 1)],
    }))
    batch.write.mode("overwrite").parquet(str(tmp_path / "in"))
    stream_src = spark.readStream.schema(batch.schema).parquet(
        str(tmp_path / "in")
    )
    q = (
        image_reference_screen(stream_src, ridx, max_hamming=0)
        .writeStream.format("memory")
        .queryName("img_screen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["ref_id"], r["hamming"])
        for r in spark.table("img_screen").collect()
    }
    want = {
        (r["doc_id"], r["ref_id"], r["hamming"])
        for r in image_reference_screen(batch, ridx,
                                        max_hamming=0).collect()
    }
    assert got == want and got
    assert (100, 3, 0) in got
    assert not any(d == 101 for d, _r, _h in got)
