"""KMV distinct sketch with set operations (operators/stats.py)."""

import pytest
from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.stats import (
    kmv_overlap,
    kmv_sketches,
)
from google_analytics_to_s3_spark.sources.testdata import load_events

K = 64


def _sk_rows(df):
    return {(r["grp"], r["h"], r["r"]) for r in df.collect()}


def test_kmv_prune_is_lossless(spark, sf_smoke):
    e = load_events(spark, sf_smoke).select("event_type", "user_id")
    plain = kmv_sketches(e, "event_type", "user_id", k=K)
    pruned = kmv_sketches(e, "event_type", "user_id", k=K, prune_factor=8)
    assert _sk_rows(plain) == _sk_rows(pruned)


def test_kmv_prune_truncation_raises(spark, sf_smoke):
    e = load_events(spark, sf_smoke).select("event_type", "user_id")
    # prune_factor so small the threshold admits < k hashes for the
    # saturated groups -> the guard must refuse to return a biased sketch
    with pytest.raises(ValueError, match="prune"):
        kmv_sketches(e, "event_type", "user_id", k=K, prune_factor=0)


def test_kmv_union_merge_theorem(spark, sf_smoke):
    """The pairwise union sketch equals the sketch of the unioned
    streams — merge k-mins == k-mins of the merge."""
    e = load_events(spark, sf_smoke).select("event_type", "user_id")
    types = sorted(
        r["event_type"] for r in e.select("event_type").distinct().collect()
    )
    ta, tb = types[0], types[1]
    sk = kmv_sketches(e, "event_type", "user_id", k=K)
    pair = (
        kmv_overlap(sk, k=K)
        .filter((F.col("type_a") == ta) & (F.col("type_b") == tb))
        .collect()[0]
    )
    direct = kmv_sketches(
        e.filter(F.col("event_type").isin([ta, tb])).withColumn(
            "event_type", F.lit("_both")
        ),
        "event_type",
        "user_id",
        k=K,
    )
    n = direct.count()
    hk = direct.agg(F.max("h")).first()[0]
    assert pair["n_union"] == n
    exp = float(n) if n < K else (K - 1) * float(1 << 56) / float(hk)
    assert pair["est_union"] == pytest.approx(exp, abs=1e-4)


def test_kmv_estimates_within_bounds(spark, sf_smoke):
    """KMV relative error is ~1/sqrt(k-2); assert a loose 3-sigma band
    against exact distinct counts and exact intersections."""
    e = load_events(spark, sf_smoke).select("event_type", "user_id")
    sk = kmv_sketches(e, "event_type", "user_id", k=K)
    exact = {
        r["event_type"]: r["n"]
        for r in e.distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tol = 3.0 / (K - 2) ** 0.5
    for row in kmv_overlap(sk, k=K).collect():
        for t, est in ((row["type_a"], row["est_a"]),
                       (row["type_b"], row["est_b"])):
            assert abs(est - exact[t]) <= max(2, tol * exact[t]), (t, est)
        users = {
            t: {
                r["user_id"]
                for r in e.filter(F.col("event_type") == t)
                .select("user_id")
                .distinct()
                .collect()
            }
            for t in (row["type_a"], row["type_b"])
        }
        true_inter = len(
            users[row["type_a"]] & users[row["type_b"]]
        )
        true_union = len(users[row["type_a"]] | users[row["type_b"]])
        # intersection inherits union noise + binomial inclusion noise
        assert abs(row["est_intersection"] - true_inter) <= max(
            5, 3 * tol * true_union
        ), row


def test_kmv_merge_equals_whole_stream_sketch(spark, sf_smoke):
    """Merge theorem, batch form: sketch(first half) ⊎ sketch(second
    half) == sketch(everything)."""
    from google_analytics_to_s3_spark.operators.stats import kmv_merge

    e = load_events(spark, sf_smoke).select("event_type", "user_id",
                                            "event_id")
    a = kmv_sketches(e.filter("event_id % 2 = 0"),
                     "event_type", "user_id", k=K)
    b = kmv_sketches(e.filter("event_id % 2 = 1"),
                     "event_type", "user_id", k=K)
    whole = kmv_sketches(e, "event_type", "user_id", k=K)
    assert _sk_rows(kmv_merge(a, b, k=K)) == _sk_rows(whole)


def test_kmv_streaming_incremental_ingest(spark, tmp_path, sf_smoke):
    """The incremental-ingest pattern: foreachBatch folds each
    micro-batch's sketch into a standing sketch table with kmv_merge;
    after the stream drains, the standing sketch equals the one-shot
    batch sketch — no history re-scan, sketch-sized state only."""
    from google_analytics_to_s3_spark.operators.stats import kmv_merge

    e = load_events(spark, sf_smoke).select(
        "event_type", "user_id", "event_id"
    )
    src = str(tmp_path / "in")
    e.filter("event_id % 2 = 0").write.mode("overwrite").parquet(
        src + "/a.parquet"
    )
    e.filter("event_id % 2 = 1").write.mode("append").parquet(
        src + "/b.parquet"
    )
    standing = str(tmp_path / "sketch")

    def fold(batch_df, batch_id):
        sk = kmv_sketches(batch_df, "event_type", "user_id", k=K)
        try:
            prev = spark.read.parquet(standing)
            sk = kmv_merge(prev, sk, k=K)
        except Exception:
            pass
        sk.write.mode("overwrite").parquet(standing + ".next")
        spark.read.parquet(standing + ".next").write.mode(
            "overwrite"
        ).parquet(standing)

    q = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(standing)
    want = kmv_sketches(e, "event_type", "user_id", k=K)
    assert _sk_rows(got) == _sk_rows(want)


def test_global_index_validate_rejects_duplicates(spark):
    from google_analytics_to_s3_spark.operators.indexing import (
        assign_global_index,
    )

    dup = spark.createDataFrame([(1,), (2,), (2,)], ["k"])
    with pytest.raises(ValueError, match="duplicate"):
        assign_global_index(dup, "k", buckets=4, validate=True)
    ok = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    idx = sorted(
        r["global_idx"]
        for r in assign_global_index(ok, "k", buckets=4,
                                     validate=True).collect()
    )
    assert idx == [0, 1, 2]
