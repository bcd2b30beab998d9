"""K-means centroid training (iterative DataFrame algorithm) and the
trained-IVF search path."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.similarity import (
    knn_brute_force,
    knn_ivf_trained,
    train_centroids_kmeans,
)
from google_analytics_to_s3_spark.sources.testdata import load_table


def _inertia(df, cents):
    """Mean cosine similarity of each vector to its assigned centroid
    (higher = tighter clusters)."""
    from google_analytics_to_s3_spark.operators.similarity import (
        _assign_from_list,
        _dot,
        _norm,
    )
    import math

    assigned = _assign_from_list(df, cents, "embedding", 1, "cid")
    by_cid = {cid: vec for cid, vec in cents}
    rows = assigned.select("vec_id", "embedding", "cid").collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    return sum(cos(list(r["embedding"]), by_cid[r["cid"]]) for r in rows) / len(
        rows
    )


def test_kmeans_deterministic_and_improving(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    c0 = train_centroids_kmeans(emb, n_centroids=4, n_iters=0)
    c3a = train_centroids_kmeans(emb, n_centroids=4, n_iters=3)
    c3b = train_centroids_kmeans(emb, n_centroids=4, n_iters=3)
    assert c3a == c3b  # decimal accumulators -> bit-identical runs
    assert len(c3a) == 4
    # training tightens clusters vs the untrained (seed) centroids
    assert _inertia(emb, c3a) >= _inertia(emb, c0)


def test_knn_ivf_trained_recall(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = knn_brute_force(emb, queries, k=3)
    approx = knn_ivf_trained(
        emb, queries, k=3, nprobe=2, n_centroids=4, n_iters=2
    )
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # IVF with multi-probe should recover a solid share of true top-3
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, recall
    # and every query returns k ranked rows
    counts = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_pq_trained_codebook_beats_first_k(spark):
    """Per-block Lloyd's training must reduce total quantization error
    vs the first-k init codebook (the property that justifies
    training); codes stay valid one-byte values."""
    from pyspark.sql import functions as F

    from google_analytics_to_s3_spark.operators.similarity import (
        PQ_K,
        pq_codebook,
        pq_encode,
        pq_train_codebook,
    )

    e = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")

    def total_err(cb):
        return (
            pq_encode(e, cb)
            .agg(F.sum("qerr").alias("s"))
            .first()["s"]
        )

    cb_trained = pq_train_codebook(e, n_iters=2)
    err_init = total_err(pq_codebook(e))
    err_trained = total_err(cb_trained)
    assert err_trained < err_init, (err_trained, err_init)

    codes = pq_encode(e, cb_trained).select(
        F.explode("codes").alias("c")
    )
    mn, mx = codes.agg(F.min("c"), F.max("c")).first()
    assert 0 <= mn and mx < PQ_K


def test_semdedup_two_clusters(spark):
    """SemDeDup on a planted two-cluster corpus: within-cluster dups
    drop (lowest id survives), cross-cluster look-alikes are never
    compared — the clustering IS the candidate filter."""
    from google_analytics_to_s3_spark.operators.similarity import semdedup

    def vec(axis, eps):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 4) % 8] = eps
        return v

    rows = [
        # cluster 0: ids 0,1,2 mutually ~identical; id 3 orthogonal-ish
        (0, vec(0, 0.00)), (1, vec(0, 0.01)), (2, vec(0, 0.02)),
        (3, [0.0, 0.0, 0.7, 0.0, 0.7, 0.0, 0.0, 0.0]),
        # cluster 1: ids 10,11 near-dups
        (10, vec(1, 0.00)), (11, vec(1, 0.01)),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = spark.createDataFrame(
        [(0, vec(0, 0.0)), (1, vec(1, 0.0))], ["vec_id", "embedding"]
    )
    out = {
        r["vec_id"]: (r["cid"], r["is_kept"])
        for r in semdedup(emb, cents, threshold=0.99).collect()
    }
    assert out[0] == (0, True)       # lowest id of the dup group
    assert out[1][1] is False and out[2][1] is False
    assert out[3][1] is True         # same cluster, below threshold
    assert out[10] == (1, True) and out[11][1] is False


def test_ivf_index_roundtrip_and_partition_pruning(spark, sf_smoke, tmp_path):
    """save_ivf_index → knn_ivf_indexed returns exactly what the
    in-session trained IVF returns (same deterministic k-means), and
    the probed-cell predicate reaches the scan as a PARTITION filter —
    unprobed cells are pruned before I/O."""
    from pyspark.sql import functions as F

    from google_analytics_to_s3_spark.operators.similarity import (
        knn_ivf_indexed,
        knn_ivf_trained,
        save_ivf_index,
    )
    from google_analytics_to_s3_spark.sources.testdata import load_parallel

    emb = load_parallel(spark, sf_smoke, "embeddings").filter(
        F.col("vec_id") < 200
    )
    queries = emb.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "ivf")
    save_ivf_index(emb, idx, n_centroids=8, n_iters=2)

    got_df = knn_ivf_indexed(spark, idx, queries, k=3, nprobe=2)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in got_df.collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf_trained(
            emb, queries, k=3, nprobe=2, n_centroids=8, n_iters=2
        ).collect()
    )
    assert got == want and got

    plan = got_df.sparkSession._jvm.PythonSQLUtils.explainString(
        got_df._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*cid", plan)
    assert m, plan
