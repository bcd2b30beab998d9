"""Distributed row-indexing operators: contiguous global index and the
deterministic training shuffle (operators/indexing.py)."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.indexing import (
    assign_global_index,
    shuffle_shards,
)
from google_analytics_to_s3_spark.sources.testdata import load_parallel


def test_global_index_contiguous_and_deterministic(spark, sf_smoke):
    d = load_parallel(spark, sf_smoke, "documents").select("doc_id")
    n = d.count()
    out = assign_global_index(d, "doc_id", buckets=16)
    idx = sorted(r["global_idx"] for r in out.collect())
    assert idx == list(range(n))
    # deterministic across independent invocations
    again = {
        r["doc_id"]: r["global_idx"]
        for r in assign_global_index(d, "doc_id", buckets=16).collect()
    }
    assert all(again[r["doc_id"]] == r["global_idx"] for r in out.collect())
    # bucket count must not change the CONTIGUITY contract, only the order
    idx8 = sorted(
        r["global_idx"]
        for r in assign_global_index(d, "doc_id", buckets=8).collect()
    )
    assert idx8 == list(range(n))


def test_global_index_respects_bucket_key_order(spark, sf_smoke):
    d = load_parallel(spark, sf_smoke, "documents").select("doc_id")
    out = assign_global_index(d, "doc_id", buckets=16)
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14),
               16, 10).cast("long") % 16
    )
    rows = (
        out.withColumn("_b", b)
        .orderBy("global_idx")
        .select("_b", "doc_id")
        .collect()
    )
    keys = [(r["_b"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_shuffle_shards_partitioned_permutation(spark, sf_smoke):
    d = load_parallel(spark, sf_smoke, "documents").select("doc_id")
    n = d.count()
    out = shuffle_shards(d, "doc_id", shards=8, seed="s0").collect()
    assert len(out) == n
    # every shard's positions are contiguous from 0
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # same seed -> identical placement; new seed -> a different shuffle
    same = shuffle_shards(d, "doc_id", shards=8, seed="s0").collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in same} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }
    other = shuffle_shards(d, "doc_id", shards=8, seed="s1").collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in other} != {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }


def test_indexing_plans_have_no_cartesian(spark, sf_smoke):
    d = load_parallel(spark, sf_smoke, "documents").select("doc_id")
    for df in (
        assign_global_index(d, "doc_id", buckets=16),
        shuffle_shards(d, "doc_id", shards=8),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_new_operators_handle_empty_and_degenerate_inputs(spark):
    """Empty frames and identical snapshots must yield empty results,
    not errors — the shapes a scheduled pipeline hits on quiet days."""
    from google_analytics_to_s3_spark.operators.merge import snapshot_diff
    from google_analytics_to_s3_spark.operators.stats import (
        kmv_overlap,
        kmv_sketches,
    )

    empty = spark.createDataFrame([], "grp STRING, k STRING")
    sk = kmv_sketches(empty, "grp", "k", k=8)
    assert sk.count() == 0
    assert kmv_overlap(sk, k=8).count() == 0

    e_idx = spark.createDataFrame([], "k LONG")
    assert assign_global_index(e_idx, "k", buckets=4).count() == 0
    assert shuffle_shards(e_idx, "k", shards=4).count() == 0

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id LONG, payload STRING"
    )
    assert snapshot_diff(snap, snap, ["id"], ["payload"]).count() == 0
    # single-group sketch: overlap has no pairs, not a crash
    one = spark.createDataFrame([("g", "x"), ("g", "y")],
                                "grp STRING, k STRING")
    assert kmv_overlap(
        kmv_sketches(one, "grp", "k", k=8), k=8
    ).count() == 0
    # weighted sample k larger than the corpus returns everything
    from google_analytics_to_s3_spark.operators.curation import (
        weighted_sample,
    )

    tiny = spark.createDataFrame([(1, 10), (2, 20)], "doc_id LONG, w LONG")
    assert weighted_sample(tiny, "w", 100).count() == 2


def test_shuffle_shards_writer_roundtrip(spark, sf_smoke, tmp_path):
    """The documented serving contract: write partitionBy(shard), read
    one shard back, stream in pos order — the example order is exactly
    what the in-memory shuffle assigned, on every rerun."""
    d = load_parallel(spark, sf_smoke, "documents").select("doc_id")
    out = shuffle_shards(d, "doc_id", shards=4, seed="io")
    path = str(tmp_path / "shards")
    out.write.partitionBy("shard").mode("overwrite").parquet(path)

    reread = spark.read.parquet(path)
    want = {
        (r["shard"], r["pos"]): r["doc_id"] for r in out.collect()
    }
    got = {
        (r["shard"], r["pos"]): r["doc_id"] for r in reread.collect()
    }
    assert got == want
    # per-shard pos sequences stream gap-free from 0
    one = (
        reread.filter("shard = 0").orderBy("pos").select("pos").collect()
    )
    assert [r["pos"] for r in one] == list(range(len(one)))


class TestExactNtiles:
    """exact_ntiles must be BIT-IDENTICAL to the SQL ntile window
    (front-loading rule, tiebreaks, heavy ties) while keeping every
    global-order sort out of the plan."""

    def _check(self, spark, rows, tiles, buckets=8):
        from pyspark.sql import Window

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_ntiles,
        )

        df = spark.createDataFrame(rows, "k long, m long")
        got = exact_ntiles(
            df, [("m", "k", "score")], tiles=tiles, buckets=buckets
        )
        w = Window.orderBy(F.col("m").asc(), F.col("k").asc())
        want = df.select(
            "k", "m", F.ntile(tiles).over(w).cast("int").alias("score")
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_unique_values(self, spark):
        rows = [(k, (k * 37) % 101) for k in range(101)]
        self._check(spark, rows, tiles=5)

    def test_heavy_ties(self, spark):
        # half the corpus shares one metric value: the tie must be
        # subdivided by the key cutpoints, and the ntile boundaries
        # inside the tied run must match SQL exactly
        rows = [(k, 7) for k in range(50)] + [
            (50 + k, k % 9) for k in range(53)
        ]
        self._check(spark, rows, tiles=5)

    def test_all_tied(self, spark):
        rows = [(k, 1) for k in range(23)]
        self._check(spark, rows, tiles=5)

    def test_n_smaller_than_tiles(self, spark):
        rows = [(k, 100 - k) for k in range(3)]
        self._check(spark, rows, tiles=5)

    def test_front_loading_exact(self, spark):
        # n = 11, k = 5 -> tile sizes 3,2,2,2,2 (first n%k tiles get
        # the extra row)
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_ntiles,
        )

        df = spark.createDataFrame(
            [(k, k) for k in range(11)], "k long, m long"
        )
        out = exact_ntiles(df, [("m", "k", "s")], tiles=5, buckets=4)
        sizes = {
            r["s"]: r["n"]
            for r in out.groupBy("s").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert sizes == {1: 3, 2: 2, 3: 2, 4: 2, 5: 2}

    def test_multi_spec_shares_passes(self, spark):
        from pyspark.sql import Window

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_ntiles,
        )

        rows = [(k, (k * 13) % 17, (k * 7) % 5) for k in range(60)]
        df = spark.createDataFrame(rows, "k long, a long, b long")
        got = exact_ntiles(
            df, [("a", "k", "sa"), ("b", "k", "sb")], tiles=4,
            buckets=8,
        )
        wa = Window.orderBy(F.col("a").asc(), F.col("k").asc())
        wb = Window.orderBy(F.col("b").asc(), F.col("k").asc())
        want = df.select(
            "k", "a", "b",
            F.ntile(4).over(wa).cast("int").alias("sa"),
            F.ntile(4).over(wb).cast("int").alias("sb"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_no_global_sort_in_plan(self, spark):
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_ntiles,
        )

        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 10).alias("m")
        )
        out = exact_ntiles(df, [("m", "k", "s")], tiles=5, buckets=8)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "SinglePartition" not in plan, plan
        assert "Join" not in plan, plan


class TestExactGroupPercentRank:
    def test_matches_sql_percent_rank(self, spark):
        from pyspark.sql import Window

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_percent_rank,
        )

        rows = [
            (k, f"g{k % 3}", (k * 31) % 40) for k in range(120)
        ] + [(200, "solo", 5)]  # single-row group -> 0.0
        df = spark.createDataFrame(rows, "k long, g string, v long")
        got = exact_group_percent_rank(
            df, "v", "k", ["g"], out_col="pr", buckets=8
        )
        w = Window.partitionBy("g").orderBy(
            F.col("v").asc(), F.col("k").asc()
        )
        want = df.select(
            "k", "g", "v", F.percent_rank().over(w).alias("pr")
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_heavy_ties_within_group(self, spark):
        from pyspark.sql import Window

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_percent_rank,
        )

        rows = [(k, "a" if k % 2 else "b", 7) for k in range(80)] + [
            (100 + k, "a", k % 4) for k in range(20)
        ]
        df = spark.createDataFrame(rows, "k long, g string, v long")
        got = exact_group_percent_rank(
            df, "v", "k", ["g"], out_col="pr", buckets=8
        )
        w = Window.partitionBy("g").orderBy(
            F.col("v").asc(), F.col("k").asc()
        )
        want = df.select(
            "k", "g", "v", F.percent_rank().over(w).alias("pr")
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_no_single_partition_exchange(self, spark):
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_percent_rank,
        )

        df = spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") % 11).alias("v"),
        )
        out = exact_group_percent_rank(df, "v", "k", ["g"], "pr", 8)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "SinglePartition" not in plan, plan
        assert "Join" not in plan, plan
