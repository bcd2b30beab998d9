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

    def _check(self, spark, rows, tiles, buckets=8, threshold=0):
        """threshold=0 forces the sketch path (the scale machinery
        under test); the small-n plain-window path is pinned identical
        by test_fast_path_matches_sketch_path."""
        from pyspark.sql import Window

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_ntiles,
        )

        df = spark.createDataFrame(rows, "k long, m long")
        got = exact_ntiles(
            df, [("m", "k", "score")], tiles=tiles, buckets=buckets,
            small_n_threshold=threshold,
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
        out = exact_ntiles(
            df, [("m", "k", "s")], tiles=5, buckets=4,
            small_n_threshold=0,
        )
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
            buckets=8, small_n_threshold=0,
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
        out = exact_ntiles(
            df, [("m", "k", "s")], tiles=5, buckets=8,
            small_n_threshold=0,
        )
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "SinglePartition" not in plan, plan
        assert "Join" not in plan, plan

    def test_fast_path_matches_sketch_path(self, spark):
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_ntiles,
        )

        rows = [(k, (k * 13) % 7) for k in range(97)]
        df = spark.createDataFrame(rows, "k long, m long")
        fast = exact_ntiles(df, [("m", "k", "s")], tiles=5)
        sketch = exact_ntiles(
            df, [("m", "k", "s")], tiles=5, buckets=8,
            small_n_threshold=0,
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, sketch.collect())
        )

    def test_cache_input_with_nondeterministic_lineage(self, spark):
        """cache_input=True pins a rand()-derived frame so the counts
        pass and the final job observe identical data — the documented
        remedy for nondeterministic lineage (r6 ADVICE)."""
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_ntiles,
        )

        df = (
            spark.range(200)
            .select(
                F.col("id").alias("k"),
                (F.rand() * 1000).cast("long").alias("m"),
            )
        )
        out = exact_ntiles(
            df, [("m", "k", "s")], tiles=4, buckets=8,
            small_n_threshold=0, cache_input=True,
        )
        rows = out.collect()
        # every tile present with the front-loaded sizes for n=200
        sizes: dict = {}
        for r in rows:
            sizes[r["s"]] = sizes.get(r["s"], 0) + 1
        assert sizes == {1: 50, 2: 50, 3: 50, 4: 50}


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
            df, "v", "k", ["g"], out_col="pr", buckets=8,
            small_n_threshold=0,
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
            df, "v", "k", ["g"], out_col="pr", buckets=8,
            small_n_threshold=0,
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
        out = exact_group_percent_rank(
            df, "v", "k", ["g"], "pr", 8, small_n_threshold=0
        )
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "SinglePartition" not in plan, plan
        assert "Join" not in plan, plan

    def test_boolean_group_column(self, spark):
        """Boolean group keys: Python str(True) != Spark CAST(true AS
        STRING) — the r6 ADVICE rendering-drift repro. The offsets map
        is now keyed by the Spark-rendered key collected from the
        counts pass, so every percent_rank must match SQL exactly
        (and never silently default to 0.0)."""
        from pyspark.sql import Window

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_percent_rank,
        )

        rows = [(k, k % 2 == 0, (k * 17) % 23) for k in range(40)]
        df = spark.createDataFrame(rows, "k long, g boolean, v long")
        got = exact_group_percent_rank(
            df, "v", "k", ["g"], out_col="pr", buckets=8,
            small_n_threshold=0,
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
        assert any(r["pr"] > 0 for r in got.collect())

    def test_string_tie_with_heavy_ties(self, spark):
        """String tiebreak + a heavy metric tie: percentile_approx
        cannot subdivide a non-numeric tie column, so the heavy value
        keeps one straggler bucket — still exact (r6 ADVICE: the old
        path raised CAST_INVALID_INPUT here)."""
        from pyspark.sql import Window

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_percent_rank,
        )

        rows = [(f"u{k:03d}", "g", 7) for k in range(60)] + [
            (f"v{k:03d}", "g", k % 5) for k in range(20)
        ]
        df = spark.createDataFrame(rows, "k string, g string, v long")
        got = exact_group_percent_rank(
            df, "v", "k", ["g"], out_col="pr", buckets=8,
            small_n_threshold=0,
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

    def test_group_fast_path_matches(self, spark):
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_percent_rank,
        )

        rows = [(k, f"g{k % 4}", (k * 7) % 19) for k in range(90)]
        df = spark.createDataFrame(rows, "k long, g string, v long")
        fast = exact_group_percent_rank(df, "v", "k", ["g"], "pr")
        sketch = exact_group_percent_rank(
            df, "v", "k", ["g"], "pr", 8, small_n_threshold=0
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, sketch.collect())
        )


class TestExactGroupQuantileDisc:
    def _want(self, rows, q):
        import math

        by_g: dict = {}
        for k, g, v in rows:
            by_g.setdefault(g, []).append((v, k))
        out = {}
        for g, vals in by_g.items():
            vals.sort()
            out[(g,)] = vals[math.ceil(q * len(vals)) - 1][0]
        return out

    def test_matches_rank_ceil_semantics(self, spark):
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_quantile_disc,
        )

        rows = [(k, f"g{k % 3}", (k * 31) % 40) for k in range(121)]
        df = spark.createDataFrame(rows, "k long, g string, v long")
        for q in (0.25, 0.5, 0.9, 1.0):
            for thr in (0, 4_000_000):  # sketch path and fast path
                got = exact_group_quantile_disc(
                    df, "v", "k", ["g"], q, buckets=8,
                    small_n_threshold=thr,
                )
                assert got == self._want(rows, q), (q, thr)

    def test_single_row_groups_and_q1(self, spark):
        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_quantile_disc,
        )

        rows = [(1, "a", 5), (2, "b", 9)]
        df = spark.createDataFrame(rows, "k long, g string, v long")
        assert exact_group_quantile_disc(
            df, "v", "k", ["g"], 0.5
        ) == {("a",): 5, ("b",): 9}

    def test_rejects_bad_q(self, spark):
        import pytest as _pytest

        from google_analytics_to_s3_spark.operators.indexing import (
            exact_group_quantile_disc,
        )

        df = spark.createDataFrame([(1, "a", 5)], "k long, g string, v long")
        with _pytest.raises(ValueError):
            exact_group_quantile_disc(df, "v", "k", ["g"], 0.0)
        with _pytest.raises(ValueError):
            exact_group_quantile_disc(df, "v", "k", ["g"], 1.5)


class TestRobustOutlierBounds:
    def test_median_mad_winsor(self, spark):
        from google_analytics_to_s3_spark.operators.features import (
            robust_outlier_bounds,
        )

        # group "a": values 0..20 around median 10, plus one whale
        rows = [(k, "a", k) for k in range(21)] + [(99, "a", 10_000)]
        df = spark.createDataFrame(rows, "k long, g string, v long")
        out = robust_outlier_bounds(df, "v", "k", ["g"], k=3.0)
        got = {r["k"]: r for r in out.collect()}
        # n=22 -> median = value at rank 11 = 10; devs sorted:
        # 0,1,1,...,10,10,9990 -> rank-11 dev = 5
        assert got[0]["_med"] == 10 and got[0]["_mad"] == 5
        thr = 3.0 * 1.4826 * 5
        assert got[99]["is_outlier"] is True
        assert got[99]["value_winsor"] == 10 + thr
        assert got[10]["is_outlier"] is False
        assert got[10]["value_winsor"] == 10.0

    def test_both_paths_agree(self, spark):
        from google_analytics_to_s3_spark.operators.features import (
            robust_outlier_bounds,
        )

        rows = [(k, f"g{k % 2}", (k * 37) % 101) for k in range(80)]
        df = spark.createDataFrame(rows, "k long, g string, v long")
        a = robust_outlier_bounds(df, "v", "k", ["g"])
        b = robust_outlier_bounds(
            df, "v", "k", ["g"], small_n_threshold=0, buckets=8
        )
        key = lambda r: (r["g"], r["k"])  # noqa: E731
        ra = sorted(map(tuple, a.select(sorted(a.columns)).collect()))
        rb = sorted(map(tuple, b.select(sorted(b.columns)).collect()))
        assert ra == rb
