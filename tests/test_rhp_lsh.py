"""Sign-LSH (random hyperplane) properties: candidates verified exactly,
planted near-dups always found, and the plan stays an equi-join."""

import re

import pyspark.sql.functions as F
import pytest

from google_analytics_to_s3_spark.operators.similarity import (
    _dot,
    _norm,
    planted_copies,
    rhp_dup_pairs,
)
from google_analytics_to_s3_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def planted(spark, sf_smoke):
    return planted_copies(load_table(spark, sf_smoke, "embeddings")).persist()


def _exact_pairs(df, threshold):
    d = df.select(
        "vec_id", F.col("embedding").alias("v"),
        _norm(F.col("embedding")).alias("n"),
    )
    l, r = d.alias("l"), d.alias("r")
    return (
        l.join(r, F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("id_a"),
            F.col("r.vec_id").alias("id_b"),
            F.round(
                _dot(F.col("l.v"), F.col("r.v"))
                / (F.col("l.n") * F.col("r.n")),
                6,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def test_lsh_subset_of_exact_and_full_recall_on_planted(spark, planted):
    exact = {(r.id_a, r.id_b) for r in _exact_pairs(planted, 0.99).collect()}
    got = {
        (r.id_a, r.id_b)
        for r in rhp_dup_pairs(planted, threshold=0.99).collect()
    }
    assert got <= exact
    # every (v, v+1e6) planted pair is an exact pair and must be found:
    # per-pair LSH miss probability ≈ 2e-10 with 4×4-bit bands
    n_src = planted.count() // 2
    plantedpairs = {(i, i + 1_000_000) for i in range(n_src)} & exact
    assert plantedpairs, "planted pairs missing from exact ground truth"
    assert plantedpairs <= got
    # nothing organic crosses 0.99, so LSH == exact here
    assert got == exact


def test_lsh_scores_match_exact(spark, planted):
    got = {
        (r.id_a, r.id_b): r.score
        for r in rhp_dup_pairs(planted, threshold=0.99).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.score
        for r in _exact_pairs(planted, 0.99).collect()
    }
    for k, s in got.items():
        assert s == exact[k]


def test_lsh_plan_is_equijoin_no_cartesian(spark, planted):
    df = rhp_dup_pairs(planted, threshold=0.99)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), plan


def test_lsh_band_exchange_is_slim(spark, planted):
    """The (band, key) candidate exchange must shuffle (id, band, key)
    only — never the embedding arrays (n_bands × dim doubles/vector)."""
    df = rhp_dup_pairs(planted, threshold=0.99)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # any exchange (hash or broadcast — AQE may pick either) whose rows
    # include a band column must not also carry the vectors
    band_exchanges = [
        blk
        for blk in re.split(r"\(\d+\) (?:Broadcast)?Exchange", plan)[1:]
        if re.search(r"\bband#", blk[:400])
    ]
    assert band_exchanges, plan
    for blk in band_exchanges:
        head = blk[:400]  # the Input/Arguments lines of this node
        assert "embedding" not in head, head
        assert not re.search(r"\bv#", head), head


def test_rhp_band_keys_arrow_native_parity(spark, sf_smoke):
    """The numpy-matmul band keys must equal the native interpreted
    plane-dot keys on real embeddings (sign parity)."""
    import pyspark.sql.functions as F

    from google_analytics_to_s3_spark.operators.similarity import (
        planted_copies,
        rhp_band_keys,
        rhp_band_keys_pandas,
    )
    from google_analytics_to_s3_spark.sources.testdata import load_table

    emb = planted_copies(load_table(spark, sf_smoke, "embeddings"))
    native = F.array(*rhp_band_keys(F.col("embedding"), 64, 4, 64))
    arrow = rhp_band_keys_pandas("embedding", 64, 4, 64)
    diff = (
        emb.select("vec_id", native.alias("a"), arrow.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert diff == 0
