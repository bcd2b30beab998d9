"""connected_components: known component structures, chain propagation,
convergence guard."""

import pytest

from google_analytics_to_s3_spark.operators.graph import connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r.id: r.component for r in out.collect()}


def test_two_triangles_and_isolated_edge(spark):
    got = _components(
        spark,
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_chain_needs_diameter_rounds(spark):
    # 0-1-2-...-9: min label must walk the whole chain
    got = _components(spark, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}
    assert len(got) == 10


def test_bridge_merges_components(spark):
    got = _components(spark, [(1, 2), (3, 4), (2, 3)])
    assert set(got.values()) == {1}


def test_convergence_guard_raises(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _components(spark, [(i, i + 1) for i in range(30)], max_iters=3)
