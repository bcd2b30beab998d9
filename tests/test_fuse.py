"""Focused tests for the r13 mapInPandas fusion (operators/fuse.py).

The fusion must (a) collapse chained Arrow maps + name-projections
into one MapInPandas node, (b) produce byte-identical results to the
unfused chain, and (c) fall back transparently for any other
DataFrame usage.
"""

import pandas as pd

from google_analytics_to_s3_spark.operators.fuse import (
    _FusedMap,
    fusable,
)


def _ids(spark, n=64):
    return spark.range(n).selectExpr("id as doc_id")


def _double(batches):
    for pdf in batches:
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "x": pdf["doc_id"] * 2})


def _plus_one(batches):
    for pdf in batches:
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "y": pdf["x"] + 1})


def test_chain_fuses_to_single_node(spark):
    df = fusable(_ids(spark))
    out = df.mapInPandas(_double, "doc_id long, x long").mapInPandas(
        _plus_one, "doc_id long, y long"
    )
    assert isinstance(out, _FusedMap)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    rows = {r.doc_id: r.y for r in out.collect()}
    assert rows == {i: 2 * i + 1 for i in range(64)}


def test_name_projection_stays_fused(spark):
    df = fusable(_ids(spark))
    step = df.mapInPandas(_double, "doc_id long, x long").select(
        "doc_id", "x"
    )
    assert isinstance(step, _FusedMap)
    out = step.mapInPandas(_plus_one, "doc_id long, y long")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert out.count() == 64


def test_projection_subset_and_reorder(spark):
    df = fusable(_ids(spark))
    out = df.mapInPandas(_double, "doc_id long, x long").select(
        "x", "doc_id"
    )
    assert isinstance(out, _FusedMap)
    assert out.columns == ["x", "doc_id"]
    rows = sorted((r.x, r.doc_id) for r in out.collect())
    assert rows == [(2 * i, i) for i in range(64)]


def test_fused_equals_unfused(spark):
    base = _ids(spark)
    unfused = base.mapInPandas(_double, "doc_id long, x long").mapInPandas(
        _plus_one, "doc_id long, y long"
    )
    fused = fusable(base).mapInPandas(
        _double, "doc_id long, x long"
    ).mapInPandas(_plus_one, "doc_id long, y long")
    assert sorted(map(tuple, unfused.collect())) == sorted(
        map(tuple, fused.collect())
    )


def test_non_name_select_falls_back(spark):
    from pyspark.sql import functions as F

    df = fusable(_ids(spark))
    step = df.mapInPandas(_double, "doc_id long, x long")
    # expression select: must fall back to a plain DataFrame, still correct
    out = step.select(F.col("x") + 1)
    assert not isinstance(out, _FusedMap)
    assert sorted(r[0] for r in out.collect()) == [
        2 * i + 1 for i in range(64)
    ]


def test_other_methods_fall_back(spark):
    df = fusable(_ids(spark))
    step = df.mapInPandas(_double, "doc_id long, x long")
    assert step.filter("x > 100").count() == sum(
        1 for i in range(64) if 2 * i > 100
    )
    assert step.schema.fieldNames() == ["doc_id", "x"]


def test_drop_case_mismatch_matches_classic(spark):
    # ADVICE r13: classic drop resolves case-insensitively under the
    # default caseSensitive=false; the fused keep-list must not
    # silently keep a column classic drop removes.
    df = fusable(_ids(spark))
    step = df.mapInPandas(_double, "doc_id long, x long")
    out = step.drop("X")  # case-mismatched: classic drops column x
    assert out.columns == ["doc_id"]
    classic = _ids(spark).mapInPandas(
        _double, "doc_id long, x long"
    ).drop("X")
    assert out.columns == classic.columns


def test_drop_exact_name_stays_fused(spark):
    df = fusable(_ids(spark))
    out = df.mapInPandas(_double, "doc_id long, x long").drop("x")
    assert isinstance(out, _FusedMap)
    assert out.columns == ["doc_id"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


def test_drop_unknown_name_stays_fused(spark):
    df = fusable(_ids(spark))
    out = df.mapInPandas(_double, "doc_id long, x long").drop("nope")
    assert isinstance(out, _FusedMap)
    assert set(out.columns) == {"doc_id", "x"}


def test_source_projection_keeps_fusion(spark):
    # ADVICE r13: a name-only projection before the first mapInPandas
    # must not demote the chain to classic execution.
    from google_analytics_to_s3_spark.operators.fuse import _FusingSource

    base = fusable(_ids(spark).selectExpr("doc_id", "doc_id as extra"))
    pruned = base.select("doc_id")
    assert isinstance(pruned, _FusingSource)
    out = pruned.mapInPandas(_double, "doc_id long, x long").mapInPandas(
        _plus_one, "doc_id long, y long"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    dropped = base.drop("extra")
    assert isinstance(dropped, _FusingSource)


def test_id_payload_projection_dup_id_falls_back(spark):
    from google_analytics_to_s3_spark.operators.fuse import (
        id_payload_projection,
    )

    df = _ids(spark).selectExpr(
        "doc_id", "doc_id as p"
    ).selectExpr("doc_id", "p", "doc_id")  # doc_id twice
    out = id_payload_projection(df, "doc_id", "p")
    # falls off the by-name fast path (would be ambiguous); the cast
    # path resolves via df[id_col] which picks the first occurrence
    assert out.columns[:2] == ["doc_id", "p"]


def test_spread_if_narrow_gates_on_partitions(spark):
    from pyspark.sql import functions as F

    from google_analytics_to_s3_spark.sources.testdata import (
        spread_if_narrow,
    )

    p = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 1).selectExpr("id as event_id")
    spread = spread_if_narrow(narrow, F.col("event_id"))
    assert spread.rdd.getNumPartitions() == p
    wide = spark.range(0, 1000, 1, p).selectExpr("id as event_id")
    kept = spread_if_narrow(wide, F.col("event_id"))
    assert kept is wide
