"""Property-based tests (hypothesis) for the round-5 algebraic
operators: merge_rollup's partition-independence (any split of the
rows into partial states merges to the full rollup) and hash_split's
partition/total-function invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.curation import hash_split
from google_analytics_to_s3_spark.operators.merge import merge_rollup

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),      # key
        st.integers(min_value=-50, max_value=50),   # value
        st.integers(min_value=0, max_value=2),      # split assignment
    ),
    min_size=1,
    max_size=40,
)


def _partial(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.min("v").cast("long").alias("mn"),
        F.max("v").cast("long").alias("mx"),
    )


@settings(max_examples=10, deadline=None)
@given(rows_strategy)
def test_merge_rollup_split_independent(spark_prop, rows):
    """For ANY 3-way split of the rows, merging the per-part partials
    equals the one-shot rollup — the algebraic-aggregate law that
    makes incremental mart maintenance correct."""
    df = spark_prop.createDataFrame(rows, ["k", "v", "part"])
    parts = [
        _partial(df.filter(F.col("part") == p)) for p in (0, 1, 2)
    ]
    parts = [p for p in parts if p.count() > 0] or [_partial(df)]
    merged = merge_rollup(
        parts, key_cols=["k"], sum_cols=["n", "sv"],
        min_cols=["mn"], max_cols=["mx"],
    )
    full = _partial(df)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


keys_strategy = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50,
    unique=True,
)


@settings(max_examples=10, deadline=None)
@given(keys_strategy)
def test_hash_split_is_total_and_stable(spark_prop, keys):
    """Every key lands in exactly one split, and membership is a pure
    function of the key — independent of which other keys are present."""
    df = spark_prop.createDataFrame([(k,) for k in keys], ["k"])
    full = dict(hash_split(df, "k").collect())
    assert set(full) == set(keys)
    assert set(full.values()) <= {"train", "val", "test"}
    # subset invariance: the first key's assignment is unchanged when
    # computed alone
    solo = dict(
        hash_split(
            spark_prop.createDataFrame([(keys[0],)], ["k"]), "k"
        ).collect()
    )
    assert solo[keys[0]] == full[keys[0]]
