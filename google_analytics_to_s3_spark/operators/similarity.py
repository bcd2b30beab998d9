"""Embedding similarity search: brute-force cosine top-k (baseline) and
blocked/bucketed variants (the scale path). Beyond-reference capability.

Scale design:
- The query side is broadcast (queries ≪ corpus); candidates never
  shuffle — the cross product is map-side, and only (query_id,
  candidate_id, score) rows reach the per-query top-k.
- Top-k uses a window over query_id; at large k-or-queries switch to
  ``groupBy(query_id).agg(max_by-style aggregation)``.
- Dot products stay in the JVM: ``zip_with`` + ``aggregate`` over the
  float arrays cast to double, left-to-right — deterministic and
  engine-portable (matches DuckDB's sequential list_sum).
- ``cosine_pairs_blocked`` is the IVF-flavored variant: an equi-join on
  a coarse blocking key bounds the pair count; swap the key for an LSH
  hyperplane bucket or a learned centroid id at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Returns (query_id, neighbor_id, score, rank); ties broken by
    neighbor id for determinism.
    """
    # Precompute norms per row BEFORE the join: O(n+q) norm work instead
    # of O(n*q), and the pair loop is a single dot product.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold within a blocking
    key (equi-join: shuffle on the block key only)."""
    d = df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        F.col(block_col).alias("blk"),
        _norm(F.col(vec_col)).alias("nrm"),
    ).persist()
    left, right = d.alias("l"), d.alias("r")
    pairs = left.join(
        right,
        (F.col("l.blk") == F.col("r.blk"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    score = _dot(F.col("l.v"), F.col("r.v")) / (F.col("l.nrm") * F.col("r.nrm"))
    return pairs.select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        score.alias("score"),
    ).filter(F.col("score") >= threshold)
