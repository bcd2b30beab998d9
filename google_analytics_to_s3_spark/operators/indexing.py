"""Distributed row-indexing operators: contiguous global IDs and the
deterministic pre-training shuffle.

Two row-numbering problems every large-scale training-data pipeline
hits that Spark has no built-in for:

- ``assign_global_index`` — a CONTIGUOUS 0..n-1 global index.
  ``monotonically_increasing_id`` is sparse (partition-id in the high
  bits) and ``zipWithIndex`` drops to RDDs; the classic distributed
  answer is two passes: per-bucket counts -> driver-side prefix sums
  (one tiny collect, ``buckets`` rows) -> broadcast offsets + a
  within-bucket window rank. The global order is (bucket, key) where
  bucket is a uniform md5 hash — deterministic on any engine, never a
  global sort.

- ``shuffle_shards`` — the deterministic global shuffle that precedes
  training: every row gets a pseudo-random but seed-reproducible
  (shard, position) so examples stream in hash order, not corpus
  order. Changing the seed is a full reshuffle; keeping it makes every
  rerun (and every engine) produce the identical batch order.

Scale notes: both shuffle only on the bucket/shard key (uniform by
construction — md5 over the row key), and the per-bucket sort is the
window's local sort, so bucket count is the memory knob: pick
``buckets >= cluster cores`` and such that n/buckets rows sort
in-executor. The counts collect is ``buckets`` rows regardless of data
size. Nothing here is in the reference (mydatastack/google-analytics-
to-s3 keeps row identity implicit in file order — collector/worker.py
writes arrival-ordered JSON); these are the Spark-first replacements
for that implicit contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_long(col: Column) -> Column:
    """First 56 bits of md5 as a non-negative BIGINT (the repo-wide
    engine-portable hash: DuckDB mirror is
    ``('0x' || substr(md5(x), 1, 14))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def assign_global_index(
    df: DataFrame,
    key_col: str,
    buckets: int = 64,
    out_col: str = "global_idx",
    validate: bool = False,
) -> DataFrame:
    """Contiguous 0..n-1 index, globally ordered by (md5-bucket, key).

    Two jobs: (1) bucket counts — a map-side partial agg reduced to
    ``buckets`` rows on the driver, where the exclusive prefix sum is
    computed; (2) the indexed result — offsets broadcast-joined back,
    plus a within-bucket ``row_number``. The window and the join share
    the hash-partitioning on ``_bucket``, so the data makes exactly one
    exchange. ``key_col`` must be unique (it is the order tiebreak and
    the hash input); duplicate keys would make the order — and thus
    the index — run-dependent. ``validate=True`` folds an exact
    ``countDistinct`` into the counts pass and raises on duplicates
    (one extra aggregate over the same exchange; off by default).
    """
    b = _md5_long(F.col(key_col).cast("string")) % buckets
    dfb = df.withColumn("_bucket", b)

    aggs = [F.count("*").alias("n")]
    if validate:
        aggs.append(F.countDistinct(key_col).alias("nd"))
    count_rows = dfb.groupBy("_bucket").agg(*aggs).collect()
    if validate and any(r["n"] != r["nd"] for r in count_rows):
        raise ValueError(
            f"assign_global_index: {key_col} has duplicate values; "
            "the global order would be ambiguous"
        )
    counts = {r["_bucket"]: r["n"] for r in count_rows}
    offsets, acc = [], 0
    for bk in sorted(counts):
        offsets.append((bk, acc))
        acc += counts[bk]
    off_df = df.sparkSession.createDataFrame(
        offsets, schema="_bucket LONG, _offset LONG"
    )

    w = Window.partitionBy("_bucket").orderBy(key_col)
    return (
        dfb.join(F.broadcast(off_df), "_bucket")
        .withColumn(
            out_col,
            (F.col("_offset") + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_bucket", "_offset")
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    shards: int = 8,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic training shuffle: seed-stable (shard, pos) per row.

    ``h = md5(seed # key)`` drives both the shard assignment
    (``h % shards``) and the within-shard order (``h``, key as
    tiebreak) — one hash, one exchange on the shard key, one local
    sort. Downstream writers ``partitionBy(shard)`` and readers stream
    each shard in ``pos`` order to get the same global example order on
    every rerun. At 100 TB the shard count is the file-size/parallelism
    knob exactly as in ``assign_global_index``.
    """
    h = _md5_long(
        F.concat(F.lit(seed + "#"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % shards).cast("long"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h")
    )
