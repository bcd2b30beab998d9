"""CDC merge (upsert/delete compaction) — MERGE INTO semantics as pure
DataFrame ops. Beyond-reference capability: the reference only ever
APPENDS its session-history parquet (main.py:1320-1325) and recomputes
from scratch; a mart maintained at 100 TB needs the incremental path —
apply a (small) change batch of upserts and tombstones to a (huge) base
snapshot without rewriting semantics into the storage layer.

Scale design — the base table NEVER shuffles:

- The change batch is first compacted to one winner row per key (latest
  ``version``) with a window over the CHANGES ONLY — the small side.
- Superseded base rows are removed with a LEFT ANTI join against the
  broadcast distinct change-key set; surviving change rows (non-
  tombstones) are unioned on. Base rows therefore stream map-side
  through the anti join: no exchange, no sort, no window over the base.
- If the change batch is too large to broadcast, pass
  ``broadcast_keys=False`` and the anti join degrades to a shuffled
  hash join — still key-partitioned, never a sort of the base.

This is exactly how Delta/Iceberg MERGE executes its find-and-replace
phase (minus file-level pruning, which belongs to the table format, cf.
``sources/maintenance.py`` for the clustering that enables it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_changes(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
) -> DataFrame:
    """One winner per key: highest ``version`` wins; ties broken by the
    full row's order in the window (callers should make versions unique
    per key — enforced nowhere because CDC feeds commonly guarantee it).
    Runs only on the change batch, so the window is cheap by contract.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    deleted_col: str = "is_deleted",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Apply a CDC batch (upserts + tombstones) to a base snapshot.

    ``changes`` must carry the base columns plus ``version_col`` (batch
    ordering per key) and boolean ``deleted_col`` (tombstone marker).
    Returns the next snapshot with the base's exact schema.
    """
    latest = compact_changes(changes, key_cols, version_col)
    keys = latest.select(*key_cols).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    survivors = base.join(keys, key_cols, "left_anti")
    # NULL in deleted_col (nullable CDC feeds) means "not a tombstone":
    # a bare `~col` filter would drop the row from the upsert side
    # while its key still anti-joins the base row away — silent loss
    upserts = latest.filter(
        ~F.coalesce(F.col(deleted_col), F.lit(False))
    ).select(*base.columns)
    return survivors.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Changeset between two snapshots: one row per key that was
    inserted, deleted, or updated (unchanged keys are dropped).

    The reverse of ``merge_upsert`` — that one applies a change feed to
    a snapshot; this one RECOVERS the feed from two snapshots, the
    table-diff every lakehouse migration/backfill audit needs. Each
    side reduces to (key, 56-bit md5 digest of the compare columns)
    before the full-outer equi-join on the key, so payloads never
    shuffle — only keys + fixed-width digests — and the join is a plain
    hash join at any width. Compare columns are joined with a '|'
    delimiter and a NULL sentinel; values containing the delimiter can
    alias (use digest-safe columns or pre-escape for adversarial data).
    Doubles are deliberately NOT auto-supported in compare_cols: cast
    them to an exact grain first (string formatting of floats is
    engine-specific).
    """
    def digest(df: DataFrame, out: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
            for c in compare_cols
        ]
        d = F.conv(
            F.substring(F.md5(F.concat_ws("|", *parts)), 1, 14), 16, 10
        ).cast("long")
        return df.select(*key_cols, d.alias(out))

    o = digest(old, "_dig_old")
    n = digest(new, "_dig_new")
    joined = o.join(n, key_cols, "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("_dig_old").isNull(), F.lit("insert"))
        .when(F.col("_dig_new").isNull(), F.lit("delete"))
        .when(F.col("_dig_old") != F.col("_dig_new"), F.lit("update"))
        .alias(change_col),
    ).filter(F.col(change_col).isNotNull())


def merge_rollup(
    states: list[DataFrame],
    key_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Algebraic partial-aggregate merge — incremental materialized-view
    maintenance for distributive aggregates: any number of partial
    rollup states (yesterday's mart + today's delta, or N shard-local
    marts) combine into the state a full recompute would produce,
    because SUM/COUNT merge by adding and MIN/MAX by re-min/maxing.
    COUNTs are just SUM columns of an already-counted state; AVG must
    be carried as (sum, count) and derived at read time — the caller's
    contract (a stored avg is NOT mergeable).

    This is the 100 TB pattern that replaces recomputing history:
    production scans ONLY the delta, merges it into the standing mart,
    and the equality with full recompute is what the driver query +
    tests pin. One union + one hash aggregation on the key; state
    tables are aggregate-sized, so the exchange is mart-sized, not
    fact-sized.
    """
    if not states:
        raise ValueError("merge_rollup needs >= 1 state")
    u = states[0]
    for st in states[1:]:
        u = u.unionByName(st)
    aggs = (
        [F.sum(c).cast("long").alias(c) for c in (sum_cols or [])]
        + [F.min(c).alias(c) for c in (min_cols or [])]
        + [F.max(c).alias(c) for c in (max_cols or [])]
    )
    if not aggs:
        raise ValueError("no aggregate columns given")
    return u.groupBy(*key_cols).agg(*aggs)
