"""Streaming CDC upsert — maintain a keyed parquet snapshot from a
change stream, exactly-once. Composes the batch MERGE operator
(``operators/merge.merge_upsert``) with the versioned-directory
idempotence scheme of ``streaming/exactly_once.py``:

- every micro-batch writes a FULL next snapshot under ``v=<batch_id>``
  with ``mode("overwrite")`` and marks it committed afterwards;
- the merge base is always the latest COMMITTED version with id <
  batch_id, so a replayed batch (crash between write and commit)
  re-derives byte-identical output from the same base — idempotent in
  ``batch_id`` exactly like :class:`IdempotentBatchSink`;
- readers take the max committed version: a torn write is an unmarked
  directory nobody reads.

Scale note: the apply path inherits merge_upsert's contract — the base
snapshot streams through a broadcast anti-join, only the micro-batch
pays a window. Rewriting the full snapshot per batch is the plain-
parquet cost of MERGE without a table format; at 100 TB the same sink
logic drives a format with file-level replace (the operator is
unchanged — only ``_write`` swaps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_upsert


class StreamingUpsertSink:
    """``foreachBatch`` callable: keyed snapshot maintenance from a CDC
    stream. Changes must carry the snapshot columns plus ``version_col``
    and boolean ``deleted_col`` (see merge_upsert)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        version_col: str = "version",
        deleted_col: str = "is_deleted",
    ) -> None:
        # commit markers use driver-local os.* I/O while the data write
        # goes through Spark: on an object-store path the marker checks
        # would silently see an empty _commits dir and reset the
        # snapshot every batch. Fail loudly instead; an object-store
        # deployment swaps _committed/_mark for the Hadoop FS API
        # (jvm FileSystem.get), the data path is unchanged.
        if "://" in path:
            raise ValueError(
                "StreamingUpsertSink commit markers require a local "
                f"filesystem path, got {path!r}; wire the marker I/O "
                "through the Hadoop FileSystem API for object stores"
            )
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.version_col = version_col
        self.deleted_col = deleted_col

    # -- committed-version bookkeeping (driver-side, one marker/batch) --
    def _commit_dir(self) -> str:
        return os.path.join(self.path, "_commits")

    def _committed(self) -> list[int]:
        d = self._commit_dir()
        if not os.path.isdir(d):
            return []
        return sorted(int(f) for f in os.listdir(d) if f.isdigit())

    def _mark(self, batch_id: int) -> None:
        os.makedirs(self._commit_dir(), exist_ok=True)
        open(os.path.join(self._commit_dir(), str(batch_id)), "w").close()

    def read_snapshot(
        self, before: int | None = None, schema_of: DataFrame | None = None
    ) -> DataFrame | None:
        """Latest committed snapshot (optionally among versions <
        ``before``); None if nothing is committed yet."""
        versions = [
            v for v in self._committed() if before is None or v < before
        ]
        if not versions:
            return None
        vdir = os.path.join(self.path, f"v={versions[-1]}")
        df = self.spark.read.parquet(vdir)
        if schema_of is not None:
            df = df.select(*schema_of.columns)
        return df

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        drop = [self.version_col, self.deleted_col]
        snap_cols = [c for c in batch_df.columns if c not in drop]
        base = self.read_snapshot(
            before=batch_id, schema_of=batch_df.select(*snap_cols)
        )
        if base is None:
            base = batch_df.select(*snap_cols).limit(0)
        nxt = merge_upsert(
            base,
            batch_df,
            key_cols=self.key_cols,
            version_col=self.version_col,
            deleted_col=self.deleted_col,
        )
        nxt.write.mode("overwrite").parquet(
            os.path.join(self.path, f"v={batch_id}")
        )
        self._mark(batch_id)


class StreamingRollupSink(StreamingUpsertSink):
    """``foreachBatch`` callable: standing AGGREGATE-mart maintenance
    from an append stream — the streaming twin of
    ``operators/merge.merge_rollup`` (incremental materialized-view
    maintenance), on the same versioned-directory exactly-once scheme
    as the CDC upsert sink (same commit markers, same replay
    idempotence in ``batch_id``).

    Each micro-batch is reduced to a PARTIAL rollup state by
    ``partial_fn`` (one aggregation of the batch), then merged with
    the latest committed mart via ``merge_rollup`` — so per trigger
    the work is O(batch) + O(mart), never a rescan of history. The
    equality with a full batch recompute is pinned in
    tests/test_streaming_curation.py.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        partial_fn,
        sum_cols: list[str] | None = None,
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
    ) -> None:
        super().__init__(spark, path, key_cols)
        self.partial_fn = partial_fn
        self.sum_cols = sum_cols or []
        self.min_cols = min_cols or []
        self.max_cols = max_cols or []

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.merge import merge_rollup

        partial = self.partial_fn(batch_df)
        base = self.read_snapshot(before=batch_id, schema_of=partial)
        states = [partial] if base is None else [base, partial]
        nxt = merge_rollup(
            states,
            key_cols=self.key_cols,
            sum_cols=self.sum_cols,
            min_cols=self.min_cols,
            max_cols=self.max_cols,
        )
        nxt.write.mode("overwrite").parquet(
            os.path.join(self.path, f"v={batch_id}")
        )
        self._mark(batch_id)
