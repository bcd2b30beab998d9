"""Exactly-once parquet delivery for ``foreachBatch`` sinks (S6/S8 at
production strength).

Structured Streaming's checkpoint gives ``foreachBatch`` at-least-once:
after a crash between "batch written" and "offsets committed", the SAME
``batch_id`` is replayed with the SAME data. Exactly-once therefore
reduces to making the batch write idempotent in ``batch_id`` — the same
contract Kinesis Firehose's S3 delivery documents for its retries (the
reference inherits it implicitly; collector-ga.yaml:195-207).

:class:`IdempotentBatchSink` gets there with two standard moves:

- data lands in a ``batch_id=N`` subdirectory written with
  ``mode("overwrite")`` — a replay rewrites the same directory to the
  same bytes instead of appending duplicates;
- a commit marker (empty ``_commits/N`` file) is written only AFTER the
  data write succeeds, so readers (and the replay fast-path) can treat
  unmarked directories as garbage from a mid-write crash.

Downstream consumers either read committed partitions only
(:func:`read_committed`) or simply read everything — overwrite
semantics already guarantee no duplicates; the markers only filter
torn, never-committed writes.

At 100 TB nothing changes: the marker is one driver-side file per
micro-batch; the data write is the normal distributed parquet path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class IdempotentBatchSink:
    """``foreachBatch`` callable: exactly-once parquet delivery under
    micro-batch replays. Pass an instance to
    ``writeStream.foreachBatch(...)``."""

    def __init__(self, base_path: str, partition_cols: tuple[str, ...] = ()):
        self.base_path = base_path
        self.partition_cols = partition_cols
        self.skipped_replays = 0  # observability for tests/metrics

    def _commit_marker(self, batch_id: int) -> str:
        return os.path.join(self.base_path, "_commits", str(batch_id))

    def data_dir(self, batch_id: int) -> str:
        return os.path.join(self.base_path, "data", f"batch_id={batch_id}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._commit_marker(batch_id)):
            # replay of a fully-committed batch (crash after marker,
            # before offset commit) — drop it, the data is in place
            self.skipped_replays += 1
            return
        writer = batch_df.write.mode("overwrite")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(self.data_dir(batch_id))
        os.makedirs(os.path.dirname(self._commit_marker(batch_id)),
                    exist_ok=True)
        with open(self._commit_marker(batch_id), "w") as f:
            f.write("")


def read_committed(spark: SparkSession, base_path: str) -> DataFrame:
    """Union of committed batch directories only (torn writes from a
    mid-batch crash are invisible until their marker exists)."""
    commits_dir = os.path.join(base_path, "_commits")
    ids = sorted(int(x) for x in os.listdir(commits_dir)) if os.path.isdir(
        commits_dir
    ) else []
    if not ids:
        raise FileNotFoundError(f"no committed batches under {base_path}")
    paths = [os.path.join(base_path, "data", f"batch_id={i}") for i in ids]
    return (
        spark.read.option("basePath", os.path.join(base_path, "data"))
        .parquet(*paths)
    )
