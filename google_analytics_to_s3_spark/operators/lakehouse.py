"""Delta-style transaction-log snapshot reconciliation — public Delta
Lake transaction-log protocol (delta.io PROTOCOL.md): a table's live
file set is the fold of its JSON action log.

Unlike the byte-path decoders, this is a fully DECLARATIVE operator:
``from_json`` parses the action lines JVM-side, and the
last-writer-wins reconciliation is a window argmax — no Python in
the hot path, so Catalyst/AQE own the physical plan.

Semantics implemented (the scan-planning subset):

- ``add`` actions register a file (path, size); ``remove`` actions
  tombstone it; other actions (``metaData``, ``protocol``,
  ``commitInfo``) carry no file-liveness information and drop out.
- A path's liveness is decided by its LATEST action in
  ``(version, line_no)`` order — re-adding a removed path
  resurrects it, removing an added one kills it, exactly the
  protocol's replay rule.
- Output: per-table live-file count, live byte total, latest
  version, and action count.

Scale: one hash-partitioned window over (table, path) plus one
aggregation — both key-partitioned exchanges; no data-size blowup at
100 TB of log (the window key cardinality is the file inventory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["delta_log_snapshot"]

_ACTION_SCHEMA = ("add struct<path:string,size:bigint,"
                  "dataChange:boolean>, "
                  "remove struct<path:string,deletionTimestamp:bigint>")


def delta_log_snapshot(
    log: DataFrame,
    table_col: str = "table_id",
    version_col: str = "version",
    line_col: str = "line",
    line_no_col: str | None = None,
) -> DataFrame:
    """Fold a Delta-style JSON action log into per-table snapshot
    stats.  ``log`` carries one action line per row; ``line_no_col``
    (optional) breaks ties within a version, matching in-commit
    action order."""
    tie = F.col(line_no_col) if line_no_col else F.lit(0)
    parsed = (
        log
        .withColumn("_a", F.from_json(F.col(line_col), _ACTION_SCHEMA))
        .withColumn("_path", F.coalesce(F.col("_a.add.path"),
                                        F.col("_a.remove.path")))
        .withColumn("_tie", tie)
    )
    actions = parsed.filter(F.col("_path").isNotNull())
    w = (Window.partitionBy(table_col, "_path")
         .orderBy(F.col(version_col).desc(), F.col("_tie").desc()))
    latest = (
        actions
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumn("_live", F.col("_a.add.path").isNotNull())
    )
    per_table = latest.groupBy(table_col).agg(
        F.sum(F.when(F.col("_live"), 1).otherwise(0))
         .cast("long").alias("n_live_files"),
        F.sum(F.when(F.col("_live"), F.col("_a.add.size")).otherwise(0))
         .cast("long").alias("live_bytes"),
    )
    totals = actions.groupBy(table_col).agg(
        F.max(version_col).cast("long").alias("last_version"),
        F.count(F.lit(1)).alias("n_actions"),
    )
    return per_table.join(totals, table_col)
