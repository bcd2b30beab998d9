"""Table maintenance for plain parquet directories: size-targeted
writes and small-file compaction.

The reference pins every output to ONE file per table/day via
``repartition(1)`` (reference functions/sessionization/main.py:1318) —
the survey's anti-scale list (§4.2). The opposite failure mode at
100 TB is the small-file problem: thousands of tasks × thousands of
Hive partitions → millions of KB-sized files that crush the namenode /
S3 listing and the next scan's task scheduler. This module is the
idiomatic middle ground, the moral equivalent of Delta/Iceberg
``OPTIMIZE`` without a table format:

- :func:`write_sized` — cluster rows by partition key before the write
  (one task per Hive partition, not tasks × partitions files) and split
  output at a byte-calibrated ``maxRecordsPerFile``.
- :func:`compact_parquet_dir` — rewrite partition directories whose
  files are too small/numerous into ceil(bytes/target) files.

File listing and moves go through the Hadoop FileSystem API (via the
session's JVM), so the same code runs on file://, hdfs:// and s3a://.
The swap in :func:`compact_parquet_dir` is delete-then-move — atomic
enough for a maintenance window, but concurrent readers can observe a
partial directory; a real lakehouse deployment would use a
transactional table format (Delta/Iceberg) for that guarantee.
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 << 20


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def list_leaf_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """All data files under ``path`` (recursive) as (uri, bytes)."""
    fs, jpath, _ = _fs(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def estimate_row_bytes(df: DataFrame, sample_rows: int = 10_000) -> float:
    """On-disk (encoded+compressed) bytes per row, measured by writing a
    sample to scratch space — the honest estimator; schema-based guesses
    miss encoding by 10×. At warehouse scale you'd persist this in a
    catalog instead of re-sampling per write.
    """
    spark = df.sparkSession
    scratch = (
        spark.conf.get("spark.local.dir", "/tmp")
        + f"/rowbytes-{uuid.uuid4().hex}"
    )
    sample = df.limit(sample_rows)
    sample.write.mode("overwrite").parquet(scratch)
    files = list_leaf_files(spark, scratch)
    n = spark.read.parquet(scratch).count()
    total = sum(sz for _, sz in files)
    fs, jpath, _ = _fs(spark, scratch)
    fs.delete(jpath, True)
    if n == 0:
        raise ValueError("cannot estimate row size of an empty DataFrame")
    return total / n


def write_sized(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    row_bytes: float | None = None,
    tasks_per_partition: int = 1,
    mode: str = "overwrite",
) -> int:
    """Write parquet with byte-calibrated file sizing. Returns the
    ``maxRecordsPerFile`` used.

    ``repartition(partition_by)`` clusters each Hive partition into one
    task, so file count per directory is ceil(rows/records_per_file),
    not the task count. For skewed partition keys raise
    ``tasks_per_partition``: rows are salted across that many tasks so
    one giant date doesn't serialize through a single writer.
    """
    if row_bytes is None:
        row_bytes = estimate_row_bytes(df)
    max_records = max(1, int(target_file_bytes / row_bytes))
    out = df
    if partition_by:
        keys = [F.col(c) for c in partition_by]
        if tasks_per_partition > 1:
            out = out.withColumn(
                "_salt",
                F.pmod(
                    F.monotonically_increasing_id(),
                    F.lit(tasks_per_partition),
                ),
            )
            keys.append(F.col("_salt"))
        out = out.repartition(*keys)
        if tasks_per_partition > 1:
            out = out.drop("_salt")
    writer = out.write.mode(mode).option("maxRecordsPerFile", max_records)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return max_records


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Rewrite every leaf directory holding ≥ ``min_files`` data files
    into ceil(total_bytes/target) files. Returns
    ``{dir: (files_before, files_after)}`` for the dirs rewritten.

    Each directory is read/coalesced/rewritten independently, so the
    job's memory footprint is one directory at a time regardless of
    table size, and untouched partitions keep their files byte-
    identical (no churn for downstream incremental consumers).
    """
    by_dir: dict[str, list[tuple[str, int]]] = {}
    for f, sz in list_leaf_files(spark, path):
        parent = f.rsplit("/", 1)[0]
        by_dir.setdefault(parent, []).append((f, sz))

    fs, _, jvm = _fs(spark, path)
    JPath = jvm.org.apache.hadoop.fs.Path
    result: dict[str, tuple[int, int]] = {}
    for d, files in sorted(by_dir.items()):
        if len(files) < min_files:
            continue
        total = sum(sz for _, sz in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out >= len(files):
            continue
        tmp = f"{d}/_compact-{uuid.uuid4().hex}"
        (
            spark.read.parquet(*[f for f, _ in files])
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        new_files = [
            f for f, _ in list_leaf_files(spark, tmp)
        ]
        for f, _ in files:
            fs.delete(JPath(f), False)
        for i, f in enumerate(new_files):
            name = f.rsplit("/", 1)[1]
            fs.rename(JPath(f), JPath(f"{d}/compacted-{i}-{name}"))
        fs.delete(JPath(tmp), True)
        result[d] = (len(files), len(new_files))
    return result


# --------------------------------------------------------------------------
# Z-order clustering — multi-column data skipping (OPTIMIZE ZORDER BY)
# --------------------------------------------------------------------------


def zorder_value(
    cols: list,
    mins: list[int],
    maxs: list[int],
    bits: int = 16,
):
    """Interleaved-bit Morton (Z-order) key over integer columns.

    Each column is range-normalized to ``bits`` bits with integer
    arithmetic ((x-min)*(2^bits-1) div (max-min) — exact, no floats),
    then bit b of column i lands at output bit ``b*ncols + i``. Pure
    codegen integer ops. Column ranges must fit (max-min)*(2^bits-1)
    inside int64 — true for any 47-bit-range column at the default 16
    bits. ``ncols*bits`` must stay within int64's 63 value bits (the
    top output-bit weight is ``1 << (bits*ncols - 1)``); callers that
    cluster many columns should lower ``bits`` (write_zordered does so
    automatically).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder key needs {n * bits} bits ({n} cols x {bits}) but "
            "int64 holds 63; lower bits to at most "
            f"{63 // n} for {n} columns"
        )
    top = (1 << bits) - 1
    norms = []
    for c, mn, mx in zip(cols, mins, maxs):
        span = max(int(mx) - int(mn), 1)
        norms.append(
            F.call_function(
                "div", (c.cast("long") - F.lit(int(mn))) * F.lit(top),
                F.lit(span),
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, nc in enumerate(norms):
            bit = F.shiftright(nc, b).bitwiseAND(F.lit(1))
            z = z + (bit * F.lit(1 << (b * n + i)))
    return z


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered by the Z-order of ``cols``.

    The Delta/Iceberg ``OPTIMIZE ZORDER BY`` equivalent for plain
    parquet: rows land in files by Morton-key range, so every file
    covers a small hyper-rectangle of the key space and min/max
    row-group stats prune scans filtered on ANY prefix-free subset of
    the clustered columns — not just the first sort column. Column
    min/max come from one tiny aggregate (the only driver action);
    range-partitioning on the key balances file sizes even when the
    key-space is occupied unevenly.
    """
    bits = min(bits, 63 // max(len(cols), 1))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    row = df.agg(*aggs).first()
    mins = [row[f"mn_{c}"] for c in cols]
    maxs = [row[f"mx_{c}"] for c in cols]
    z = zorder_value([F.col(c) for c in cols], mins, maxs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def partition_stats(
    df: DataFrame,
    part_col: str,
    stat_col: str,
    predicate_min: float | None = None,
) -> DataFrame:
    """Per-partition zone-map statistics (the min/max/null/count table
    Delta and Iceberg keep per file) plus, optionally, whether a
    ``stat_col >= predicate_min`` scan could SKIP the partition
    entirely — the data-skipping estimate that turns clustering
    (write_zordered) into measured I/O savings.

    Shape: one hash aggregation to partition-key grain; the stats
    table is partition-count-sized (days, not rows) and feeds planning
    decisions, never a data join. At 100 TB this is the query you run
    to decide WHETHER a clustering rewrite pays for itself: the skip
    fraction under the workload's hot predicate is the answer.
    """
    v = F.col(stat_col).cast("double")
    out = df.groupBy(F.col(part_col).alias("part")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(v.isNull().cast("long")).cast("long").alias("n_nulls"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )
    if predicate_min is not None:
        out = out.withColumn(
            "skippable",
            F.coalesce(
                F.col("max_val") < F.lit(float(predicate_min)),
                F.lit(True),  # all-null partition: nothing can match
            ),
        )
    return out


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Reference Hilbert distance of integer cell (x, y) on the
    2^bits x 2^bits grid — the public-domain xy2d loop (Wikipedia
    "Hilbert curve"), used by tests to pin the DataFrame version."""
    n = 1 << bits
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    mins: "list[int]",
    maxs: "list[int]",
    bits: int = 8,
    out_col: str = "hkey",
) -> DataFrame:
    """Hilbert-curve clustering key over two integer columns — the
    locality upgrade of :func:`zorder_value`: consecutive key values
    are ALWAYS grid-adjacent cells (Morton order jumps at quadrant
    seams), so files clustered by key range cover tighter rectangles
    and min/max pruning discards more.

    Same integer range normalization as z-order ((v-min)*(2^bits-1)
    div span — no floats), then ``bits`` unrolled rounds of the xy2d
    quadrant walk. The rotation carries (x, y) state across rounds, so
    this is a DataFrame transform (one ``withColumns`` projection per
    round — Catalyst collapses all of them into a single codegen
    stage), not a pure Column like the stateless Morton interleave.
    The key is d < 4^bits — int64-safe for any bits <= 31; the default
    8 gives a 256x256 grid, plenty for file-level clustering.
    """
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    top = (1 << bits) - 1
    n = 1 << bits

    def norm(c: str, mn: int, mx: int):
        span = max(int(mx) - int(mn), 1)
        return F.call_function(
            "div",
            (F.col(c).cast("long") - F.lit(int(mn))) * F.lit(top),
            F.lit(span),
        )

    out = df.withColumns({
        "_hx": norm(x_col, mins[0], maxs[0]),
        "_hy": norm(y_col, mins[1], maxs[1]),
        "_hd": F.lit(0).cast("long"),
    })
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = F.when(
            F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        ry = F.when(
            F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        reflect = (rx == 1) & (ry == 0)
        out = out.withColumns({
            "_hd": F.col("_hd")
            + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry).cast("long"),
            "_hx": F.when(
                ry == 0,
                F.when(reflect, F.lit(n - 1) - F.col("_hy"))
                .otherwise(F.col("_hy")),
            ).otherwise(F.col("_hx")),
            "_hy": F.when(
                ry == 0,
                F.when(reflect, F.lit(n - 1) - F.col("_hx"))
                .otherwise(F.col("_hx")),
            ).otherwise(F.col("_hy")),
        })
    return out.withColumn(out_col, F.col("_hd")).drop(
        "_hx", "_hy", "_hd"
    )
