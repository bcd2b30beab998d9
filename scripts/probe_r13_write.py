"""r13 write-path scale probe: every task writes its own parquet
file with the engine's from-scratch writer (operators/parquet_write)
— the per-task sink shape a 1000-executor cluster shards — then one
scan job re-reads every file through the engine's own raw reader and
through parquet-cpp, verifying totals.  Records wall clock, bytes,
and shuffle totals (expected ~zero: the sink is shuffle-free)."""

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from google_analytics_to_s3_spark.session import get_spark  # noqa: E402

OUT = "/tmp/probe_r13_write"
N_PART = 96           # 3 waves over 32 cores
ROWS_PER = 75_000     # ~7.2M rows total


def main() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    base = spark.range(0, N_PART * ROWS_PER, 1, N_PART)

    def write_partition(it):
        from google_analytics_to_s3_spark.operators.parquet_write import (
            write_parquet,
        )

        rows = [r.id for r in it]
        if not rows:
            return iter([])
        pid = rows[0] // ROWS_PER
        ids = [int(v) for v in rows]
        xs = [float(v % 1000) / 2 for v in rows]
        ss = [f"s{v % 97}" for v in rows]
        blob = write_parquet(
            [("id", "int64", ids), ("x", "double", xs),
             ("s", "string", ss)],
            codec="snappy", row_group_size=25_000)
        path = f"{OUT}/part-{pid:05d}.parquet"
        with open(path, "wb") as f:
            f.write(blob)
        return iter([(pid, len(rows), len(blob), sum(ids))])

    stats = base.rdd.mapPartitions(write_partition).collect()
    t_write = time.time() - t0
    n_files = len(stats)
    n_rows = sum(s[1] for s in stats)
    n_bytes = sum(s[2] for s in stats)
    id_sum = sum(s[3] for s in stats)

    # re-read 1: engine's own raw reader inside one Arrow map
    t1 = time.time()
    files = sorted(glob.glob(f"{OUT}/*.parquet"))
    fdf = spark.createDataFrame([(f,) for f in files], "path string") \
        .repartition(32)

    def read_back(it):
        from google_analytics_to_s3_spark.operators.parquet_raw import (
            parquet_read_column,
        )

        for row in it:
            with open(row.path, "rb") as f:
                blob = f.read()
            ids = parquet_read_column(blob, "id")
            yield (len(ids), sum(v for v in ids if v is not None))

    own = fdf.rdd.mapPartitions(read_back) \
        .toDF(["n", "s"]).agg(F.sum("n"), F.sum("s")).collect()[0]
    t_own = time.time() - t1

    # re-read 2: Spark's native parquet source (parquet-mr/DataSource)
    t2 = time.time()
    native = spark.read.parquet(OUT).agg(
        F.count(F.lit(1)), F.sum("id")).collect()[0]
    t_native = time.time() - t2

    assert own[0] == n_rows and own[1] == id_sum, (own, n_rows, id_sum)
    assert native[0] == n_rows and native[1] == id_sum
    print({
        "files": n_files, "rows": n_rows,
        "mb_written": round(n_bytes / 1e6, 1),
        "write_sec": round(t_write, 1),
        "own_read_sec": round(t_own, 1),
        "native_read_sec": round(t_native, 1),
        "write_mb_s": round(n_bytes / 1e6 / t_write, 1),
    })
    spark.stop()


if __name__ == "__main__":
    main()
