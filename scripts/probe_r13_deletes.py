"""Delete-aware composed lakehouse scale probe (r13 verdict task 7).

The r12 composed probe shape — plan a 300k-action file log
declaratively (max_by fold), then raw-scan every live file's REAL
parquet bytes inside ONE Arrow map — extended with Iceberg-style
DELETE APPLICATION in the same map: per live file the map task also
builds + decodes a REAL positional-delete parquet (file_path/pos)
and a REAL equality-delete parquet (delete values), applies the
sequence-number ordering rule (equality deletes hit only files with
seq < 3), and aggregates survivors.  No payload, position set, or
delete value ever crosses a task boundary: the only exchanges are
the planning fold's (path, liveness) aggregates and the final
3-number rollup.

Run:  python scripts/probe_r13_deletes.py [n_paths]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from google_analytics_to_s3_spark.session import get_spark  # noqa: E402

N_PATHS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
ROWS_PER_FILE = 95


def main() -> None:
    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4049"})
    spark.sparkContext.setLogLevel("ERROR")

    # ---- planning stage: 2 actions per path (add + maybe-remove),
    # fold to the live set declaratively (the delta_log_snapshot
    # shape at path granularity) ----
    log = (
        spark.range(0, N_PATHS * 2)
        .select(
            (F.col("id") % N_PATHS).alias("path_id"),
            (F.col("id") >= N_PATHS).alias("is_remove"),
            (F.col("id") % N_PATHS % 4 == 3).alias("removable"),
        )
        .filter(~F.col("is_remove") | F.col("removable"))
        .withColumn("version", F.when(F.col("is_remove"), 2)
                    .otherwise(1))
    )
    live = (
        log.groupBy("path_id")
        .agg(F.max_by(~F.col("is_remove"), F.col("version"))
             .alias("live"))
        .filter(F.col("live"))
        .select("path_id")
    )

    # ---- scan stage: one Arrow map builds the data parquet, the
    # positional-delete parquet and the equality-delete parquet for
    # each live file, decodes all three with the engine's own raw
    # reader, applies the deletes, and emits 3 numbers ----
    def _scan(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from google_analytics_to_s3_spark.operators.parquet_raw import (
            parquet_read_column,
        )

        for pdf in batches:
            out = {"path_id": [], "rows_after": [], "n_deleted": [],
                   "value_sum": []}
            for pid in pdf["path_id"]:
                pid = int(pid)
                seq = 1 + pid % 4
                vals = [(pid * 3 + 9 * i) % 1000
                        for i in range(ROWS_PER_FILE)]
                buf = pa.BufferOutputStream()
                pq.write_table(
                    pa.table({"v": pa.array(vals, pa.int64())}),
                    buf, compression="zstd")
                blob = buf.getvalue().to_pybytes()
                # positional-delete file: positions i % 7 == pid % 7
                dead_pos = [i for i in range(ROWS_PER_FILE)
                            if i % 7 == pid % 7]
                dbuf = pa.BufferOutputStream()
                pq.write_table(pa.table({
                    "file_path": pa.array([f"f{pid}"] * len(dead_pos)),
                    "pos": pa.array(dead_pos, pa.int64())}), dbuf)
                dblob = dbuf.getvalue().to_pybytes()
                # equality-delete file: values % 13 == pid % 13,
                # sequence 3 (applies only when seq < 3)
                eq_vals = [x for x in range(1000) if x % 13 == pid % 13]
                ebuf = pa.BufferOutputStream()
                pq.write_table(pa.table({
                    "v": pa.array(eq_vals, pa.int64())}), ebuf)
                eblob = ebuf.getvalue().to_pybytes()
                # decode all three with the engine's own reader
                got = parquet_read_column(blob, "v")
                pos_set = set(parquet_read_column(dblob, "pos"))
                eq_set = (set(parquet_read_column(eblob, "v"))
                          if seq < 3 else set())
                rows_after = n_del = vsum = 0
                for i, v in enumerate(got):
                    if i in pos_set or v in eq_set:
                        n_del += 1
                        continue
                    rows_after += 1
                    vsum += v
                out["path_id"].append(pid)
                out["rows_after"].append(rows_after)
                out["n_deleted"].append(n_del)
                out["value_sum"].append(vsum)
            yield pd.DataFrame(out)

    t0 = time.time()
    agg = (
        live.repartition(64)
        .mapInPandas(_scan, schema="path_id long, rows_after long, "
                                   "n_deleted long, value_sum long")
        .agg(F.count(F.lit(1)).alias("n_files"),
             F.sum("rows_after").alias("rows_after"),
             F.sum("n_deleted").alias("n_deleted"),
             F.sum("value_sum").alias("value_sum"))
        .collect()[0]
    )
    wall = time.time() - t0

    # closed-form check
    n_files = rows_after = n_deleted = value_sum = 0
    for pid in range(N_PATHS):
        if pid % 4 == 3:
            continue
        n_files += 1
        seq = 1 + pid % 4
        for i in range(ROWS_PER_FILE):
            v = (pid * 3 + 9 * i) % 1000
            if i % 7 == pid % 7 or (seq < 3 and v % 13 == pid % 13):
                n_deleted += 1
            else:
                rows_after += 1
                value_sum += v
    ok = (agg["n_files"] == n_files and agg["rows_after"] == rows_after
          and agg["n_deleted"] == n_deleted
          and agg["value_sum"] == value_sum)

    app = spark.sparkContext.applicationId
    url = f"http://localhost:4049/api/v1/applications/{app}/stages"
    stages = json.loads(urllib.request.urlopen(url).read())
    sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    print(json.dumps({
        "n_paths": N_PATHS, "live_files": agg["n_files"],
        "rows_scanned": agg["rows_after"] + agg["n_deleted"],
        "rows_after": agg["rows_after"], "n_deleted": agg["n_deleted"],
        "closed_form_match": ok, "wall_sec": round(wall, 1),
        "shuffle_read_mb": round(sr / 1e6, 2),
        "shuffle_write_mb": round(sw / 1e6, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
