"""S10 observability: streaming row-count metrics + freshness alarm."""

import json
import os
import time

from google_analytics_to_s3_spark.streaming.monitoring import (
    RowCountListener,
    check_freshness,
)
from google_analytics_to_s3_spark.streaming.sessions import (
    read_events_stream,
    write_stream,
)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_row_count_listener(spark, tmp_path):
    rows = [
        {"event_id": i, "user_id": 1, "ts_ms": 1_700_000_000_000 + i}
        for i in range(7)
    ]
    in_dir = str(tmp_path / "in")
    _write_jsonl(f"{in_dir}/part-0.json", rows)

    listener = RowCountListener()
    spark.streams.addListener(listener)
    try:
        q = write_stream(
            read_events_stream(spark, in_dir),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination()
        # listener delivery is async; give the bus a moment
        deadline = time.time() + 10
        while listener.total_rows() < 7 and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert listener.total_rows() == 7
    assert all(m.batch_id >= 0 for m in listener.metrics)


def test_check_freshness(spark, tmp_path):
    out = str(tmp_path / "data")
    now_ms = int(time.time() * 1000)
    # missing path -> stale (TreatMissingData: breaching)
    assert check_freshness(spark, out, 3600, now_ms) == (False, None)

    spark.range(10).write.parquet(out)
    fresh, mtime = check_freshness(spark, out, 3600, now_ms + 1000)
    assert fresh and mtime is not None
    # same files, SLO window already past -> alarm
    stale_now = mtime + 3601 * 1000
    fresh2, _ = check_freshness(spark, out, 3600, stale_now)
    assert not fresh2


class TestObserveScanMetrics:
    def test_batch_metrics_no_second_scan(self, spark):
        from google_analytics_to_s3_spark.streaming.monitoring import (
            observe_scan_metrics,
        )

        df = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 9.0)], "id long, v double"
        )
        obs, out = observe_scan_metrics(df, "m1", value_col="v")
        out.write.format("noop").mode("overwrite").save()
        got = obs.get
        assert got["n_rows"] == 3 and got["n_nulls"] == 1
        assert got["min_val"] == 5.0 and got["max_val"] == 9.0

    def test_rows_only(self, spark):
        from google_analytics_to_s3_spark.streaming.monitoring import (
            observe_scan_metrics,
        )

        obs, out = observe_scan_metrics(spark.range(7), "m2")
        out.write.format("noop").mode("overwrite").save()
        assert obs.get["n_rows"] == 7

    def test_streaming_observed_metrics(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from google_analytics_to_s3_spark.streaming.monitoring import (
            observe_scan_metrics,
        )

        src = spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        )
        src.write.mode("overwrite").parquet(str(tmp_path / "in"))
        stream = spark.readStream.schema(src.schema).parquet(
            str(tmp_path / "in")
        )
        _, observed = observe_scan_metrics(stream, "m3", value_col="v")
        q = (
            observed.groupBy().agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory").queryName("obs_stream")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        progress = [p for p in q.recentProgress
                    if p.observedMetrics.get("m3")]
        assert progress, "no observed metrics in any progress event"
        m = progress[-1].observedMetrics["m3"]
        assert m["n_rows"] == 20 and m["max_val"] == 19.0
