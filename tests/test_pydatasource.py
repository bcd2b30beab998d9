"""Spark 4 Python Data Source (sources/pydatasource.py): planned
parallelism, determinism, and compatibility with the query library."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.sources.pydatasource import (
    register_ga_synth,
)


def _read(spark, **opts):
    register_ga_synth(spark)
    r = spark.read.format("ga_synth")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


class TestGaSynthSource:
    def test_row_counts_and_schema(self, spark):
        df = _read(spark, days=3, events_per_day=500)
        assert df.count() == 1500
        assert df.columns == [
            "event_id", "day", "ts_ms", "user_id", "event_type", "value",
        ]

    def test_one_partition_per_day(self, spark):
        df = _read(spark, days=4, events_per_day=10)
        assert df.rdd.getNumPartitions() == 4
        per_day = {r["day"]: r["n"] for r in
                   df.groupBy("day").agg(F.count("*").alias("n"))
                   .collect()}
        assert len(per_day) == 4 and set(per_day.values()) == {10}

    def test_deterministic_re_read(self, spark):
        a = sorted(map(tuple, _read(spark, days=2,
                                    events_per_day=50).collect()))
        b = sorted(map(tuple, _read(spark, days=2,
                                    events_per_day=50).collect()))
        assert a == b

    def test_feeds_query_library(self, spark):
        # the synthetic source composes with the operator library:
        # sessionless day-grain rollup over the generated stream
        df = _read(spark, days=2, events_per_day=200)
        out = (
            df.groupBy("day", "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.floor(F.col("value") * 100).cast("long"))
                 .alias("cents"))
        )
        rows = out.collect()
        assert len(rows) == 2 * 5
        assert all(r["n"] == 40 for r in rows)  # 200 / 5 types

    def test_filter_pushes_into_tasks(self, spark):
        # a day filter prunes whole partitions' OUTPUT; rows from other
        # days never reach the driver
        df = _read(spark, days=5, events_per_day=20)
        one = df.filter(F.col("day") == 19_701)
        assert one.count() == 20


class TestGaSynthStreaming:
    def test_one_day_per_microbatch(self, spark, tmp_path):
        register_ga_synth(spark)
        stream = (
            spark.readStream.format("ga_synth")
            .option("events_per_day", 50).load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("ga_synth_stream").outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            import time

            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.table("ga_synth_stream").count() >= 100:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        got = spark.table("ga_synth_stream")
        assert got.count() >= 100
        per_day = {r["day"]: r["n"] for r in
                   got.groupBy("day").count()
                   .withColumnRenamed("count", "n").collect()}
        # each fully-delivered day carries exactly events_per_day rows
        full_days = [d for d, n in per_day.items() if n == 50]
        assert len(full_days) >= 2
        assert min(per_day) == 19_700  # starts at the fixed base day

    def test_replay_between_offsets_bit_identical(self):
        from google_analytics_to_s3_spark.sources.pydatasource import (
            _GaSynthStreamReader,
        )

        r = _GaSynthStreamReader({"events_per_day": 30})
        once, _nxt = r.read({"day_off": 2})
        replay = r.readBetweenOffsets({"day_off": 2}, {"day_off": 3})
        assert list(once) == list(replay)

    def test_stream_matches_batch_rows(self):
        # streaming day k == batch partition k: one generator, two APIs
        from google_analytics_to_s3_spark.sources.pydatasource import (
            _DayPartition,
            _GaSynthReader,
            _GaSynthStreamReader,
        )

        batch = list(_GaSynthReader(
            {"days": 3, "events_per_day": 20}
        ).read(_DayPartition(1, 20)))
        stream, _ = _GaSynthStreamReader(
            {"events_per_day": 20}
        ).read({"day_off": 1})
        assert batch == list(stream)

    def test_stream_sessionizes_like_batch(self, spark, tmp_path):
        """Integration: the custom streaming source feeds the native
        session_window aggregation, and the complete-mode result equals
        the same aggregation run in batch over the same generated days
        — custom source x streaming sessionization, end to end."""
        register_ga_synth(spark)
        opts = {"events_per_day": 120, "n_users": 10}

        def sessions(df):
            ev = df.select(
                "user_id",
                F.timestamp_millis(F.col("ts_ms")).alias("ts"),
            )
            return ev.groupBy(
                "user_id", F.session_window("ts", "30 minutes")
            ).agg(F.count(F.lit(1)).alias("n_events")).select(
                "user_id",
                F.col("session_window.start").alias("s"),
                F.col("session_window.end").alias("e"),
                "n_events",
            )

        stream = (
            spark.readStream.format("ga_synth")
            .option("events_per_day", opts["events_per_day"])
            .option("n_users", opts["n_users"]).load()
        )
        q = (
            sessions(stream)
            .writeStream.format("memory").queryName("ga_synth_sess")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
            .start()
        )
        try:
            import time

            # wait until at least 2 full days have been delivered
            deadline = time.time() + 60
            while time.time() < deadline:
                n_days = (
                    spark.table("ga_synth_sess")
                    .select(F.expr("date_trunc('DAY', s)").alias("d"))
                    .distinct().count()
                )
                if n_days >= 3:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        got = spark.table("ga_synth_sess")
        # batch twin over the FULLY delivered days only (the last day
        # may be mid-delivery when the query stops)
        full_days = [
            r["d"] for r in got.select(
                F.expr("CAST(date_trunc('DAY', s) AS DATE)").alias("d")
            ).distinct().collect()
        ]
        full_days = sorted(full_days)[:-1]
        assert len(full_days) >= 2
        batch = (
            spark.read.format("ga_synth")
            .option("days", len(full_days) + 1)
            .option("events_per_day", opts["events_per_day"])
            .option("n_users", opts["n_users"]).load()
        )
        want = sessions(batch).filter(
            F.expr("CAST(date_trunc('DAY', s) AS DATE)").isin(full_days)
        )
        got_f = got.filter(
            F.expr("CAST(date_trunc('DAY', s) AS DATE)").isin(full_days)
        )
        assert sorted(map(tuple, got_f.collect())) == sorted(
            map(tuple, want.collect())
        )
