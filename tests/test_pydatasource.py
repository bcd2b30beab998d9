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
