"""Sink-side operators: Hive-layout daily marts (S4), session-history
append (S3), catalog registration (S11)."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.sources.ga import (
    append_session_history,
    load_session_history,
    save_daily_marts,
)


def test_save_daily_marts_layout_and_pruning(spark, tmp_path):
    base = str(tmp_path / "agg")
    marts = {
        "sessions": spark.createDataFrame([(1, "a")], ["id", "v"]),
        "events": spark.createDataFrame([(2, "b"), (3, "c")], ["id", "v"]),
    }
    save_daily_marts(marts, base, "2024-03-05")
    save_daily_marts(
        {"sessions": spark.createDataFrame([(9, "z")], ["id", "v"])},
        base,
        "2024-03-06",
    )

    # Hive-partitioned read over the whole layout; partition filters prune.
    df = spark.read.option("basePath", base).parquet(f"{base}/type=sessions")
    assert set(df.columns) >= {"id", "v", "year", "month", "day"}
    day5 = df.filter((F.col("day") == 5))
    assert [r["id"] for r in day5.collect()] == [1]
    plan = day5._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    both_days = spark.read.option("basePath", base).parquet(
        f"{base}/type=sessions"
    )
    assert both_days.count() == 2


def test_session_history_roundtrip(spark, tmp_path):
    path = str(tmp_path / "hist")
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    # absent history -> empty frame with the right schema
    empty = load_session_history(spark, path, df.schema)
    assert empty.count() == 0 and empty.schema == df.schema
    append_session_history(df, path)
    append_session_history(df, path)
    assert load_session_history(spark, path, df.schema).count() == 2


def test_catalog_registration(spark, tmp_path):
    """S11: the Glue-crawler equivalent is just saveAsTable."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS marts_test LOCATION '{tmp_path}/wh'"
    )
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        df.write.mode("overwrite").saveAsTable("marts_test.sessions")
        assert spark.table("marts_test.sessions").count() == 2
        assert spark.catalog.tableExists("marts_test.sessions")
    finally:
        spark.sql("DROP TABLE IF EXISTS marts_test.sessions")
        spark.sql("DROP DATABASE IF EXISTS marts_test")
