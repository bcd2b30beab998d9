"""Raw Spark-SQL surface over registered views, with pushdown intact."""

from google_analytics_to_s3_spark.plans.sql_surface import (
    register_testdata_views,
    sql,
)


def test_sql_over_views(spark, sf_smoke):
    register_testdata_views(spark, sf_smoke)
    df = sql(
        spark,
        """
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'
        GROUP BY o_orderstatus
        """,
    )
    rows = df.collect()
    assert rows and all(r["n"] > 0 for r in rows)
    # the SQL-side filter must still reach the parquet scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_sql_window_over_events_ms(spark, sf_smoke):
    register_testdata_views(spark, sf_smoke)
    df = sql(
        spark,
        """
        SELECT user_id, ts_ms,
               lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
                 AS prev_ts
        FROM events_ms LIMIT 10
        """,
    )
    assert df.count() == 10


def test_save_marts_as_catalog_tables_roundtrip(spark):
    """S11 durable half: saveAsTable marts are queryable by catalog name
    in a fresh logical plan (no temp-view lineage) and survive
    clearCache; partition column prunes."""
    from pyspark.sql import functions as F

    from google_analytics_to_s3_spark.plans.sql_surface import (
        save_marts_as_tables,
    )

    marts = {
        "sessions": spark.range(6).select(
            F.col("id").alias("visit_id"),
            (F.col("id") % 2).alias("day"),
            (F.col("id") * 10.0).alias("revenue"),
        ),
        "events": spark.range(4).select(
            F.col("id").alias("event_id"), F.lit("click").alias("event_type")
        ),
    }
    try:
        saved = save_marts_as_tables(
            spark, marts, database="ga_test", partition_by=()
        )
        assert set(saved) == {"ga_test.sessions", "ga_test.events_mart"}
        assert {
            t.name for t in spark.catalog.listTables("ga_test")
        } >= {"sessions", "events_mart"}
        spark.catalog.clearCache()
        got = spark.sql(
            "SELECT day, CAST(sum(revenue) AS DOUBLE) AS rev "
            "FROM ga_test.sessions GROUP BY day ORDER BY day"
        ).collect()
        assert [(r["day"], r["rev"]) for r in got] == [(0, 60.0), (1, 90.0)]
        assert spark.table("ga_test.events_mart").count() == 4
        # overwrite mode really replaces
        save_marts_as_tables(
            spark, {"sessions": marts["sessions"].limit(2)}, database="ga_test"
        )
        assert spark.table("ga_test.sessions").count() == 2
    finally:
        spark.sql("DROP DATABASE IF EXISTS ga_test CASCADE")
