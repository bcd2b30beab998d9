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
