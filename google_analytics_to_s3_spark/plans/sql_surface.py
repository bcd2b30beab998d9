"""Plain-SQL query surface: register the engine's tables and marts as
views so users can query with ``spark.sql`` strings (the Athena-over-
catalog experience of the reference, SURVEY §2.1 S11 / §3 EP3-5 —
Spark's catalog replaces the Glue crawler).

Temp views are metadata-only: Catalyst sees one plan end-to-end, so
filters written in SQL still push down to the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import TABLES, load_events, load_table


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """One temp view per testdata table; ``events`` additionally gets
    the epoch-millis clock column the session operators use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    load_events(spark, sf_dir).createOrReplaceTempView("events_ms")


def register_marts(spark: SparkSession, marts: dict[str, DataFrame]) -> None:
    """Expose pipeline outputs (plans/pipeline.run_daily_pipeline) as
    queryable views: sessions, pageviews, events_mart, ..."""
    for name, df in marts.items():
        view = f"{name}_mart" if name == "events" else name
        df.createOrReplaceTempView(view)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
