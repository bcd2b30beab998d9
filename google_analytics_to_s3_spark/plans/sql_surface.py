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


def save_marts_as_tables(
    spark: SparkSession,
    marts: dict[str, DataFrame],
    database: str = "ga",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> list[str]:
    """S11, durable half: persist the marts as catalog tables
    (``saveAsTable``) so they survive the session — the Spark-native
    equivalent of the reference's Glue-crawler-registered tables that
    Athena queries (collector-ga.yaml:614-635). Temp views
    (:func:`register_marts`) remain the zero-copy path for same-session
    SQL; catalog tables are the cross-session/BI-tool path.

    Parquet via the session catalog (Hive-style warehouse dir or a
    configured metastore). Pass ``partition_by`` (e.g. ``("year",
    "month", "day")`` when the marts carry date columns) so downstream
    reads partition-prune. Returns the fully-qualified table names.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    saved = []
    for name, df in marts.items():
        table = f"{database}.{'events_mart' if name == 'events' else name}"
        writer = df.write.mode(mode).format("parquet")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.saveAsTable(table)
        saved.append(table)
    return saved


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
