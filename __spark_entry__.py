"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship daily-engagement query on sf0.001
  (sessionize + day-grain rollup).
- ``queries()``: one callable per implemented operator (SURVEY.md §2),
  defined in ``google_analytics_to_s3_spark.plans.driver_queries``.
- ``oracle_sql()``: DuckDB-equivalent ANSI SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from google_analytics_to_s3_spark.plans import driver_queries as _dq  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dq.q_daily_engagement(spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_dq.ORACLES)
