"""SparkSession factory with scale-ready defaults.

The reference pins its session timezone to Europe/Berlin
(reference functions/sessionization/main.py:298); we keep that for the GA
pipeline but make it a parameter. All performance-relevant knobs are set
here once so every entry point (tests, bench, driver) gets the same plan
behavior:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
  essential at 100 TB where static shuffle partition counts are wrong.
- `nanosAsLong` so nanosecond parquet timestamps (unsupported by Spark's
  vectorized reader) load as epoch-nanos longs instead of failing.
- Arrow enabled for the few pandas-UDF code paths (UA parsing etc.).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs that queries depend on. Applied both at
# build time and, via ensure_runtime_confs(), on sessions we did not
# create (e.g. the correctness driver's session).
RUNTIME_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # GA querystrings can repeat keys; Python's dict(parse_qsl(...)) in the
    # reference keeps the last occurrence — mirror that in str_to_map.
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # PySpark 4's DataFrame-debugging call-site capture wraps EVERY
    # DataFrame/Column API call with getActiveSession + conf.get +
    # origin set/clear — ~5 extra py4j round trips per operation, which
    # profiled as ~70% of all driver py4j traffic during plan
    # construction (r13, guide §7.3: driver-side single-threaded work).
    # Costs only call-site enrichment of error messages; plans,
    # results and executor behavior are unchanged.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def _reset_debugging_cache() -> None:
    """PySpark caches the dataFrameDebugging flag process-wide on first
    use; clear it so a conf applied to an externally created session
    (ensure_runtime_confs) still takes effect in that process."""
    try:
        from pyspark.errors import utils as _eu

        _eu._enable_debugging_cache = None
    except Exception:
        pass


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally created session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Not runtime-settable in this deployment — keep going; the
            # query-level fallbacks (explicit schemas) still work.
            pass
    _reset_debugging_cache()
    return spark


def get_spark(
    app_name: str = "ga-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    timezone: str = "Europe/Berlin",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master=None`` defers to spark-submit / the environment; tests pass
    ``local[N]``. ``shuffle_partitions=None`` leaves Spark's default in
    place and lets AQE coalesce — on a real cluster you'd size it to
    ~2-3x total cores; locally the bench sets it to the CPU count.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        builder = builder.master(master)

    conf = dict(RUNTIME_CONFS)
    conf["spark.sql.session.timeZone"] = timezone
    # Parquet writer defaults: compressed, dictionary-encoded columnar out.
    conf["spark.sql.parquet.compression.codec"] = "snappy"
    # Let Spark pick broadcast joins for small dims; AQE refines at runtime.
    conf["spark.sql.autoBroadcastJoinThreshold"] = "64MB"
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)

    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # If we attached to a pre-existing session, still apply runtime confs.
    ensure_runtime_confs(spark)
    return spark
