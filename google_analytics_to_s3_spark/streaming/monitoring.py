"""Pipeline observability (S10): per-batch throughput metrics and a
data-freshness check.

The reference emits a CloudWatch metric per S3 object landed
(reference functions/monitoring/s3/main.py:4-19) and alarms when fewer
than 1 object arrives per hour (collector-ga-monitoring.yaml:126-143).
The Spark-native equivalents:

- :class:`RowCountListener` — a ``StreamingQueryListener`` recording
  rows/sec and batch durations straight from the engine's progress
  events (no side-channel metric writes, no extra jobs).
- :func:`check_freshness` — the batch-side alarm: newest data file
  under a path must be younger than the SLO window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_id: str
    batch_id: int
    num_input_rows: int
    duration_ms: int | None
    timestamp: str


@dataclass
class RowCountListener(StreamingQueryListener):
    """Collects one :class:`BatchMetric` per micro-batch progress event.

    Register with ``spark.streams.addListener(listener)``; metrics
    accumulate driver-side (progress events are tiny — one dict per
    batch — so this is O(batches), never O(rows))."""

    metrics: list[BatchMetric] = field(default_factory=list)

    def onQueryStarted(self, event):  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self.metrics.append(
            BatchMetric(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=p.durationMs.get("triggerExecution"),
                timestamp=p.timestamp,
            )
        )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def total_rows(self) -> int:
        return sum(m.num_input_rows for m in self.metrics)


def check_freshness(
    spark: SparkSession,
    path: str,
    max_age_seconds: int,
    now_ms: int,
) -> tuple[bool, int | None]:
    """Is the newest data file under ``path`` younger than the SLO?

    Returns ``(fresh, newest_mtime_ms)``; a path with no data files is
    stale (``TreatMissingData: breaching``, like the reference alarm).
    ``now_ms`` is explicit so checks are deterministic and testable.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    newest: int | None = None
    try:
        it = fs.listFiles(jpath, True)
    except Exception:
        return (False, None)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().startswith(("_", ".")):
            continue
        mt = int(st.getModificationTime())
        newest = mt if newest is None else max(newest, mt)
    if newest is None:
        return (False, None)
    return (now_ms - newest <= max_age_seconds * 1000, newest)


def observe_scan_metrics(df, name: str = "scan_metrics",
                         value_col: str | None = None):
    """Attach zero-extra-scan pipeline metrics via Spark's Observation
    API: row count, null count and min/max of ``value_col`` are
    computed AS the job runs — no second aggregation pass over a
    100 TB input just to fill a metrics dashboard (the anti-pattern is
    ``df.count()`` next to ``df.write``, which doubles the scan).

    Returns ``(observation, observed_df)``. For batch, read
    ``observation.get`` after the action; for a STREAMING DataFrame the
    engine requires the string-name form of ``observe`` (Observation
    handles are batch-only), so ``observation`` is None and the named
    metrics surface per micro-batch in
    ``StreamingQueryProgress.observedMetrics`` — one metric definition
    serves both engines.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        v = F.col(value_col)
        metrics += [
            F.sum(v.isNull().cast("long")).alias("n_nulls"),
            F.min(v).alias("min_val"),
            F.max(v).alias("max_val"),
        ]
    if df.isStreaming:
        return None, df.observe(name, *metrics)
    obs = Observation(name)
    return obs, df.observe(obs, *metrics)
