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
