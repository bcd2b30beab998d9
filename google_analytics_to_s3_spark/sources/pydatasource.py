"""Custom Spark 4 Python Data Source: a deterministic GA-shaped event
generator, ``spark.read.format("ga_synth")``.

Demonstrates the modern source-extension point the reference's ingest
tier (S5-S7, collector + Firehose + Lambda readers) maps onto in
Spark 4: a ``pyspark.sql.datasource.DataSource`` with proper PLANNED
PARALLELISM — ``partitions()`` returns one ``InputPartition`` per day,
so Spark schedules one task per day and a 1000-day backfill fans out
across the cluster with no driver-side row generation (the rows are
produced executor-side per partition, exactly like a real connector
reads its own split).

The generator arithmetic matches ``sources/testdata.py``'s event
shape (user/type/value from hash-free modular arithmetic), so the
same query library runs on the synthetic source unchanged — useful
for load tests at arbitrary scale without writing parquet first.

Usage::

    from google_analytics_to_s3_spark.sources.pydatasource import (
        register_ga_synth,
    )
    register_ga_synth(spark)
    df = (spark.read.format("ga_synth")
          .option("days", 3).option("events_per_day", 1000).load())

Scale note: deterministic per-(day, index) rows mean the source is
idempotently re-readable — a retried task regenerates identical rows,
the same contract a parquet split gives the scheduler.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GA_SYNTH_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("day", LongType()),
        StructField("ts_ms", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_TYPES = ("view", "click", "signup", "purchase", "error")
_BASE_DAY = 19_700  # days since epoch; fixed so output is reproducible


class _DayPartition(InputPartition):
    def __init__(self, day_off: int, events_per_day: int) -> None:
        self.day_off = day_off
        self.events_per_day = events_per_day


class _GaSynthReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.days = int(options.get("days", 1))
        self.events_per_day = int(options.get("events_per_day", 1000))
        self.n_users = int(options.get("n_users", 100))

    def partitions(self) -> list[InputPartition]:
        # one split per day: Spark schedules days as independent tasks
        return [
            _DayPartition(d, self.events_per_day)
            for d in range(self.days)
        ]

    def read(self, partition: _DayPartition):
        day = _BASE_DAY + partition.day_off
        base_id = partition.day_off * partition.events_per_day
        day_ms = day * 86_400_000
        for i in range(partition.events_per_day):
            eid = base_id + i
            yield (
                eid,
                day,
                day_ms + (i * 86_400_000) // partition.events_per_day,
                eid * 7919 % self.n_users,
                _TYPES[eid % len(_TYPES)],
                float((eid * 37 % 10_000) / 100.0),
            )


class _GaSynthStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: each micro-batch is one synthetic
    day. Offsets are the day index, so the exactly-once replay
    contract is trivial to honor — ``readBetweenOffsets`` regenerates
    any [start, end) range bit-identically (the property a restarted
    checkpointed query relies on; unit-pinned in tests)."""

    def __init__(self, options: dict) -> None:
        self.events_per_day = int(options.get("events_per_day", 1000))
        self.n_users = int(options.get("n_users", 100))

    def initialOffset(self) -> dict:
        return {"day_off": 0}

    def _day_rows(self, day_off: int) -> list[tuple]:
        # materialized list, not a generator: the simple stream reader
        # prefetches rows driver-side and pickles them to executors
        p = _DayPartition(day_off, self.events_per_day)
        return list(_GaSynthReader(
            {"days": 1, "events_per_day": self.events_per_day,
             "n_users": self.n_users}
        ).read(p))

    def read(self, start: dict):
        day_off = start["day_off"]
        return self._day_rows(day_off), {"day_off": day_off + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for d in range(start["day_off"], end["day_off"]):
            yield from self._day_rows(d)


class GaSynthDataSource(DataSource):
    """``format("ga_synth")``: deterministic per-day event splits
    (batch) / one-day micro-batches (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "ga_synth"

    def schema(self) -> StructType:
        return GA_SYNTH_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _GaSynthReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return _GaSynthStreamReader(self.options)


def register_ga_synth(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(GaSynthDataSource)
