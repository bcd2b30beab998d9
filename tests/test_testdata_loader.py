"""load_events must normalize every ts dtype the driver's datagen has
shipped (nanos-as-long, TIMESTAMP micros read as NTZ) to the same
epoch-millis ts_ms — and stay independent of the session timezone,
which the GA pipeline pins to Europe/Berlin."""

import datetime
import os

from google_analytics_to_s3_spark.sources.testdata import load_events


def _write(spark, tmp_path, rows, schema, name):
    p = os.path.join(str(tmp_path), name)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(p, "events.parquet")
    )
    return p


def test_ts_ms_from_timestamp_and_long_agree(spark, tmp_path):
    base_ms = 1704067200123  # 2024-01-01 00:00:00.123 UTC
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0, 123000)

    d_long = _write(
        spark, tmp_path, [(1, base_ms * 1_000_000)],
        "event_id long, ts long", "as_long",
    )
    d_ts = _write(
        spark, tmp_path, [(1, ts)],
        "event_id long, ts timestamp_ntz", "as_ntz",
    )
    got_long = load_events(spark, d_long).select("ts_ms").first()[0]
    got_ts = load_events(spark, d_ts).select("ts_ms").first()[0]
    assert got_long == base_ms
    # the NTZ wall-clock value must convert timezone-free: the session
    # runs Europe/Berlin, where a tz-aware cast would shift by -1h
    assert got_ts == base_ms
    assert spark.conf.get("spark.sql.session.timeZone") == "Europe/Berlin"
