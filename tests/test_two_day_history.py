"""EP3 across two days: session-history parquet roundtrip (S2/S3) and
cross-day touchpoint accumulation (main.py:1265-1273 semantics)."""

from google_analytics_to_s3_spark.plans.pipeline import run_daily_pipeline
from google_analytics_to_s3_spark.sources.ga import (
    append_session_history,
    read_enriched_hits,
)
from google_analytics_to_s3_spark.testing.fixtures import (
    enriched_hits_day,
    write_jsonl,
)

DAY_MS = 86400000


def test_two_day_history_accumulation(spark, tmp_path):
    day1 = enriched_hits_day()
    # day 2: v1 returns a day later via google (organic), then direct.
    day2 = [
        dict(
            h,
            message_id=h["message_id"] + "d2",
            received_at_apig=str(int(h["received_at_apig"]) + DAY_MS),
        )
        for h in day1
        if h["body_cid"] == "v1"
    ]
    day2[0] = dict(
        day2[0],
        body_dr="https://www.google.com/",
        body_dl="http://shop.example/back",
    )

    p1, p2 = str(tmp_path / "d1.jsonl"), str(tmp_path / "d2.jsonl")
    write_jsonl(day1, p1)
    write_jsonl(day2, p2)
    hist_path = str(tmp_path / "hist")

    m1 = run_daily_pipeline(read_enriched_hits(spark, p1))
    append_session_history(m1["sessions"], hist_path)

    hist = spark.read.parquet(hist_path)
    m2 = run_daily_pipeline(
        read_enriched_hits(spark, p2), session_history=hist
    )
    v1 = sorted(
        (r for r in m2["sessions"].collect() if r.fullVisitorId == "v1"),
        key=lambda r: r.timestamp,
    )
    # 2 sessions on day 1 (history) + 2 on day 2, all carrying the full
    # cross-day touchpoint state
    assert len(v1) == 4
    expected_tp = ["newsletter", "(direct)", "google", "(direct)"]
    assert v1[-1].touchpoints == expected_tp
    assert all(r.touchpoints == expected_tp for r in v1)
    assert v1[-1].touchpoints_wo_direct == ["newsletter", "google"]
    assert v1[-1].first_touchpoint == "newsletter"
    assert v1[-1].last_touchpoint == "google"
    # day-2 sessions' own attribution
    assert v1[2].trafficSource_source == "google"
    assert v1[2].trafficSource_medium == "organic"
