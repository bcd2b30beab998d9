"""Unit tests for the W1-W7/A2 sessionization chain on hand-built rows."""

import hashlib

from google_analytics_to_s3_spark.operators.sessionize import (
    THIRTY_MIN_MS,
    sessionize,
    with_session_flags,
    with_session_revenue,
)

MIN = 60 * 1000


def _hits(spark):
    # visitor A: 3 hits in one session, then a 45-min gap → second session
    # visitor B: single hit
    rows = [
        ("A", 0 * MIN, "m1", "pageview", None, None),
        ("A", 10 * MIN, "m2", "event", "purchase", "19.99"),
        ("A", 29 * MIN, "m3", "pageview", None, None),
        ("A", 74 * MIN, "m4", "pageview", None, None),
        ("B", 5 * MIN, "m5", "pageview", None, None),
    ]
    return spark.createDataFrame(
        rows, "body_cid string, received_at_apig long, message_id string, "
        "body_t string, body_pa string, body_tr string"
    )


def test_session_flags(spark):
    out = with_session_flags(
        _hits(spark), tiebreak_cols=("message_id",)
    ).collect()
    by_msg = {r.message_id: r for r in out}
    assert by_msg["m1"].is_new_session == 1
    assert by_msg["m2"].is_new_session == 0
    assert by_msg["m3"].is_new_session == 0
    assert by_msg["m4"].is_new_session == 1  # 45-min gap
    assert by_msg["m5"].is_new_session == 1
    assert by_msg["m1"].user_session_id == 1
    assert by_msg["m3"].user_session_id == 1
    assert by_msg["m4"].user_session_id == 2


def test_exact_30min_boundary_starts_new_session(spark):
    rows = [("A", 0, "m1"), ("A", THIRTY_MIN_MS, "m2"), ("A", THIRTY_MIN_MS + 1, "m3")]
    df = spark.createDataFrame(
        rows, "body_cid string, received_at_apig long, message_id string"
    )
    out = {r.message_id: r for r in with_session_flags(df).collect()}
    # reference main.py:417-419: gap >= 30 min starts a session
    assert out["m2"].is_new_session == 1
    assert out["m3"].is_new_session == 0


def test_visit_ids_and_sequence(spark):
    out = sessionize(_hits(spark), tiebreak_cols=("message_id",)).collect()
    by_msg = {r.message_id: r for r in out}
    # session 1 of A spans 0..29min
    for m in ("m1", "m2", "m3"):
        assert by_msg[m].visit_start == 0
        assert by_msg[m].visit_end == 29 * MIN
    assert by_msg["m4"].visit_start == 74 * MIN
    assert by_msg["m4"].visit_end == 74 * MIN
    # visit_id = sha1(cid || start || end), reference main.py:437
    expect = hashlib.sha1(f"A{0}{29 * MIN}".encode()).hexdigest()
    assert by_msg["m1"].visit_id == expect
    assert by_msg["m1"].visit_id == by_msg["m3"].visit_id
    assert by_msg["m4"].visit_id != by_msg["m1"].visit_id
    # event_sequence is per-visitor (reference quirk, main.py:438)
    assert [by_msg[m].event_sequence for m in ("m1", "m2", "m3", "m4")] == [1, 2, 3, 4]
    assert by_msg["m5"].event_sequence == 1


def test_session_revenue(spark):
    out = with_session_revenue(
        sessionize(_hits(spark), tiebreak_cols=("message_id",))
    ).collect()
    by_msg = {r.message_id: r for r in out}
    assert by_msg["m1"].total_revenue_per_session == 19.99
    assert by_msg["m4"].total_revenue_per_session is None
    assert by_msg["m5"].total_revenue_per_session is None


def test_single_shuffle_plan(spark):
    """The whole W1-W7 chain must plan exactly one Exchange."""
    plan = sessionize(_hits(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
