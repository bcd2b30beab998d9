"""Property-based tests (hypothesis) for the gap-sessionization
invariants — the correctness core the reference never tested."""

from hypothesis import given, settings
from hypothesis import strategies as st

from google_analytics_to_s3_spark.operators.sessionize import (
    THIRTY_MIN_MS,
    sessionize,
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # visitor
        st.integers(min_value=0, max_value=10**7),        # ts offset ms
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_session_invariants(spark_prop, events):
    rows = [(v, ts, i) for i, (v, ts) in enumerate(events)]
    df = spark_prop.createDataFrame(rows, ["visitor", "ts", "eid"])
    out = sessionize(
        df, visitor_col="visitor", ts_col="ts", tiebreak_cols=("eid",)
    ).collect()

    by_visitor: dict = {}
    for r in out:
        by_visitor.setdefault(r["visitor"], []).append(r)

    for v, rs in by_visitor.items():
        rs.sort(key=lambda r: (r["ts"], r["eid"]))
        sessions: dict = {}
        prev = None
        for r in rs:
            sid = r["user_session_id"]
            # session numbers start at 1 and never decrease
            assert sid >= 1
            if prev is not None:
                gap = r["ts"] - prev["ts"]
                if gap >= THIRTY_MIN_MS:
                    # boundary: must open a new session
                    assert sid == prev["user_session_id"] + 1
                    assert r["is_new_session"] == 1
                else:
                    assert sid == prev["user_session_id"]
                    assert r["is_new_session"] == 0
            else:
                assert sid == 1 and r["is_new_session"] == 1
            sessions.setdefault(sid, []).append(r)
            prev = r
        for sid, srs in sessions.items():
            tss = [r["ts"] for r in srs]
            # visit bounds = min/max of the session's events, on every row
            assert all(r["visit_start"] == min(tss) for r in srs)
            assert all(r["visit_end"] == max(tss) for r in srs)
            # one visit_id per session, distinct across a visitor's sessions
            assert len({r["visit_id"] for r in srs}) == 1
        ids = [
            srs[0]["visit_id"] for srs in sessions.values()
        ]
        assert len(set(ids)) == len(ids)
        # event_sequence is a permutation of 1..n per visitor
        assert sorted(r["event_sequence"] for r in rs) == list(
            range(1, len(rs) + 1)
        )


# --- winnowing guarantee (Schleimer/Wilkerson/Aiken §2) -------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ALPHA = "abcdef "


@settings(max_examples=15, deadline=None)
@given(
    prefix_a=st.text(_ALPHA, max_size=20),
    suffix_a=st.text(_ALPHA, max_size=20),
    prefix_b=st.text(_ALPHA, max_size=20),
    suffix_b=st.text(_ALPHA, max_size=20),
    shared=st.text("xyzuvw", min_size=11, max_size=25),
)
def test_winnow_shared_substring_guarantee(
    spark_prop, prefix_a, suffix_a, prefix_b, suffix_b, shared
):
    """Any two texts sharing a substring of length >= k+w-1 (= 11 at
    k=8, w=4) must share at least one winnow fingerprint — the paper's
    detection guarantee. The shared block uses a disjoint alphabet so
    the guarantee isn't satisfied by accident."""
    from google_analytics_to_s3_spark.operators.text import (
        winnow_fingerprints_pandas,
    )

    rows = [
        ("a", prefix_a + shared + suffix_a),
        ("b", prefix_b + shared + suffix_b),
    ]
    df = spark_prop.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: set(r["f"])
        for r in df.select(
            "doc_id",
            winnow_fingerprints_pandas("text", k=8, w=4).alias("f"),
        ).collect()
    }
    assert got["a"] & got["b"], rows
