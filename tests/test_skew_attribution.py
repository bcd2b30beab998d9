"""Tests for skew utilities and incremental touchpoint state."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.attribution import (
    merge_touchpoint_summaries,
    summary_attribution,
    touchpoint_summary,
    with_touchpoints,
)
from google_analytics_to_s3_spark.operators.skew import (
    hot_keys,
    salted_sum,
    split_hot_cold,
)


def _events(spark):
    rows = []
    # hot visitor "bot" with 200 hits, cold visitors with a few
    for i in range(200):
        rows.append(("bot", 1000 + i, 1.0))
    for v in ("a", "b", "c"):
        for i in range(5):
            rows.append((v, 2000 + i, 2.0))
    return spark.createDataFrame(rows, ["visitor", "ts", "x"])


def test_hot_keys_and_split(spark):
    df = _events(spark)
    hot = {r["visitor"] for r in hot_keys(df, "visitor", 100).collect()}
    assert hot == {"bot"}
    cold_df, hot_df = split_hot_cold(df, "visitor", 100)
    assert {r["visitor"] for r in cold_df.select("visitor").distinct().collect()} == {
        "a", "b", "c"
    }
    assert hot_df.count() == 200
    assert cold_df.count() + hot_df.count() == df.count()


def test_salted_sum_matches_plain(spark):
    df = _events(spark)
    plain = {
        r["visitor"]: r["total"]
        for r in df.groupBy("visitor").agg(F.sum("x").alias("total")).collect()
    }
    salted = {
        r["visitor"]: r["total"]
        for r in salted_sum(df, "visitor", F.sum("x"), n_salts=8).collect()
    }
    assert salted == plain


def _touch_rows(day, visitors):
    rows = []
    srcs = ["google", "(direct)", "facebook"]
    for v in visitors:
        for i in range(3):
            rows.append((v, day * 100000 + i, srcs[(v + day + i) % 3]))
    return rows


def test_incremental_touchpoints_matches_recompute(spark):
    cols = ["visitor", "ts", "source"]
    day1 = spark.createDataFrame(_touch_rows(1, [1, 2, 3]), cols)
    day2 = spark.createDataFrame(_touch_rows(2, [2, 3, 4]), cols)

    # incremental path: summarize each day, merge states
    s1 = touchpoint_summary(day1, "visitor", "ts", "source", ("ts",))
    s2 = touchpoint_summary(day2, "visitor", "ts", "source", ("ts",))
    merged = summary_attribution(merge_touchpoint_summaries(s1, s2, "visitor"))

    # recompute path: full-history window (the reference's design)
    full = with_touchpoints(
        day1.unionByName(day2), "visitor", "ts", "source", ("ts",)
    ).select(
        "visitor", "touchpoints", "touchpoints_wo_direct",
        "first_touchpoint", "last_touchpoint",
    ).distinct()

    inc = {
        r["visitor"]: (
            r["touchpoints"], r["touchpoints_wo_direct"],
            r["first_touchpoint"], r["last_touchpoint"],
        )
        for r in merged.collect()
    }
    ref = {
        r["visitor"]: (
            r["touchpoints"], r["touchpoints_wo_direct"],
            r["first_touchpoint"], r["last_touchpoint"],
        )
        for r in full.collect()
    }
    assert inc == ref
    assert set(inc) == {1, 2, 3, 4}


def _hits(spark):
    """Minimal pipeline-shaped hits: one bot visitor (300 hits) drowning
    three normal visitors, with a session gap planted for visitor 'a'."""
    rows = []
    for i in range(300):
        rows.append((f"m{i:04d}", "bot", "pageview", 1_000_000 + i * 1000, None, None))
    for j, v in enumerate(("a", "b", "c")):
        for i in range(4):
            # 'a' gets a >30min gap between hit 1 and 2
            gap = 40 * 60 * 1000 if (v == "a" and i >= 2) else 0
            rows.append(
                (f"n{v}{i}", v, "pageview", 5_000_000 + j * 100 + i * 1000 + gap, None, None)
            )
    return spark.createDataFrame(
        rows,
        "message_id string, body_cid string, body_t string, "
        "received_ms long, body_tr string, body_pa string",
    )


def test_sessionize_hot_cold_split_identical_output(spark):
    from google_analytics_to_s3_spark.plans.pipeline import sessionized_hits

    df = _hits(spark)
    base = sessionized_hits(df)
    split = sessionized_hits(df, hot_visitor_min_hits=100)

    key = ["message_id"]
    cols = sorted(base.columns)
    assert sorted(split.columns) == cols
    b = [tuple(r[c] for c in cols) for r in base.orderBy(*key).collect()]
    s = [tuple(r[c] for c in cols) for r in split.orderBy(*key).collect()]
    assert b == s
    # visitor 'a' really has 2 sessions (the planted gap matters)
    a_sessions = {
        r["user_session_id"]
        for r in split.filter(F.col("body_cid") == "a").collect()
    }
    assert a_sessions == {1, 2}


def test_sessionize_hot_cold_split_plan(spark):
    """The split must broadcast the tiny hot-key set (no fact-table
    shuffle for the anti/semi joins) and sessionize in two branches."""
    from google_analytics_to_s3_spark.plans.pipeline import sessionized_hits

    df = _hits(spark)
    plan = spark._jvm.PythonSQLUtils.explainString(
        sessionized_hits(df, hot_visitor_min_hits=100)
        ._jdf.queryExecution(),
        "simple",
    )
    assert "LeftAnti, BuildRight" in plan.replace("BuildRight, false", "BuildRight"), plan
    assert "LeftSemi" in plan, plan
    assert plan.count("Window") >= 2  # one chain per branch
    assert "CartesianProduct" not in plan


def _credits(spark):
    from google_analytics_to_s3_spark.operators.attribution import (
        attribution_credits,
    )

    # v1: 4 touches (middle split observable), mixed direct;
    # v2: all-direct (last-non-direct fallback); v3: single touch
    touches = spark.createDataFrame(
        [
            ("v1", 0, "google"),
            ("v1", 1_000, "(direct)"),
            ("v1", 86_400_000, "facebook"),
            ("v1", 172_800_000, "(direct)"),
            ("v2", 0, "(direct)"),
            ("v2", 10, "(direct)"),
            ("v3", 0, "newsletter"),
        ],
        ["visitor", "ts", "source"],
    )
    conv = spark.createDataFrame(
        [("v1", 100.0), ("v2", 10.0), ("v3", 7.0)],
        ["visitor", "conv_value"],
    )
    out = attribution_credits(
        touches,
        conv,
        visitor_col="visitor",
        ts_col="ts",
        source_col="source",
        halflife_ms=86_400_000,
        decay_cap=20,
    )
    return {
        (r["visitor"], r["touch_idx"]): r for r in out.collect()
    }


def test_attribution_credit_models(spark):
    rows = _credits(spark)
    f = lambda v, i, c: float(rows[(v, i)][c])  # noqa: E731

    # every model conserves the conversion value per visitor
    for v, total in (("v1", 100.0), ("v2", 10.0), ("v3", 7.0)):
        n = max(i for (vv, i) in rows if vv == v)
        for model in (
            "credit_first", "credit_last", "credit_last_nd",
            "credit_linear", "credit_position", "credit_decay",
        ):
            s = sum(f(v, i, model) for i in range(1, n + 1))
            assert abs(s - total) < 1e-4, (v, model, s)

    # first/last/U-shape on the 4-touch visitor
    assert f("v1", 1, "credit_first") == 100.0
    assert f("v1", 4, "credit_last") == 100.0
    assert [f("v1", i, "credit_position") for i in range(1, 5)] == [
        40.0, 10.0, 10.0, 40.0,
    ]
    # last non-direct goes to touch 3 (facebook), not the direct tail
    assert f("v1", 3, "credit_last_nd") == 100.0
    # all-direct visitor: fallback credits the final touch
    assert f("v2", 2, "credit_last_nd") == 10.0
    # time decay: strictly newer touches never get less credit
    d = [f("v1", i, "credit_decay") for i in range(1, 5)]
    assert d[0] < d[2] and d[2] <= d[3]
    # single touch: everything everywhere
    for model in ("credit_linear", "credit_position", "credit_decay"):
        assert f("v3", 1, model) == 7.0
