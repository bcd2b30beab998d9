"""Unit coverage for canonical_url edge cases and the privacy
(erasure) operators — the paths the driver queries exercise only on
well-formed synthesized data."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.functions.url import canonical_url
from google_analytics_to_s3_spark.operators.privacy import (
    erase_users,
    erasure_report,
)


def _canon(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(canonical_url(F.lit(url)).alias("c"))
        .first()["c"]
    )


class TestCanonicalUrl:
    def test_tracking_params_dropped_and_sorted(self, spark):
        assert (
            _canon(
                spark,
                "http://Shop.Example:80/p/3/?ref=r2&utm_campaign=c1"
                "&q=2&fbclid=987#frag",
            )
            == "http://shop.example/p/3?q=2&ref=r2"
        )

    def test_no_query_no_trailing_slash(self, spark):
        assert _canon(spark, "https://a.example/x") == "https://a.example/x"

    def test_root_path_preserved(self, spark):
        # empty path canonicalizes to "/", not ""
        assert _canon(spark, "http://a.example") == "http://a.example/"
        assert _canon(spark, "http://a.example/?utm_source=x") == (
            "http://a.example/"
        )

    def test_all_params_tracking(self, spark):
        assert (
            _canon(spark, "http://a.example/p?utm_source=n&gclid=123")
            == "http://a.example/p"
        )

    def test_valueless_param_dropped(self, spark):
        # "flag" (no '=') has a NULL map value; concat() nulls it out and
        # array_join skips it — documented lenient behavior
        assert (
            _canon(spark, "http://a.example/p?flag&q=1")
            == "http://a.example/p?q=1"
        )

    def test_case_and_order_invariance(self, spark):
        variants = [
            "http://A.example/p?b=2&a=1",
            "http://a.EXAMPLE:80/p/?a=1&b=2#x",
            "http://a.example/p?a=1&utm_medium=m&b=2",
        ]
        canons = {_canon(spark, v) for v in variants}
        assert canons == {"http://a.example/p?a=1&b=2"}


class TestErasure:
    def _tables(self, spark):
        df = spark.createDataFrame(
            [(i, f"u{i % 4}") for i in range(20)], "id long, who string"
        )
        requests = spark.createDataFrame([("u1",), ("u3",), ("ghost",)],
                                         "who string")
        return df, requests

    def test_erase_users_removes_requested(self, spark):
        df, requests = self._tables(spark)
        kept = erase_users(df, requests, "who")
        whos = {r["who"] for r in kept.collect()}
        assert whos == {"u0", "u2"}
        assert kept.count() == 10

    def test_report_counts(self, spark):
        df, requests = self._tables(spark)
        rep = {r["table_name"]: r for r in
               erasure_report([("t", df, "who")], requests).collect()}
        r = rep["t"]
        assert r["rows_total"] == 20
        assert r["rows_purged"] == 10
        assert r["rows_kept"] == 10
        # "ghost" is requested but absent — not counted
        assert r["users_purged"] == 2

    def test_report_no_hits(self, spark):
        df, _ = self._tables(spark)
        requests = spark.createDataFrame([("nobody",)], "who string")
        r = erasure_report([("t", df, "who")], requests).first()
        assert r["rows_purged"] == 0 and r["users_purged"] == 0
        assert r["rows_kept"] == 20

    def test_report_kept_equals_erased_count(self, spark):
        df, requests = self._tables(spark)
        rep = erasure_report([("t", df, "who")], requests).first()
        assert rep["rows_kept"] == erase_users(df, requests, "who").count()

    def test_report_survives_reserved_column_names(self, spark):
        # a fact table that already owns the operator's old internal
        # names must not produce ambiguous references or wrong counts
        df = spark.createDataFrame(
            [(i, f"u{i % 4}", "x", 9) for i in range(20)],
            "id long, who string, _erase_key string, _erase_hit long",
        )
        requests = spark.createDataFrame([("u1",)], "who string")
        r = erasure_report([("t", df, "who")], requests).first()
        assert r["rows_purged"] == 5 and r["users_purged"] == 1

    def test_report_empty_table_list(self, spark):
        _, requests = self._tables(spark)
        rep = erasure_report([], requests)
        assert rep.count() == 0
        assert rep.columns == [
            "table_name", "rows_total", "rows_purged", "rows_kept",
            "users_purged",
        ]

    def test_stitch_edges_rejects_colliding_user_ids(self, spark):
        # device node ids live above _DEV_BASE; a user_id at/above the
        # base would silently merge unrelated users (ADVICE r4). The
        # invariant is enforced LAZILY (ADVICE r5: construction must
        # not run a scan): building the plan succeeds, executing it
        # fails on the violating row.
        import pytest as _pytest

        from google_analytics_to_s3_spark.plans.driver_queries_identity \
            import _DEV_BASE, _stitch_edges

        bad = spark.createDataFrame(
            [(1, 7), (2, _DEV_BASE + 5)], "event_id long, user_id long"
        )
        edges = _stitch_edges(bad)  # plan construction: no job, no error
        with _pytest.raises(Exception, match="node-id bases"):
            edges.collect()

    def test_stitch_edges_construction_is_lazy(self, spark):
        # merely building the edge plan must not trigger a Spark job
        # (plan-shape tests and registry enumeration depend on it)
        from google_analytics_to_s3_spark.plans.driver_queries_identity \
            import _stitch_edges

        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        df = spark.createDataFrame(
            [(1, 7)], "event_id long, user_id long"
        )
        _stitch_edges(df)
        assert tracker.getJobIdsForGroup(None) == before

    def test_duplicate_query_keys_last_wins(self, spark):
        # canonical_url resolves ?a=1&a=2 last-wins under the session's
        # LAST_WIN mapKeyDedupPolicy (set in session.get_spark)
        assert (
            _canon(spark, "http://a.example/p?a=1&a=2")
            == "http://a.example/p?a=2"
        )
