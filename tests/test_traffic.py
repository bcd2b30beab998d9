"""Truth-table tests for F2-F10 attribution/URL expressions, derived from
the reference's own functions (FIXTURES.md F6; reference main.py:466-716)."""

import pytest
from pyspark.sql import functions as F

from google_analytics_to_s3_spark.functions.traffic import (
    is_true_direct,
    traffic_ad_content,
    traffic_campaign,
    traffic_keyword,
    traffic_medium,
    traffic_source,
)
from google_analytics_to_s3_spark.functions.url import (
    landing_page,
    page_path_levels,
)

SHOP = "http://shop.example/page"

CASES = [
    # (name, is_new, dl, dr, source, medium, campaign, keyword, content)
    ("gclid", 1, SHOP + "?gclid=abc", None,
     "google", "paid", "(not set)", "(not set)", "(not set)"),
    ("fbclid", 1, SHOP + "?fbclid=xyz", None,
     "facebook", "(none)", "(not set)", "(not set)", "(not set)"),
    ("utm_full", 1,
     SHOP + "?utm_source=nl&utm_medium=email&utm_campaign=sale"
            "&utm_term=shoes&utm_content=v1", None,
     "nl", "email", "sale", "shoes", "v1"),
    ("direct", 1, SHOP, None,
     "(direct)", "(none)", "(not set)", "(not set)", "(not set)"),
    ("google_organic", 1, "http://shop.example/",
     "https://www.google.com/search?q=x",
     "google", "organic", "(not set)", "(not provided)", "(not set)"),
    ("referral", 1, "http://shop.example/",
     "https://partner.example/page?x=1",
     "partner", "referral", "(not set)", "(not set)", "(not set)"),
    ("googleadservices", 1, "http://shop.example/",
     "https://www.googleadservices.com/pagead",
     "google", "paid", "(not set)", "(not set)", "(not set)"),
    ("android_app", 1, "http://shop.example/",
     "android-app://com.example.app",
     "com.example.app", "referral", "(not set)", "(not set)", "(not set)"),
    ("mid_session", 0, SHOP + "?utm_source=nl&utm_medium=email", None,
     "(not set)", "(none)", "(not set)", "(not set)", "(not set)"),
    ("other_query_direct", 1, SHOP + "?page=2", None,
     "(direct)", "(none)", "(not set)", "(not set)", "(not set)"),
]


@pytest.fixture(scope="module")
def attributed(spark):
    rows = [(c[0], c[1], c[2], c[3]) for c in CASES]
    df = spark.createDataFrame(
        rows, "name string, is_new_session int, body_dl string, body_dr string"
    )
    out = (
        df.withColumn("src", traffic_source())
        .withColumn("med", traffic_medium())
        .withColumn("cmp", traffic_campaign())
        .withColumn("kw", traffic_keyword(medium="med"))
        .withColumn("adc", traffic_ad_content())
    )
    return {r["name"]: r for r in out.collect()}


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_attribution_truth_table(attributed, case):
    name, _, _, _, source, medium, campaign, keyword, content = case
    row = attributed[name]
    assert row.src == source, f"{name}: source {row.src} != {source}"
    assert row.med == medium, f"{name}: medium {row.med} != {medium}"
    assert row.cmp == campaign, f"{name}: campaign {row.cmp} != {campaign}"
    assert row.kw == keyword, f"{name}: keyword {row.kw} != {keyword}"
    assert row.adc == content, f"{name}: ad_content {row.adc} != {content}"


def test_page_path_levels(spark):
    df = spark.createDataFrame(
        [
            ("http://www.example.com/hello-world/",),
            ("http://x.example/a/b/c/d/e",),
            ("http://x.example/",),
            ("http://x.example",),
        ],
        "url string",
    )
    out = [r.levels for r in df.select(page_path_levels("url").alias("levels")).collect()]
    # reference sessionization/tests.py:6
    assert out[0] == ["/hello-world", "", "", ""]
    assert out[1] == ["/a", "/b", "/c", "/d"]
    assert out[2] == ["", "", "", ""]
    assert out[3] == ["", "", "", ""]


def test_landing_page_and_true_direct(spark):
    df = spark.createDataFrame(
        [(1, "http://x.example/land?a=1", "(direct)"),
         (0, "http://x.example/other", "google")],
        "is_new_session int, body_dl string, src string",
    )
    out = df.select(
        landing_page("is_new_session", "body_dl").alias("lp"),
        is_true_direct("src").alias("td"),
    ).collect()
    assert out[0].lp == "/land" and out[0].td == "True"
    assert out[1].lp is None and out[1].td is None
