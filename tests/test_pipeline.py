"""End-to-end daily pipeline over the synthetic fixture day
(FIXTURES.md F2 knobs), plus unpivot/decode/ip unit tests."""

import pytest
from pyspark.sql import functions as F

from google_analytics_to_s3_spark.functions.ip import anonymize_ip
from google_analytics_to_s3_spark.plans.pipeline import run_daily_pipeline
from google_analytics_to_s3_spark.sources.ga import (
    decode_envelope,
    read_enriched_hits,
)
from google_analytics_to_s3_spark.operators.unpivot import unpivot_products
from google_analytics_to_s3_spark.testing.fixtures import (
    enriched_hits_day,
    raw_envelope_records,
    write_jsonl,
)


@pytest.fixture(scope="module")
def marts(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hits") / "day.jsonl")
    write_jsonl(enriched_hits_day(), path)
    hits = read_enriched_hits(spark, path)
    out = run_daily_pipeline(hits)
    return {k: v.collect() for k, v in out.items()}


def test_sessions_mart(marts):
    sessions = marts["sessions"]
    assert len(sessions) == 8  # v1:2 v2:1 v3:1 v4:2 v5:1 v6:1
    by_visitor = {}
    for s in sessions:
        by_visitor.setdefault(s.fullVisitorId, []).append(s)
    v1 = sorted(by_visitor["v1"], key=lambda s: s.visitNumber)
    assert [s.trafficSource_source for s in v1] == ["newsletter", "(direct)"]
    assert v1[0].trafficSource_medium == "email"
    assert v1[0].trafficSource_campaign == "sale"
    assert v1[0].trafficSource_keyword == "shoes"
    assert v1[0].trafficSource_ad_content == "v1"
    assert v1[0].landingPage == "/land"
    # touchpoints over the day (ordered), direct filtered variant
    assert v1[1].touchpoints == ["newsletter", "(direct)"]
    assert v1[1].touchpoints_wo_direct == ["newsletter"]
    assert v1[1].first_touchpoint == "newsletter"
    assert v1[1].last_touchpoint == "newsletter"
    # v4: exact 30-min gap → two sessions; gclid → google/paid
    v4 = sorted(by_visitor["v4"], key=lambda s: s.visitNumber)
    assert len(v4) == 2
    assert v4[0].trafficSource_source == "google"
    assert v4[0].trafficSource_medium == "paid"
    # v2 session revenue typed
    (v2,) = by_visitor["v2"]
    assert v2.totals_transactionRevenue == pytest.approx(35.98)  # typed, not string
    # v6 midnight-spanning stays one session without a day filter
    assert len(by_visitor["v6"]) == 1


def test_hit_marts(marts):
    assert len(marts["pageviews"]) == 10
    assert len(marts["events"]) == 1
    skus = sorted(p.hits_product_productSKU for p in marts["products"])
    assert skus == ["SKU-1", "SKU-1", "SKU-2"]
    # F12: product revenue only on purchase action (6)
    revs = sorted(
        (p.hits_product_productSKU, p.hits_product_productRevenue)
        for p in marts["products"]
        if p.hits_eCommerceAction_action_type == "6"
    )
    assert revs == [("SKU-1", 20.0), ("SKU-2", 15.98)]
    assert len(marts["transactions"]) == 1
    t = marts["transactions"][0]
    assert t.hits_transaction_transactionId == "T-200"
    assert t.hits_transaction_transactionRevenue == "49.90"
    assert len(marts["items"]) == 1
    assert marts["items"][0].hits_item_productSKU == "DD443345-44"


def test_timing_hits_dropped(marts):
    all_rows = marts["pageviews"] + marts["events"]
    assert all(r.hits_type in ("PAGE", "EVENT") for r in all_rows)
    # the two timing hits of v3 are gone from every mart
    total_hits = sum(
        len(marts[k]) for k in ("pageviews", "events", "products",
                                "transactions", "items")
    )
    # 10 pageviews + 1 event + 3 products + 1 transaction + 1 item
    assert total_hits == 16


def test_unpivot_preserves_hits_without_products(spark):
    df = spark.createDataFrame(
        [("m1", "a", None), ("m2", None, None)],
        "message_id string, body_pr0id string, body_pr1id string",
    )
    out = unpivot_products(df, n_slots=2, params=["id"])
    rows = {r.message_id: r for r in out.collect()}
    assert rows["m1"].prid == "a"
    assert rows["m2"].prid is None
    assert out.count() == 2


def test_decode_envelope(spark):
    hits = enriched_hits_day()
    recs = raw_envelope_records(hits)
    df = spark.createDataFrame([(r,) for r in recs], "value string")
    out = decode_envelope(df).collect()
    assert len(out) == len(hits)
    by_id = {r.message_id: r for r in out}
    src = {h["message_id"]: h for h in hits}
    m1 = by_id["m0001"]
    assert m1.body_cid == "v1"
    assert m1.ip == "203.0.113.0"  # anonymized (L2)
    assert m1.body_dl == src["m0001"]["body_dl"]  # url-decode round trip
    assert m1.body_t == "pageview"


def test_anonymize_ip_reference_vectors(spark):
    df = spark.createDataFrame(
        [("255.255.255.255",),
         ("ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",),
         ("garbage",)],
        "ip string",
    )
    out = [r.a for r in df.select(anonymize_ip("ip").alias("a")).collect()]
    # reference transformation/main.py:129-133
    assert out[0] == "255.255.255.0"
    assert out[1] == "ffff:ffff:ffff:0000:0000:0000:0000:0000"
    assert out[2] == "0.0.0.0"
