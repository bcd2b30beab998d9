"""Driver-verified P8 export marts: the five per-hit-type exports run
through the REAL daily pipeline (prepare → sessionize (P3 order) →
attribute → unpivot → P1 export projection → P8 split), over GA hits
synthesized deterministically from the events table.

Reference: the five exports at functions/sessionization/main.py:
1012-1151 on top of ``create_export_table`` (main.py:819-926); hit-type
enum F1 (main.py:379-404), action enum F11 (main.py:722-750), product
revenue F12 (main.py:811-817), unpivot §2.8 (main.py:757-806), P3 drop
of timing hits *after* session flags (main.py:1157-1160).

Synthesis rules are shared literal arithmetic on ``event_id`` (same
expressions in Spark and the DuckDB oracle — never algebraically
rearranged), so every exported cell is independently recomputable by
the oracle. Columns whose lineage is engine-local (session-TZ-derived
date/hour fields, sha1 visit ids, all-null enrichment columns) are left
out of the compared projection; they are exercised by the pipeline unit
tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.exports import (
    export_events,
    export_items,
    export_pageviews,
    export_products,
    export_transactions,
)
from ..schemas import HIT_FIELD_NAMES, hit_schema
from ..sources.testdata import load_events

__all__ = ["QUERIES", "ORACLES"]


def _ga_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → full 266-col enriched-hit table: ~25 columns synthesized
    from event_id/user_id/ts_ms, the rest typed nulls (the same
    back-fill contract as schema-on-read, sources/ga.py S1)."""
    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_ms"
    )
    m = lambda n: F.col("event_id") % n  # noqa: E731
    s = lambda c: c.cast("string")  # noqa: E731
    body_t = (
        F.when(m(11) == 0, F.lit("timing"))
        .when(m(7) <= 2, F.lit("pageview"))
        .when(m(7) <= 4, F.lit("event"))
        .when(m(7) == 5, F.lit("transaction"))
        .otherwise(F.lit("item"))
    )
    is_event = body_t == "event"
    is_purchase = is_event & (F.col("event_type") == "purchase")
    pr0 = is_event & (m(5) != 0)
    pr1 = is_event & (m(3) == 0)
    synth = {
        "message_id": F.lpad(s(F.col("event_id")), 12, "0"),
        "body_cid": s(F.col("user_id")),
        "received_at_apig": s(F.col("ts_ms")),
        "body_t": body_t,
        "body_dl": F.concat_ws(
            "", F.lit("http://shop.example/p/"), s(m(10)),
            F.lit("?q="), s(m(3)),
        ),
        "body_dt": F.concat(F.lit("title-"), s(m(20))),
        "body_pa": F.when(is_purchase, "purchase").when(is_event, "detail"),
        "body_tr": F.when(
            is_purchase | (body_t == "transaction"), s(m(500) + 1)
        ),
        "body_ti": F.when(
            body_t.isin("transaction", "item"),
            F.concat(F.lit("T-"), s(m(100))),
        ),
        "body_ts": F.when(body_t == "transaction", s(m(10))),
        "body_tt": F.when(body_t == "transaction", s(m(8))),
        "body_cu": F.when(body_t == "transaction", "EUR"),
        "body_ic": F.when(body_t == "item", F.concat(F.lit("IC-"), s(m(50)))),
        "body_in": F.when(body_t == "item", F.concat(F.lit("prod-"), s(m(20)))),
        "body_ip": F.when(body_t == "item", s(m(30) + 1)),
        "body_iq": F.when(body_t == "item", s(m(5) + 1)),
        "body_iv": F.when(body_t == "item", F.concat(F.lit("cat-"), s(m(5)))),
        "body_ec": F.when(is_event, F.concat(F.lit("cat"), s(m(5)))),
        "body_ea": F.when(is_event, F.concat(F.lit("act"), s(m(4)))),
        "body_el": F.when(is_event, F.concat(F.lit("lbl"), s(m(6)))),
        "body_ev": F.when(is_event, s(m(100))),
        "body_pr0id": F.when(pr0, F.concat(F.lit("sku-"), s(m(50)))),
        "body_pr0nm": F.when(pr0, F.concat(F.lit("name-"), s(m(12)))),
        "body_pr0ca": F.when(pr0, F.concat(F.lit("cat-"), s(m(5)))),
        "body_pr0pr": F.when(pr0, s(m(9) + 1)),
        "body_pr0qt": F.when(pr0, s(m(4) + 1)),
        "body_pr1id": F.when(pr1, F.lit("sku-extra")),
        "body_pr1pr": F.when(pr1, F.lit("2")),
        "body_pr1qt": F.when(pr1, F.lit("1")),
    }
    cols = [
        synth[n].alias(n) if n in synth
        else F.lit(None).cast(hit_schema[n].dataType).alias(n)
        for n in HIT_FIELD_NAMES
    ]
    return e.select(*cols)


# The analyzed 266-col pipeline DataFrame is reused across the five
# mart queries: re-analyzing the wide plan costs ~3-5 s per query
# (measured at sf0.1: 6.9 s rebuild vs 1.0-1.6 s on the shared base —
# analyzer/codegen fixed cost, not data). Keyed by session identity +
# sf_dir; the session ref in the value keeps id() stable.
_EXPORT_CACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def _export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline import hit_export

    key = (id(spark), sf_dir)
    hit = _EXPORT_CACHE.get(key)
    if hit is None or hit[0] is not spark:
        hit = (spark, hit_export(_ga_hits(spark, sf_dir)))
        _EXPORT_CACHE[key] = hit
    return hit[1]


# Shared oracle prefix: synthesis + W1-W3 on ALL rows, P3 filter, then
# the (visitor, session) windows on the filtered set — exactly the
# pipeline's stage order.
_EXPORT_CTE = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
),
h AS (
  SELECT *,
    lpad(CAST(event_id AS VARCHAR), 12, '0') AS message_id,
    CAST(user_id AS VARCHAR) AS body_cid,
    CASE WHEN event_id % 11 = 0 THEN 'timing'
         WHEN event_id % 7 <= 2 THEN 'pageview'
         WHEN event_id % 7 <= 4 THEN 'event'
         WHEN event_id % 7 = 5 THEN 'transaction'
         ELSE 'item' END AS body_t
  FROM e
),
lagged AS (
  SELECT *, lag(ts_ms) OVER (
    PARTITION BY body_cid ORDER BY ts_ms, message_id) AS last_event
  FROM h
),
flagged AS (
  SELECT *, CASE WHEN last_event IS NULL OR ts_ms - last_event >= 1800000
                 THEN 1 ELSE 0 END AS is_new_session
  FROM lagged
),
numbered AS (
  SELECT *, CAST(sum(is_new_session) OVER (
      PARTITION BY body_cid ORDER BY ts_ms, message_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS user_session_id
  FROM flagged
),
filtered AS (
  SELECT * FROM numbered WHERE body_t NOT IN ('adtiming', 'timing')
),
sess AS (
  SELECT *,
    min(ts_ms) OVER (PARTITION BY body_cid, user_session_id)
      AS visit_start,
    CAST(row_number() OVER (
      PARTITION BY body_cid ORDER BY ts_ms, message_id) AS INTEGER)
      AS event_sequence
  FROM filtered
)
"""


def q_export_pageviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    return export_pageviews(_export(spark, sf_dir)).select(
        "fullVisitorId", "requestId", "visitStartTime", "hits_hitNumber",
        "hits_page_pagePath", "hits_page_hostname", "hits_page_pageTitle",
        "hits_type",
    )


SQL_EXPORT_PAGEVIEWS = f"""
{_EXPORT_CTE}
SELECT body_cid AS fullVisitorId,
       message_id AS requestId,
       visit_start AS visitStartTime,
       event_sequence AS hits_hitNumber,
       '/p/' || CAST(event_id % 10 AS VARCHAR) AS hits_page_pagePath,
       'shop.example' AS hits_page_hostname,
       'title-' || CAST(event_id % 20 AS VARCHAR) AS hits_page_pageTitle,
       'PAGE' AS hits_type
FROM sess WHERE body_t = 'pageview'
"""


def q_export_events_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    return export_events(_export(spark, sf_dir)).select(
        "fullVisitorId", "requestId", "hits_hitNumber",
        "hits_eventInfo_eventCategory", "hits_eventInfo_eventAction",
        "hits_eventInfo_eventLabel", "hits_eventInfo_eventValue",
        "hits_type",
    )


SQL_EXPORT_EVENTS_MART = f"""
{_EXPORT_CTE}
SELECT body_cid AS fullVisitorId,
       message_id AS requestId,
       event_sequence AS hits_hitNumber,
       'cat' || CAST(event_id % 5 AS VARCHAR) AS hits_eventInfo_eventCategory,
       'act' || CAST(event_id % 4 AS VARCHAR) AS hits_eventInfo_eventAction,
       'lbl' || CAST(event_id % 6 AS VARCHAR) AS hits_eventInfo_eventLabel,
       CAST(event_id % 100 AS VARCHAR) AS hits_eventInfo_eventValue,
       'EVENT' AS hits_type
FROM sess
WHERE body_t = 'event' AND event_id % 5 = 0 AND event_id % 3 <> 0
"""


def q_export_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return export_products(_export(spark, sf_dir)).select(
        "fullVisitorId", "requestId", "hits_hitNumber",
        "hits_product_productSKU", "hits_product_productQuantity",
        "hits_product_productPrice", "hits_eCommerceAction_action_type",
        "hits_product_productRevenue", "hits_type",
    )


SQL_EXPORT_PRODUCTS = f"""
{_EXPORT_CTE},
acts AS (
  SELECT *,
    CASE WHEN event_type = 'purchase' THEN '6' ELSE '2' END AS action_code
  FROM sess WHERE body_t = 'event'
)
SELECT body_cid AS fullVisitorId,
       message_id AS requestId,
       event_sequence AS hits_hitNumber,
       'sku-' || CAST(event_id % 50 AS VARCHAR) AS hits_product_productSKU,
       CAST(event_id % 4 + 1 AS VARCHAR) AS hits_product_productQuantity,
       CAST(event_id % 9 + 1 AS VARCHAR) AS hits_product_productPrice,
       action_code AS hits_eCommerceAction_action_type,
       CASE WHEN action_code = '6'
            THEN CAST(event_id % 4 + 1 AS DOUBLE)
                 * CAST(event_id % 9 + 1 AS DOUBLE) END
         AS hits_product_productRevenue,
       'EVENT' AS hits_type
FROM acts WHERE event_id % 5 <> 0
UNION ALL
SELECT body_cid, message_id, event_sequence,
       'sku-extra', '1', '2', action_code,
       CASE WHEN action_code = '6' THEN CAST(2 AS DOUBLE) END,
       'EVENT'
FROM acts WHERE event_id % 3 = 0
"""


def q_export_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return export_transactions(_export(spark, sf_dir)).select(
        "fullVisitorId", "requestId", "hits_hitNumber",
        "hits_transaction_transactionId",
        "hits_transaction_transactionRevenue",
        "hits_transaction_transactionShipping",
        "hits_transaction_transactionTax",
    )


SQL_EXPORT_TRANSACTIONS = f"""
{_EXPORT_CTE}
SELECT body_cid AS fullVisitorId,
       message_id AS requestId,
       event_sequence AS hits_hitNumber,
       'T-' || CAST(event_id % 100 AS VARCHAR)
         AS hits_transaction_transactionId,
       CAST(event_id % 500 + 1 AS VARCHAR)
         AS hits_transaction_transactionRevenue,
       CAST(event_id % 10 AS VARCHAR)
         AS hits_transaction_transactionShipping,
       CAST(event_id % 8 AS VARCHAR) AS hits_transaction_transactionTax
FROM sess WHERE body_t = 'transaction'
"""


def q_export_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return export_items(_export(spark, sf_dir)).select(
        "fullVisitorId", "requestId", "hits_hitNumber",
        "hits_item_transactionId", "hits_item_productName",
        "hits_item_itemRevenue", "hits_item_itemQuantity",
        "hits_item_productSKU", "hits_item_productCategory",
    )


SQL_EXPORT_ITEMS = f"""
{_EXPORT_CTE}
SELECT body_cid AS fullVisitorId,
       message_id AS requestId,
       event_sequence AS hits_hitNumber,
       'T-' || CAST(event_id % 100 AS VARCHAR) AS hits_item_transactionId,
       'prod-' || CAST(event_id % 20 AS VARCHAR) AS hits_item_productName,
       CAST(event_id % 30 + 1 AS VARCHAR) AS hits_item_itemRevenue,
       CAST(event_id % 5 + 1 AS VARCHAR) AS hits_item_itemQuantity,
       'IC-' || CAST(event_id % 50 AS VARCHAR) AS hits_item_productSKU,
       'cat-' || CAST(event_id % 5 AS VARCHAR) AS hits_item_productCategory
FROM sess WHERE body_t = 'item'
"""


QUERIES = {
    "export_pageviews": q_export_pageviews,
    "export_events_mart": q_export_events_mart,
    "export_products": q_export_products,
    "export_transactions": q_export_transactions,
    "export_items": q_export_items,
}

ORACLES = {
    "export_pageviews": SQL_EXPORT_PAGEVIEWS,
    "export_events_mart": SQL_EXPORT_EVENTS_MART,
    "export_products": SQL_EXPORT_PRODUCTS,
    "export_transactions": SQL_EXPORT_TRANSACTIONS,
    "export_items": SQL_EXPORT_ITEMS,
}
