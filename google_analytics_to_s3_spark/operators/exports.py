"""BigQuery-GA360-shaped export projections (P1, P2, P8 in SURVEY.md
§2.2) — the output boundary where internal typed columns take the GA360
export names.

Reference: ``create_export_table`` (functions/sessionization/main.py:
819-926), ``create_export_sessions_table`` (main.py:929-978), and the
five per-hit-type exports (main.py:1012-1151). All reproduced as native
``select`` projections; ``ifnull(x,'')`` → ``coalesce``.

Input column contract (produced by plans/pipeline.py):
sessionize cols (is_new_session, user_session_id, visit_start,
visit_id, event_sequence, total_revenue_per_session), attribution cols
(traffic_source_*), URL cols (landing_page, page_path, hostname,
page_path_levels), hits_type, action_type, product cols (pr*,
product_revenue), and the raw hit columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nz(col: str) -> Column:
    return F.coalesce(F.col(col), F.lit(""))


def export_table(df: DataFrame) -> DataFrame:
    """P1: the ~90-column hit-grain export projection (main.py:819-926).

    ``hits_time`` is left equal to the hit timestamp — the reference
    carries the same TODO ("needs to be calculated from the session
    start", main.py:883).
    """
    return df.select(
        F.col("body_cid").alias("fullVisitorId"),
        F.col("visit_id").alias("visitId"),
        _nz("body_uid").alias("userId"),
        F.col("message_id").alias("requestId"),
        F.col("ts").alias("timestamp"),
        F.col("user_session_id").alias("visitNumber"),
        F.col("visit_start").alias("visitStartTime"),
        F.date_format("ts", "yMMdd").alias("date"),
        _nz("body_dr").alias("trafficSource_referralPath"),
        F.col("traffic_source_campaign").alias("trafficSource_campaign"),
        F.col("traffic_source_source").alias("trafficSource_source"),
        F.col("traffic_source_medium").alias("trafficSource_medium"),
        F.col("traffic_source_keyword").alias("trafficSource_keyword"),
        F.col("traffic_source_ad_content").alias("trafficSource_ad_content"),
        F.col("geo_continent").alias("geoNetwork_continent"),
        F.col("geo_sub_continent").alias("geoNetwork_subContinent"),
        F.col("geo_country").alias("geoNetwork_country"),
        F.col("geo_region").alias("geoNetwork_region"),
        F.col("geo_metro").alias("geoNetwork_metro"),
        F.col("geo_city").alias("geoNetwork_city"),
        F.col("geo_city_id").alias("geoNetwork_cityId"),
        F.col("geo_network_domain").alias("geoNetwork_networkDomain"),
        F.col("geo_latitude").alias("geoNetwork_latitude"),
        F.col("geo_longitude").alias("geoNetwork_longitude"),
        F.col("geo_network_location").alias("geoNetwork_networkLocation"),
        F.col("device_client_name").alias("device_browser"),
        F.col("device_client_version").alias("device_browserVersion"),
        F.col("body_vp").alias("device_browserSize"),
        F.col("device_os_name").alias("device_operatingSystem"),
        F.col("device_os_version").alias("device_operatingSystemVersion"),
        F.col("device_is_mobile").alias("device_isMobile"),
        F.col("device_device_brand").alias("device_mobileDeviceBranding"),
        F.col("device_device_model").alias("device_mobileDeviceModel"),
        F.col("device_device_input").alias("device_mobileInputSelector"),
        F.col("device_device_info").alias("device_mobileDeviceInfo"),
        F.col("device_device_name").alias("device_mobileDeviceMarketingName"),
        _nz("body_fl").alias("device_flashVersion"),
        _nz("body_je").alias("device_javaEnabled"),
        _nz("body_ul").alias("device_language"),
        _nz("body_sd").alias("device_screenColors"),
        _nz("body_sr").alias("device_screenResolution"),
        F.col("device_device_type").alias("device_deviceCategory"),
        F.col("landing_page").alias("landingPage"),
        _nz("body_ec").alias("hits_eventInfo_eventCategory"),
        _nz("body_ea").alias("hits_eventInfo_eventAction"),
        _nz("body_el").alias("hits_eventInfo_eventLabel"),
        _nz("body_ev").alias("hits_eventInfo_eventValue"),
        F.col("event_sequence").alias("hits_hitNumber"),
        F.col("ts").alias("hits_time"),
        F.hour("ts").alias("hits_hour"),
        F.minute("ts").alias("hits_minute"),
        F.lit("").alias("hits_isSecure"),
        _nz("body_ni").alias("hits_isInteractive"),
        F.lit("").alias("hits_referer"),
        F.col("page_path").alias("hits_page_pagePath"),
        F.col("hostname").alias("hits_page_hostname"),
        _nz("body_dt").alias("hits_page_pageTitle"),
        F.lit("").alias("hits_page_searchKeyword"),
        F.lit("").alias("hits_page_searchCategory"),
        F.col("page_path_levels")[0].alias("hits_page_pagePathLevel1"),
        F.col("page_path_levels")[1].alias("hits_page_pagePathLevel2"),
        F.col("page_path_levels")[2].alias("hits_page_pagePathLevel3"),
        F.col("page_path_levels")[3].alias("hits_page_pagePathLevel4"),
        F.lit("").alias("hits_item_localItemRevenue"),
        _nz("body_col").alias("hits_eCommerceAction_option"),
        _nz("body_cos").alias("hits_eCommerceAction_step"),
        F.col("action_type").alias("hits_eCommerceAction_action_type"),
        _nz("body_tcc").alias("hits_transation_transactionCoupon"),
        _nz("body_ti").alias("hits_transaction_transactionId"),
        _nz("body_tr").alias("hits_transaction_transactionRevenue"),
        F.col("total_revenue_per_session").alias("totals_transactionRevenue"),
        _nz("body_ts").alias("hits_transaction_transactionShipping"),
        _nz("body_tt").alias("hits_transaction_transactionTax"),
        _nz("body_cu").alias("hits_transaction_currencyCode"),
        _nz("body_ti").alias("hits_item_transactionId"),
        _nz("body_in").alias("hits_item_productName"),
        _nz("body_ip").alias("hits_item_itemRevenue"),
        _nz("body_iq").alias("hits_item_itemQuantity"),
        _nz("body_ic").alias("hits_item_productSku"),
        _nz("body_iv").alias("hits_item_productCategory"),
        _nz("body_cu").alias("hits_item_currencyCode"),
        F.col("hits_type"),
        F.col("prca").alias("hits_product_v2ProductCategory"),
        F.col("prid").alias("hits_product_productSKU"),
        F.col("prnm").alias("hits_product_v2ProductName"),
        F.col("prpr").alias("hits_product_productPrice"),
        F.col("prqt").alias("hits_product_productQuantity"),
        F.col("prva").alias("hits_product_productVariant"),
        F.col("product_revenue").alias("hits_product_productRevenue"),
        F.col("is_new_session"),
    )


SESSION_EXPORT_COLS = [
    "fullVisitorId", "visitId", "userId", "visitNumber", "visitStartTime",
    "date", "timestamp",
    "trafficSource_campaign", "trafficSource_source", "trafficSource_medium",
    "trafficSource_keyword", "trafficSource_ad_content",
    "geoNetwork_continent", "geoNetwork_subContinent", "geoNetwork_country",
    "geoNetwork_region", "geoNetwork_metro", "geoNetwork_city",
    "geoNetwork_cityId", "geoNetwork_networkDomain", "geoNetwork_latitude",
    "geoNetwork_longitude", "geoNetwork_networkLocation",
    "device_browser", "device_browserVersion", "device_browserSize",
    "device_operatingSystem", "device_operatingSystemVersion",
    "device_isMobile", "device_mobileDeviceBranding",
    "device_mobileDeviceModel", "device_mobileInputSelector",
    "device_mobileDeviceInfo", "device_mobileDeviceMarketingName",
    "device_flashVersion", "device_javaEnabled", "device_language",
    "device_screenColors", "device_screenResolution", "device_deviceCategory",
    "totals_transactionRevenue", "landingPage", "hits_type",
]

HIT_PROJ_COLS = [
    "fullVisitorId", "visitId", "requestId", "visitStartTime", "timestamp",
    "hits_hitNumber", "hits_time", "hits_hour", "hits_minute",
    "hits_isSecure", "hits_isInteractive", "hits_referer",
    "hits_page_pagePath", "hits_page_hostname", "hits_page_pageTitle",
    "hits_page_pagePathLevel1", "hits_page_pagePathLevel2",
    "hits_page_pagePathLevel3", "hits_page_pagePathLevel4",
    "hits_eventInfo_eventCategory", "hits_eventInfo_eventAction",
    "hits_eventInfo_eventLabel", "hits_eventInfo_eventValue", "hits_type",
]


def export_sessions(export: DataFrame) -> DataFrame:
    """P2: one row per session (main.py:929-978)."""
    return export.filter(F.col("is_new_session") == 1).select(*SESSION_EXPORT_COLS)


def export_pageviews(export: DataFrame) -> DataFrame:
    return export.filter(F.col("hits_type") == "PAGE").select(*HIT_PROJ_COLS)


def export_events(export: DataFrame) -> DataFrame:
    """Events without product rows (SKU-null side of the P8 split)."""
    return export.filter(
        (F.col("hits_type") == "EVENT")
        & F.col("hits_product_productSKU").isNull()
    ).select(*HIT_PROJ_COLS)


def export_products(export: DataFrame) -> DataFrame:
    """Product-action rows (SKU non-empty side of the P8 split)."""
    return export.filter(
        (F.col("hits_product_productSKU") != "") & (F.col("hits_type") == "EVENT")
    ).select(
        "fullVisitorId", "visitId", "requestId", "visitStartTime", "timestamp",
        "hits_hitNumber", "hits_time", "hits_hour", "hits_minute",
        "hits_product_productPrice", "hits_product_productQuantity",
        F.lit("").alias("hits_product_productRefundAmount"),
        "hits_product_productSKU", "hits_product_productVariant",
        "hits_eCommerceAction_option", "hits_eCommerceAction_step",
        "hits_eCommerceAction_action_type", "hits_item_transactionId",
        "hits_product_productRevenue", "hits_transaction_transactionRevenue",
        "hits_type",
    )


def export_transactions(export: DataFrame) -> DataFrame:
    return export.filter(F.col("hits_type") == "TRANSACTION").select(
        "fullVisitorId", "visitId", "requestId", "visitStartTime", "timestamp",
        "hits_hitNumber", "hits_time", "hits_hour", "hits_minute",
        "hits_transation_transactionCoupon", "hits_transaction_transactionId",
        "hits_transaction_transactionRevenue", "totals_transactionRevenue",
        "hits_transaction_transactionShipping", "hits_transaction_transactionTax",
    )


def export_items(export: DataFrame) -> DataFrame:
    return export.filter(F.col("hits_type") == "ITEM").select(
        "fullVisitorId", "visitId", "requestId", "visitStartTime", "timestamp",
        "hits_hitNumber", "hits_time", "hits_hour", "hits_minute",
        "hits_item_transactionId", "hits_item_productName",
        "hits_item_itemRevenue", "hits_item_itemQuantity",
        F.col("hits_item_productSku").alias("hits_item_productSKU"),
        "hits_item_productCategory",
    )
