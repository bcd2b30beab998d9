"""Declared schemas for the GA hit pipeline.

Reproduces the reference's three schemas with explicit, ordered fields
(the reference builds ``static_schema`` from Python *sets*, so its column
order is nondeterministic — we fix that):

- ``hit_schema``      ~266-col flat enriched-hit table
                      (reference functions/sessionization/main.py:134-269)
- ``session_schema``  48-col session mart (reference main.py:84-132)
- ``product_schema``  8-col unpivoted ecommerce table (reference
                      main.py:271-280)

Schema-on-read with these StructTypes replaces the reference's
``validate_fields`` RDD normalizer (reference main.py:308-315, applied at
main.py:1157): ``spark.read.schema(hit_schema).json(path)`` back-fills
absent keys with nulls natively, keeping the whole plan in Catalyst.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- field groups (reference main.py:134-231) -------------------------------

GA_BODY_FIELDS: list[str] = [
    "body_v", "body_tid", "body_aip", "body_ds", "body_cid", "body_uid",
    "body_dr", "body_cn", "body_cs", "body_cm", "body_ck", "body_cc",
    "body_ci", "body_gclid", "body_dclid", "body_sr", "body_vp", "body_de",
    "body_sd", "body_ul", "body_je", "body_fl", "body_t", "body_ni",
    "body_dl", "body_dh", "body_dp", "body_dt", "body_cd", "body_an",
    "body_aid", "body_av", "body_aiid", "body_ec", "body_ea", "body_el",
    "body_ev", "body_ti", "body_ta", "body_tr", "body_ts", "body_tt",
    "body_in", "body_ip", "body_iq", "body_ic", "body_iv", "body_tcc",
    "body_pal", "body_cos", "body_col", "body_cu", "body_pa",
]

GEO_FIELDS: list[str] = [
    "geo_continent", "geo_continent_code", "geo_sub_continent",
    "geo_country", "geo_country_iso", "geo_region", "geo_metro",
    "geo_city", "geo_city_id", "geo_postal_code", "geo_timezone",
    "geo_network_domain", "geo_network_location",
    "geo_latitude", "geo_longitude",
]

DEVICE_FIELDS: list[str] = [
    "device_client_name", "device_client_version", "device_os_name",
    "device_os_version", "device_device_type", "device_is_mobile",
    "device_is_bot", "device_device_name", "device_device_brand",
    "device_device_model", "device_device_input", "device_device_info",
]

API_GATEWAY_FIELDS: list[str] = [
    "trace_id", "system_source", "message_id", "ip",
    "received_at_apig", "user_agent", "system_version",
]

# Enhanced-ecommerce product params tracked per index 0..19
# (reference main.py:233-252). NOTE: `br` (brand) is declared in the
# reference schema but intentionally NOT unpivoted (main.py:769-789).
ECOM_PARAMS: list[str] = ["id", "nm", "br", "ca", "va", "pr", "qt", "cc"]
ECOM_UNPIVOT_PARAMS: list[str] = ["ca", "cc", "id", "nm", "pr", "qt", "va"]
N_PRODUCT_SLOTS = 20
N_CUSTOM_SLOTS = 10


def ecom_field_names() -> list[str]:
    return [
        f"body_pr{i}{p}" for i in range(N_PRODUCT_SLOTS) for p in ECOM_PARAMS
    ]


def custom_field_names() -> list[str]:
    return [f"body_cd{i}" for i in range(N_CUSTOM_SLOTS)] + [
        f"body_cm{i}" for i in range(N_CUSTOM_SLOTS)
    ]


HIT_FIELD_NAMES: list[str] = (
    API_GATEWAY_FIELDS
    + GA_BODY_FIELDS
    + GEO_FIELDS
    + DEVICE_FIELDS
    + ecom_field_names()
    + custom_field_names()
)


def _hit_field_type(name: str):
    # Typed exceptions per reference main.py:256-264.
    if name in ("device_is_bot", "device_is_mobile"):
        return BooleanType()
    if name in ("geo_latitude", "geo_longitude"):
        return DoubleType()
    return StringType()


hit_schema = StructType(
    [StructField(n, _hit_field_type(n), True) for n in HIT_FIELD_NAMES]
)

# --- session mart schema (reference main.py:84-132) -------------------------

session_schema = StructType([
    StructField("fullVisitorId", StringType(), True),
    StructField("visitId", StringType(), True),
    StructField("userId", StringType(), True),
    StructField("visitNumber", IntegerType(), True),
    StructField("visitStartTime", LongType(), True),
    StructField("date", IntegerType(), True),
    StructField("timestamp", TimestampType(), True),
    StructField("trafficSource_campaign", StringType(), True),
    StructField("trafficSource_source", StringType(), True),
    StructField("trafficSource_medium", StringType(), True),
    StructField("trafficSource_keyword", StringType(), True),
    StructField("trafficSource_ad_content", StringType(), True),
    StructField("geoNetwork_continent", StringType(), True),
    StructField("geoNetwork_subContinent", StringType(), True),
    StructField("geoNetwork_country", StringType(), True),
    StructField("geoNetwork_region", StringType(), True),
    StructField("geoNetwork_metro", StringType(), True),
    StructField("geoNetwork_city", StringType(), True),
    StructField("geoNetwork_cityId", IntegerType(), True),
    StructField("geoNetwork_networkDomain", StringType(), True),
    StructField("geoNetwork_latitude", DoubleType(), True),
    StructField("geoNetwork_longitude", DoubleType(), True),
    StructField("geoNetwork_networkLocation", StringType(), True),
    StructField("device_browser", StringType(), True),
    StructField("device_browserVersion", DoubleType(), True),
    StructField("device_browserSize", StringType(), True),
    StructField("device_operatingSystem", StringType(), True),
    StructField("device_operatingSystemVersion", StringType(), True),
    StructField("device_isMobile", BooleanType(), True),
    StructField("device_mobileDeviceBranding", StringType(), True),
    StructField("device_mobileDeviceModel", StringType(), True),
    StructField("device_mobileInputSelector", StringType(), True),
    StructField("device_mobileDeviceInfo", StringType(), True),
    StructField("device_mobileDeviceMarketingName", StringType(), True),
    StructField("device_flashVersion", IntegerType(), True),
    StructField("device_javaEnabled", StringType(), True),
    StructField("device_language", StringType(), True),
    StructField("device_screenColors", StringType(), True),
    StructField("device_screenResolution", StringType(), True),
    StructField("device_deviceCategory", StringType(), True),
    StructField("totals_transactionRevenue", StringType(), True),
    StructField("landingPage", StringType(), True),
    StructField("hits_type", StringType(), True),
    StructField("touchpoints", ArrayType(StringType()), True),
    StructField("touchpoints_wo_direct", ArrayType(StringType()), True),
    StructField("first_touchpoint", StringType(), True),
    StructField("last_touchpoint", StringType(), True),
])

# --- unpivoted product schema (reference main.py:271-280) -------------------

product_schema = StructType([
    StructField("ms_id", StringType(), True),
    StructField("prca", StringType(), True),
    StructField("prcc", StringType(), True),
    StructField("prid", StringType(), True),
    StructField("prnm", StringType(), True),
    StructField("prpr", StringType(), True),
    StructField("prqt", StringType(), True),
    StructField("prva", StringType(), True),
])
