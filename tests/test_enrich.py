"""Unit tests for the enrichment operators: IP anonymization (L2),
GeoIP broadcast range join (L6/J2), user-agent parse (L5)."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.functions.geo import (
    ipv4_to_long,
    with_geo_columns,
)
from google_analytics_to_s3_spark.functions.ip import anonymize_ip
from google_analytics_to_s3_spark.functions.ua import with_device_columns
from google_analytics_to_s3_spark.plans.driver_queries_enrich import (
    UA_GOLDEN,
    UA_STRINGS,
)


def test_anonymize_ip_reference_vectors(spark):
    """The reference's own test vectors (transformation/main.py:129-133)."""
    df = spark.createDataFrame(
        [
            ("255.255.255.255",),
            ("ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",),
            ("10.1.2.3",),
            ("garbage",),
        ],
        ["ip"],
    )
    got = [r[0] for r in df.select(anonymize_ip("ip")).collect()]
    assert got == [
        "255.255.255.0",
        "ffff:ffff:ffff:0000:0000:0000:0000:0000",
        "10.1.2.0",
        "0.0.0.0",
    ]


def test_ipv4_to_long(spark):
    df = spark.createDataFrame(
        [("0.0.0.0",), ("1.2.3.4",), ("255.255.255.255",), ("not-an-ip",)],
        ["ip"],
    )
    got = [r[0] for r in df.select(ipv4_to_long("ip")).collect()]
    assert got == [0, 16909060, 4294967295, None]


def test_with_geo_columns(spark):
    from google_analytics_to_s3_spark.functions.geo import GEO_ATTRS

    hits = spark.createDataFrame(
        [
            ("h1", "1.0.0.5", False),   # inside range A
            ("h2", "9.9.9.9", False),   # no range
            ("h3", "1.0.0.5", True),    # bot: geo skipped
        ],
        ["id", "ip", "device_is_bot"],
    )
    filler = {a: F.lit("x") for a in GEO_ATTRS if a != "geo_country"}
    ranges = (
        spark.createDataFrame(
            [(16777216, 16777472, "Wonderland", 1.0, 2.0)],
            ["ip_start", "ip_end", "geo_country", "latitude", "longitude"],
        )
        .withColumns(filler)
    )
    out = {
        r["id"]: (r["geo_country"], r["geo_latitude"])
        for r in with_geo_columns(hits, ranges).collect()
    }
    assert out["h1"] == ("Wonderland", 1.0)
    assert out["h2"] == ("(not set)", 0.0)
    assert out["h3"] == ("(not set)", 0.0)


def test_ua_golden(spark):
    """The native UA parser must reproduce the golden truth table used
    as the driver oracle (driver_queries_enrich.UA_GOLDEN)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(UA_STRINGS)], ["idx", "user_agent"]
    )
    rows = {
        r["idx"]: r for r in with_device_columns(df).collect()
    }
    for i, (bot, name, ver, os_name, os_ver, dtype, mobile, brand) in enumerate(
        UA_GOLDEN
    ):
        r = rows[i]
        assert r["device_is_bot"] == bot, (i, "bot")
        assert r["device_client_name"] == name, (i, "client_name")
        assert r["device_client_version"] == ver, (i, "client_version")
        assert r["device_os_name"] == os_name, (i, "os_name")
        assert r["device_os_version"] == os_ver, (i, "os_version")
        assert r["device_device_type"] == dtype, (i, "device_type")
        assert r["device_is_mobile"] == mobile, (i, "is_mobile")
        assert r["device_device_brand"] == brand, (i, "brand")
