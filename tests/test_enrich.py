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


class TestMmdbToRanges:
    """The mmdb->ranges converter, tested via hand-built (network,
    record) entries (FIXTURES.md isolation: no mmdb file / maxminddb
    lib in this environment; the gated wrapper only adds the file
    read)."""

    _REC = {
        "continent": {"names": {"en": "Europe"}, "code": "EU"},
        "country": {"names": {"en": "Germany"}, "iso_code": "DE"},
        "subdivisions": [{"names": {"en": "Berlin"}}],
        "city": {"names": {"en": "Berlin"}, "geoname_id": 2950159},
        "postal": {"code": "10115"},
        "location": {
            "latitude": 52.5244, "longitude": 13.4105,
            "time_zone": "Europe/Berlin",
        },
    }

    def test_record_mapping_matches_reference_fields(self):
        from google_analytics_to_s3_spark.functions.geo_mmdb import (
            record_to_geo_row,
        )

        row = record_to_geo_row(self._REC)
        assert row["geo_country"] == "Germany"
        assert row["geo_country_iso"] == "DE"
        assert row["geo_continent_code"] == "EU"
        assert row["geo_region"] == "Berlin"
        assert row["geo_city_id"] == "2950159"
        assert row["geo_timezone"] == "Europe/Berlin"
        # reference hard-codes these four to (not set) (ip.py:33-39)
        assert row["geo_sub_continent"] == "(not set)"
        assert row["geo_metro"] == "(not set)"
        assert row["geo_network_domain"] == "(not set)"
        assert row["geo_network_location"] == "(not set)"

    def test_incomplete_record_is_all_or_nothing(self):
        # reference ip.py:31-64: ONE try/KeyError around the whole
        # projection — a record missing any key falls back entirely
        from google_analytics_to_s3_spark.functions.geo_mmdb import (
            record_to_geo_row,
        )

        incomplete = {k: v for k, v in self._REC.items()
                      if k != "postal"}
        assert record_to_geo_row(incomplete) is None
        no_subdiv = dict(self._REC, subdivisions=[])
        assert record_to_geo_row(no_subdiv) is None

    def test_network_bounds(self):
        from google_analytics_to_s3_spark.functions.geo_mmdb import (
            network_to_bounds,
        )

        lo = 10 * 16777216 + 2 * 65536
        assert network_to_bounds("10.2.0.0/16") == (lo, lo + 65536)
        assert network_to_bounds("0.0.0.0/0") == (0, 2 ** 32)
        assert network_to_bounds("2001:db8::/32") is None
        assert network_to_bounds("not-a-network") is None

    def test_end_to_end_enrichment(self, spark):
        from google_analytics_to_s3_spark.functions.geo import (
            with_geo_columns,
        )
        from google_analytics_to_s3_spark.functions.geo_mmdb import (
            RANGES_SCHEMA,
            ranges_rows_from_entries,
        )

        entries = [
            ("10.2.0.0/16", self._REC),
            # incomplete record: skipped -> its IPs resolve (not set)
            ("10.3.0.0/16", {"continent": {"names": {}}}),
            # IPv6: skipped
            ("2001:db8::/32", self._REC),
        ]
        ranges = spark.createDataFrame(
            list(ranges_rows_from_entries(entries)), RANGES_SCHEMA
        )
        assert ranges.count() == 1
        hits = spark.createDataFrame(
            [("10.2.7.9", False), ("10.3.1.1", False)],
            "ip string, device_is_bot boolean",
        )
        out = {r["ip"]: r for r in with_geo_columns(
            hits, ranges
        ).collect()}
        assert out["10.2.7.9"]["geo_city"] == "Berlin"
        assert out["10.2.7.9"]["geo_latitude"] == 52.5244
        # the skipped network reproduces the reference's fallback row
        assert out["10.3.1.1"]["geo_city"] == "(not set)"
        assert out["10.3.1.1"]["geo_latitude"] == 0.0
