"""End-to-end mmdb conversion: a fixture-built MaxMind DB binary
(testing/fixtures.make_mmdb, public spec) round-trips through the
pure reader (functions/mmdb_format.py) and mmdb_to_ranges, and the
resulting ranges table drives the broadcast geo join — the previously
untestable wrapper now runs for real (r6 VERDICT task 6)."""

import pytest

from google_analytics_to_s3_spark.functions.geo_mmdb import (
    iter_mmdb_entries,
    mmdb_to_ranges,
    network_to_bounds,
)
from google_analytics_to_s3_spark.functions.mmdb_format import (
    MmdbFormatError,
    iter_mmdb,
    read_metadata,
)
from google_analytics_to_s3_spark.testing.fixtures import make_mmdb


def _city_record(city: str, cid: int, lat: float, lon: float) -> dict:
    return {
        "city": {"geoname_id": cid, "names": {"en": city}},
        "continent": {"code": "EU", "names": {"en": "Europe"}},
        "country": {"iso_code": "DE", "names": {"en": "Germany"}},
        "location": {
            "latitude": lat, "longitude": lon,
            "time_zone": "Europe/Berlin",
        },
        "postal": {"code": "10115"},
        "subdivisions": [{"names": {"en": "Berlin"}}],
    }


BERLIN = _city_record("Berlin", 2950159, 52.52, 13.40)
MUNICH = _city_record("Munich", 2867714, 48.14, 11.58)
# incomplete record: no city -> reference all-or-nothing fallback
PARTIAL = {
    "continent": {"code": "EU", "names": {"en": "Europe"}},
    "country": {"iso_code": "DE", "names": {"en": "Germany"}},
}


def _v6_fixture(tmp_path):
    """ip_version=6 database, the way GeoLite2 actually ships: IPv4
    content under ::ffff:0:0/96 plus one genuinely-IPv6 network."""
    payload = make_mmdb(
        [
            ("::ffff:102:300/120", BERLIN),    # 1.2.3.0/24
            ("::ffff:506:700/120", MUNICH),    # 5.6.7.0/24
            ("::ffff:909:900/120", PARTIAL),   # 9.9.9.0/24, incomplete
            ("2a02:8100::/32", BERLIN),        # pure v6: no v4 range
        ],
        ip_version=6,
    )
    path = tmp_path / "test-city.mmdb"
    path.write_bytes(payload)
    return str(path)


class TestPureReader:
    def test_metadata_roundtrip(self, tmp_path):
        path = _v6_fixture(tmp_path)
        meta = read_metadata(open(path, "rb").read())
        assert meta["ip_version"] == 6
        assert meta["record_size"] == 32
        assert meta["binary_format_major_version"] == 2
        assert meta["node_count"] > 0

    def test_iterates_all_networks_in_order(self, tmp_path):
        path = _v6_fixture(tmp_path)
        entries = list(iter_mmdb(path))
        nets = [n for n, _ in entries]
        assert nets == [
            "::ffff:102:300/120",
            "::ffff:506:700/120",
            "::ffff:909:900/120",
            "2a02:8100::/32",
        ]
        by_net = dict(entries)
        assert by_net["::ffff:102:300/120"]["city"]["names"]["en"] == "Berlin"
        assert by_net["2a02:8100::/32"]["location"]["latitude"] == 52.52

    def test_v4_database(self, tmp_path):
        payload = make_mmdb(
            [("10.0.0.0/8", MUNICH), ("192.168.1.0/24", BERLIN)],
            ip_version=4,
        )
        p = tmp_path / "v4.mmdb"
        p.write_bytes(payload)
        entries = list(iter_mmdb(str(p)))
        assert [n for n, _ in entries] == ["10.0.0.0/8", "192.168.1.0/24"]
        assert entries[0][1]["city"]["names"]["en"] == "Munich"

    def test_shared_record_decoded_once(self, tmp_path):
        rec = _city_record("Shared", 1, 1.0, 2.0)
        payload = make_mmdb(
            [("1.0.0.0/8", rec), ("2.0.0.0/8", rec)], ip_version=4
        )
        p = tmp_path / "shared.mmdb"
        p.write_bytes(payload)
        a, b = [r for _, r in iter_mmdb(str(p))]
        assert a is b  # same data offset -> memoized object

    def test_rejects_garbage(self, tmp_path):
        p = tmp_path / "garbage.mmdb"
        p.write_bytes(b"not an mmdb file at all")
        with pytest.raises(MmdbFormatError):
            list(iter_mmdb(str(p)))


class TestNetworkToBounds:
    def test_plain_v4(self):
        assert network_to_bounds("1.2.3.0/24") == (0x01020300, 0x01020400)

    def test_v4_mapped_v6(self):
        # ::ffff:1.2.3.0/120 == 1.2.3.0/24 (r6 ADVICE: must convert)
        assert network_to_bounds("::ffff:102:300/120") == (
            0x01020300, 0x01020400,
        )

    def test_v4_compatible_v6(self):
        # ::1.2.3.4/128 under ::/96
        assert network_to_bounds("::102:304/128") == (
            0x01020304, 0x01020305,
        )

    def test_real_v6_dropped(self):
        assert network_to_bounds("2a02:8100::/32") is None
        # prefix shorter than 96 can span non-v4 space even when the
        # network address looks mapped
        assert network_to_bounds("::/0") is None

    def test_unparseable(self):
        assert network_to_bounds("not-a-network") is None


class TestMmdbToRanges:
    def test_end_to_end_conversion(self, spark, tmp_path):
        path = _v6_fixture(tmp_path)
        df = mmdb_to_ranges(spark, path)
        rows = {r["ip_start"]: r for r in df.collect()}
        # 2 complete v4-mapped entries convert; the incomplete record
        # and the pure-v6 network are skipped
        assert set(rows) == {0x01020300, 0x05060700}
        berlin = rows[0x01020300]
        assert berlin["ip_end"] == 0x01020400
        assert berlin["geo_city"] == "Berlin"
        assert berlin["geo_city_id"] == "2950159"
        assert berlin["geo_country_iso"] == "DE"
        assert berlin["latitude"] == 52.52
        assert rows[0x05060700]["geo_city"] == "Munich"

    def test_drives_the_broadcast_geo_join(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from google_analytics_to_s3_spark.functions.geo import (
            with_geo_columns,
        )

        path = _v6_fixture(tmp_path)
        ranges = mmdb_to_ranges(spark, path)
        hits = spark.createDataFrame(
            [("a", "1.2.3.4"), ("b", "5.6.7.200"), ("c", "8.8.8.8")],
            "id string, ip string",
        )
        out = {
            r["id"]: r["geo_city"]
            for r in with_geo_columns(
                hits, ranges, ip_col="ip"
            ).select("id", "geo_city").collect()
        }
        assert out == {"a": "Berlin", "b": "Munich", "c": "(not set)"}

    def test_zero_rows_from_nonempty_db_raises(self, spark, tmp_path):
        payload = make_mmdb([("2a02:8100::/32", BERLIN)], ip_version=6)
        p = tmp_path / "v6only.mmdb"
        p.write_bytes(payload)
        with pytest.raises(ValueError, match="0 IPv4 ranges"):
            mmdb_to_ranges(spark, str(p))

    def test_empty_db_is_empty_not_error(self, spark, tmp_path):
        payload = make_mmdb([], ip_version=4)
        p = tmp_path / "empty.mmdb"
        p.write_bytes(payload)
        assert mmdb_to_ranges(spark, str(p)).count() == 0


def test_parity_with_maxminddb_when_present(tmp_path):
    """When the real library is installed, its iteration must agree
    with the pure reader on the fixture; honest skip otherwise."""
    maxminddb = pytest.importorskip("maxminddb")
    path = _v6_fixture(tmp_path)
    with maxminddb.open_database(path) as reader:
        lib = [(str(n), r) for n, r in reader]
    ours = [
        (str(__import__("ipaddress").ip_network(n)), r)
        for n, r in iter_mmdb(path)
    ]
    assert [n for n, _ in lib] == [n for n, _ in ours]
    assert [r for _, r in lib] == [r for _, r in ours]


def test_entries_dispatch_without_lib(tmp_path):
    """iter_mmdb_entries falls back to the pure reader when maxminddb
    is absent (the state of this environment)."""
    path = _v6_fixture(tmp_path)
    assert len(list(iter_mmdb_entries(path))) == 4
