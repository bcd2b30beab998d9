"""GeoLite2 mmdb → ranges-table extraction (the missing on-ramp from
a real MaxMind database file to :func:`..functions.geo.with_geo_columns`).

The reference does per-record point lookups against
``GeoLite2-City.mmdb`` inside a Lambda (functions/enrichment/filters/
ip.py:4-78). The Spark-first design keeps the geo database as a
broadcast DataFrame of IP ranges instead (functions/geo.py) — this
module is the OFFLINE converter between the two: walk every network in
the mmdb once, emit one row per IPv4 network with the reference's
exact 15-field mapping, write parquet, and `geo_enrich` consumes it
unchanged.

Layering (so everything except the file read is testable without the
lib, which is not installed in this environment):

- :func:`record_to_geo_row` — PURE: one GeoLite2-City record dict →
  the geo_* field dict, with the reference's all-or-nothing fallback
  semantics (ip.py:31-64 wraps the whole projection in one
  try/KeyError: ANY missing key yields the full ``(not set)`` row).
- :func:`network_to_bounds` — PURE: IPv4 CIDR → [start, end) longs
  (stdlib ``ipaddress``); IPv6 networks return None (the ranges table
  and ``ipv4_to_long`` are IPv4 — same practical scope as the
  reference, whose GA collector records dotted-quad client IPs).
- :func:`ranges_rows_from_entries` — PURE: (network, record) pairs →
  ranges-table rows. Records that fall back (incomplete) are SKIPPED:
  the range join's left-outer ``(not set)`` fallback then reproduces
  the reference's error row for those IPs without storing dead rows.
  (Typed-schema delta, documented: the reference emits the STRING
  '(not set)' for lat/lon in its fallback row; the ranges table is
  double-typed, so unmatched rows get 0.0 — functions/geo.py:97-98.)
- :func:`mmdb_to_ranges` — opens the mmdb with ``maxminddb`` when
  installed, else the spec-derived pure reader
  (functions/mmdb_format.py), and builds the broadcast-ready
  DataFrame; raises loudly when a non-empty database converts to
  zero ranges.
"""

from __future__ import annotations

import ipaddress
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from .geo import GEO_ATTRS, NOT_SET

RANGES_SCHEMA = (
    "ip_start LONG, ip_end LONG, "
    + ", ".join(f"{a} STRING" for a in GEO_ATTRS)
    + ", latitude DOUBLE, longitude DOUBLE"
)


def record_to_geo_row(record: dict) -> dict | None:
    """GeoLite2-City record → geo_* dict (reference ip.py:31-46
    field-for-field: sub-continent / metro / network domain+location
    are hard-coded ``(not set)`` there too). Returns None when any
    required key is missing — the reference's single try/KeyError
    around the whole projection makes fallback all-or-nothing, never
    per-field."""
    try:
        return {
            "geo_continent": record["continent"]["names"]["en"],
            "geo_continent_code": record["continent"]["code"],
            "geo_sub_continent": NOT_SET,
            "geo_country": record["country"]["names"]["en"],
            "geo_country_iso": record["country"]["iso_code"],
            "geo_region": record["subdivisions"][0]["names"]["en"],
            "geo_metro": NOT_SET,
            "geo_city": record["city"]["names"]["en"],
            "geo_city_id": str(record["city"]["geoname_id"]),
            "geo_postal_code": record["postal"]["code"],
            "geo_timezone": record["location"]["time_zone"],
            "geo_network_domain": NOT_SET,
            "geo_network_location": NOT_SET,
            "latitude": float(record["location"]["latitude"]),
            "longitude": float(record["location"]["longitude"]),
        }
    except (KeyError, IndexError, TypeError):
        return None


def network_to_bounds(network: str) -> tuple[int, int] | None:
    """CIDR string → (ip_start inclusive, ip_end exclusive) as ints.

    IPv6 networks that EMBED IPv4 space are converted, not dropped:
    GeoLite2-City ships as an ip_version=6 database whose IPv4 content
    sits under ``::ffff:0:0/96`` (IPv4-mapped) or ``::/96``
    (IPv4-compatible), and iterators may yield those subtrees as IPv6
    CIDRs — dropping them would silently empty the converter (r6
    ADVICE). Any other IPv6 network returns None (the ranges table and
    ``ipv4_to_long`` are IPv4 — same practical scope as the
    reference, whose GA collector records dotted-quad client IPs)."""
    try:
        net = ipaddress.ip_network(network, strict=False)
    except ValueError:
        return None
    if net.version == 4:
        start = int(net.network_address)
        return start, start + net.num_addresses
    if net.prefixlen < 96:
        return None
    base = int(net.network_address)
    if net.network_address.ipv4_mapped is not None or base >> 32 == 0:
        start = base & 0xFFFFFFFF
        return start, start + net.num_addresses
    return None


def ranges_rows_from_entries(
    entries: Iterable[tuple[str, dict]],
) -> Iterator[tuple]:
    """(network_cidr, record) pairs → ranges-table row tuples in
    RANGES_SCHEMA column order. Skips IPv6 networks and incomplete
    records (see module docstring for why skipping is exact)."""
    for network, record in entries:
        bounds = network_to_bounds(str(network))
        if bounds is None:
            continue
        geo = record_to_geo_row(record)
        if geo is None:
            continue
        yield (
            bounds[0], bounds[1],
            *[geo[a] for a in GEO_ATTRS],
            geo["latitude"], geo["longitude"],
        )


def iter_mmdb_entries(mmdb_path: str) -> Iterator[tuple[str, dict]]:
    """Every (network_cidr, record) in the file: via the ``maxminddb``
    package when installed (battle-tested, memory-mapped), else the
    spec-derived pure-Python reader (functions/mmdb_format.py) — the
    converter runs for real either way."""
    try:
        import maxminddb
    except ImportError:
        from .mmdb_format import iter_mmdb

        yield from iter_mmdb(mmdb_path)
        return
    with maxminddb.open_database(mmdb_path) as reader:
        for network, record in reader:
            yield str(network), record


def mmdb_to_ranges(spark: SparkSession, mmdb_path: str) -> DataFrame:
    """Convert a GeoLite2-City mmdb file into the broadcast ranges
    DataFrame ``with_geo_columns`` consumes. One driver-side pass over
    the database (GeoLite2-City is ~3M networks / ~60 MB — a build
    step, not a per-query cost; persist the result as parquet and
    broadcast it thereafter).

    Raises when a NON-empty database converts to zero rows — the
    signature of an iterator yielding network forms the converter
    mishandles (r6 ADVICE: an all-IPv6-rendered database silently
    produced an empty ranges table)."""
    seen = 0

    def _counting() -> Iterator[tuple[str, dict]]:
        nonlocal seen
        for entry in iter_mmdb_entries(mmdb_path):
            seen += 1
            yield entry

    rows = list(ranges_rows_from_entries(_counting()))
    if seen and not rows:
        raise ValueError(
            f"mmdb_to_ranges: {seen} networks in {mmdb_path} yielded "
            "0 IPv4 ranges — the database renders networks in a form "
            "network_to_bounds does not recognize"
        )
    return spark.createDataFrame(rows, RANGES_SCHEMA)
