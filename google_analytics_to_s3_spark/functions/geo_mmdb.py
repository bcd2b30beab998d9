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
- :func:`mmdb_to_ranges` — the import-gated wrapper: opens the mmdb
  with ``maxminddb`` (raises ImportError with install guidance when
  absent) and builds the broadcast-ready DataFrame.
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
    None for IPv6 or unparseable networks."""
    try:
        net = ipaddress.ip_network(network, strict=False)
    except ValueError:
        return None
    if net.version != 4:
        return None
    start = int(net.network_address)
    return start, start + net.num_addresses


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


def mmdb_to_ranges(spark: SparkSession, mmdb_path: str) -> DataFrame:
    """Convert a GeoLite2-City mmdb file into the broadcast ranges
    DataFrame ``with_geo_columns`` consumes. One driver-side pass over
    the database (GeoLite2-City is ~3M networks / ~60 MB — a build
    step, not a per-query cost; persist the result as parquet and
    broadcast it thereafter).

    Requires the ``maxminddb`` package (same dependency as the
    reference's Lambda); import is gated so environments without it
    keep every other geo path usable.
    """
    try:
        import maxminddb
    except ImportError as e:  # pragma: no cover - env-specific
        raise ImportError(
            "mmdb_to_ranges needs the 'maxminddb' package "
            "(pip install maxminddb) — the synthetic-ranges path "
            "(functions/geo.py) works without it"
        ) from e
    with maxminddb.open_database(mmdb_path) as reader:
        rows = list(ranges_rows_from_entries(
            (str(network), record) for network, record in reader
        ))
    return spark.createDataFrame(rows, RANGES_SCHEMA)
