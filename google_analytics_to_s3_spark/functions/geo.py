"""GeoIP enrichment (L6/J2 in SURVEY.md §2.9/§2.3) as a broadcast
prefix-bucketed range join — no mmdb dependency, no per-row Python.

The reference does a per-record MaxMind point lookup in a Lambda
(enrichment/filters/ip.py:4-78) → 15 geo_* fields, with ``(not set)``
fallbacks and bots skipped.

Here the geo database is a DataFrame of IP ranges
(ip_start, ip_end, geo attributes). A naive ``start <= ip < end``
theta-join plans as BroadcastNestedLoopJoin — O(hits × ranges). We
explode each range over the /16 prefixes it covers and equi-join on
the hit IP's /16 prefix + a residual range filter: O(hits) with a
broadcast hash join, the shape that survives 100 TB.

Tests use a synthetic range table (FIXTURES.md isolation: the mmdb
download is out of scope, cf. reference enrichment/mmdb/readme.txt).
An mmdb-backed pandas-UDF lookup can slot behind the same output
contract when the data/library exist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEO_ATTRS = [
    "geo_continent", "geo_continent_code", "geo_sub_continent",
    "geo_country", "geo_country_iso", "geo_region", "geo_metro",
    "geo_city", "geo_city_id", "geo_postal_code", "geo_timezone",
    "geo_network_domain", "geo_network_location",
]

NOT_SET = "(not set)"


def ipv4_to_long(ip: Column | str) -> Column:
    """Dotted-quad IPv4 → 32-bit integer (null for non-IPv4)."""
    c = F.col(ip) if isinstance(ip, str) else ip
    o = F.split(c, r"\.")
    valid = (F.size(o) == 4) & c.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    val = (
        F.get(o, 0).cast("long") * 16777216
        + F.get(o, 1).cast("long") * 65536
        + F.get(o, 2).cast("long") * 256
        + F.get(o, 3).cast("long")
    )
    return F.when(valid, val)


def explode_ranges_by_prefix(ranges: DataFrame) -> DataFrame:
    """One row per /16 prefix covered by each [ip_start, ip_end) range.
    GeoIP ranges are typically ≪ /16 wide, so the fan-out is ~1x."""
    return ranges.withColumn(
        "prefix",
        F.explode(
            F.sequence(
                F.expr("ip_start div 65536"),
                F.expr("(ip_end - 1) div 65536"),
            )
        ),
    )


def with_geo_columns(
    hits: DataFrame,
    ranges: DataFrame,
    ip_col: str = "ip",
    bot_col: str = "device_is_bot",
) -> DataFrame:
    """Enrich hits with geo_* via broadcast prefix equi-join.

    ``ranges``: ip_start (long, inclusive), ip_end (long, exclusive),
    latitude/longitude (double) + GEO_ATTRS strings. Unmatched or bot
    rows get the reference's ``(not set)`` fallbacks
    (enrichment/filters/ip.py:10-64).
    """
    pref = explode_ranges_by_prefix(ranges)
    h = hits.withColumn("_ip_int", ipv4_to_long(ip_col)).withColumn(
        "_prefix", F.expr("_ip_int div 65536")
    )
    is_bot = F.coalesce(h[bot_col], F.lit(False)) if bot_col in hits.columns else F.lit(False)
    joined = h.join(
        F.broadcast(pref),
        (h["_prefix"] == pref["prefix"])
        & (h["_ip_int"] >= pref["ip_start"])
        & (h["_ip_int"] < pref["ip_end"])
        & ~is_bot,
        "left_outer",
    )
    geo_out = [F.coalesce(pref[a], F.lit(NOT_SET)).alias(a) for a in GEO_ATTRS]
    geo_out.append(F.coalesce(pref["latitude"], F.lit(0.0)).alias("geo_latitude"))
    geo_out.append(F.coalesce(pref["longitude"], F.lit(0.0)).alias("geo_longitude"))
    keep = [
        h[c]
        for c in hits.columns
        if c not in GEO_ATTRS and c not in ("geo_latitude", "geo_longitude")
    ]
    return joined.select(*keep, *geo_out)
