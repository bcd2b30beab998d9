"""Multi-touch traffic-source attribution (F2-F7 in SURVEY.md §2.9) as
native column expressions.

The reference implements these as five Python scalar UDFs
(functions/sessionization/main.py:466-716); each UDF column cost a full
Python-worker round trip per row. Here each is a pure Catalyst
expression tree over ``parse_url`` — the whole attribution block stays
inside whole-stage codegen.

Semantics reproduced from the reference truth tables
(FIXTURES.md F6; main.py:499-556, 595-655, 658-702):

- click-id keys: gclid/gclsrc/dclid → google, fbclid → facebook,
  mscklid → bing (first matching key in query-string order wins)
- ``utm_source=x`` → x; empty query + no referrer → ``(direct)``
- referrer ``googleadservices`` → source google / medium paid
- search-engine referrer (google yahoo bing aol ask comcast nexttag
  local) + no UTM → medium organic, keyword ``(not provided)``
- other referrer → medium referral; android-app:// referrers pass the
  package name through as source
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .url import (
    contains_any,
    has_query,
    query_keys,
    url_host,
    url_query_param,
)

CHANNELS = ["utm_source", "gclid", "gclsrc", "dclid", "fbclid", "mscklid", "direct"]
SEARCH_ENGINES = ["google", "yahoo", "bing", "aol", "ask", "comcast", "nexttag", "local"]
PAID_CHANNELS = ["gclid", "gclsrc", "dclid", "fbclid", "mscklid"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _first_channel_key(url: Column) -> Column:
    """First query key containing any channel token (main.py:499-503)."""
    matched = F.filter(query_keys(url), lambda k: contains_any(k, CHANNELS))
    return F.get(matched, 0)


def _identify_channel(url: Column) -> Column:
    """``identify_channel`` over the dl query (main.py:499-514).

    No matching key (incl. empty query) → ``(direct)``; a key merely
    *containing* a channel token but not equal to one → ``(not set)``.
    """
    key = _first_channel_key(url)
    return (
        F.when(key.isNull(), "(direct)")
        .when(key.isin("gclid", "gclsrc", "dclid"), "google")
        .when(key == "fbclid", "facebook")
        .when(key == "mscklid", "bing")
        .when(key == "utm_source", url_query_param(url, "utm_source"))
        .otherwise("(not set)")
    )


def _split_hostname(dr: Column) -> Column:
    """``split_hostname`` (main.py:519-533): brand component of the
    referrer host. www.x.y → x; a.b.c → b; a.b → a; else full host."""
    host = F.coalesce(url_host(dr), F.lit(""))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return (
        F.when(F.array_contains(parts, "www"), F.get(parts, 1))
        .when(n == 3, F.get(parts, 1))
        .when(n == 2, F.get(parts, 0))
        .otherwise(host)
    )


def _dr_second_component(dr: Column) -> Column:
    """Medium's host derivation (main.py:627): 2nd dot-component of the
    authority, i.e. ``dr.split('//')[-1].split('/')[0].split('.')[1]``."""
    authority = F.get(F.split(F.element_at(F.split(dr, "//"), -1), "/"), 0)
    return F.get(F.split(authority, r"\."), 1)


def _android_app(dr: Column) -> Column:
    return F.get(F.split(dr, "//"), 1)


def _parse_dr_source(dl: Column, dr: Column) -> Column:
    """``parse_dr_source`` (main.py:535-556)."""
    hostname = _split_hostname(dr)
    dl_has_q = has_query(dl)
    dr_has_q = has_query(dr)
    utm_source = url_query_param(dl, "utm_source")
    ref = url_query_param(dl, "ref")
    return (
        F.when(dr.startswith("android-app"), _android_app(dr))
        .when(hostname == "googleadservices", "google")
        .when(~dl_has_q & ~dr_has_q, hostname)
        .when(dl_has_q & utm_source.isNotNull(), utm_source)
        .when(dr_has_q, hostname)
        .when(dl_has_q & ref.isNotNull(), ref)
        .when(dl_has_q, _identify_channel(dl))
        .otherwise("(not set)")
    )


def traffic_source(
    is_new_session: Column | str = "is_new_session",
    dl: Column | str = "body_dl",
    dr: Column | str = "body_dr",
) -> Column:
    """F2: ``extract_source_source`` (main.py:466-564)."""
    new = _c(is_new_session) == 1
    dl_, dr_ = _c(dl), _c(dr)
    return (
        F.when(new & dr_.isNull(), _identify_channel(dl_))
        .when(new, _parse_dr_source(dl_, dr_))
        .otherwise("(not set)")
    )


def traffic_campaign(
    is_new_session: Column | str = "is_new_session",
    dl: Column | str = "body_dl",
) -> Column:
    """F3: utm_campaign of dl on session start (main.py:568-592).

    The reference routes referrer/non-referrer cases to two functions
    that both just read dl's utm_campaign — collapsed here.
    """
    return F.when(
        _c(is_new_session) == 1,
        F.coalesce(url_query_param(_c(dl), "utm_campaign"), F.lit("(not set)")),
    ).otherwise("(not set)")


def _parse_dl_medium(dl: Column) -> Column:
    """``identify_medium`` over dl (main.py:595-608)."""
    utm_medium = url_query_param(dl, "utm_medium")
    gclid = url_query_param(dl, "gclid")
    return (
        F.when(utm_medium.isNotNull(), utm_medium)
        .when(gclid.isNotNull(), "paid")
        .otherwise("(none)")
    )


def _parse_dr_medium(dr: Column, dl: Column) -> Column:
    """``parse_dr_medium`` (main.py:627-645)."""
    hostname = _dr_second_component(dr)
    dl_has_q = has_query(dl)
    ref = url_query_param(dl, "ref")
    utm_medium = url_query_param(dl, "utm_medium")
    any_paid = contains_any(
        F.array_join(query_keys(dl), ""), PAID_CHANNELS
    )
    # `key in query` in the reference is exact dict-key membership; the
    # contains_any over joined keys can only false-positive if a key
    # embeds a click-id token, which the reference's *source* logic
    # treats as a channel match anyway.
    paid_key_present = F.filter(
        query_keys(dl), lambda k: k.isin(*PAID_CHANNELS)
    )
    has_paid = F.size(paid_key_present) > 0
    _ = any_paid  # kept for documentation of the divergence considered
    return (
        F.when(hostname == "googleadservices", "paid")
        .when(~dl_has_q & hostname.isin(*SEARCH_ENGINES), "organic")
        .when(
            (~dl_has_q & ~hostname.isin(*SEARCH_ENGINES))
            | (dl_has_q & ref.isNotNull()),
            "referral",
        )
        .when(dl_has_q & has_paid, "paid")
        .when(dl_has_q & utm_medium.isNotNull(), utm_medium)
        .otherwise("(none)")
    )


def traffic_medium(
    is_new_session: Column | str = "is_new_session",
    dl: Column | str = "body_dl",
    dr: Column | str = "body_dr",
) -> Column:
    """F4: ``extract_source_medium`` (main.py:595-655)."""
    new = _c(is_new_session) == 1
    dl_, dr_ = _c(dl), _c(dr)
    return (
        F.when(new & dr_.isNull(), _parse_dl_medium(dl_))
        .when(new, _parse_dr_medium(dr_, dl_))
        .otherwise("(none)")
    )


def traffic_keyword(
    is_new_session: Column | str = "is_new_session",
    dl: Column | str = "body_dl",
    dr: Column | str = "body_dr",
    medium: Column | str = "trafficSource_medium",
) -> Column:
    """F5: ``extract_source_keyword`` (main.py:658-683)."""
    new = _c(is_new_session) == 1
    return (
        F.when(_c(medium) == "organic", "(not provided)")
        .when(
            new & _c(dr).isNull(),
            F.coalesce(url_query_param(_c(dl), "utm_term"), F.lit("(not set)")),
        )
        .otherwise("(not set)")
    )


def traffic_ad_content(
    is_new_session: Column | str = "is_new_session",
    dl: Column | str = "body_dl",
    dr: Column | str = "body_dr",
) -> Column:
    """F6: ``extract_source_ad_content`` (main.py:687-702)."""
    return F.when(
        (_c(is_new_session) == 1) & _c(dr).isNull(),
        F.coalesce(url_query_param(_c(dl), "utm_content"), F.lit("(not set)")),
    ).otherwise("(not set)")


def is_true_direct(source: Column | str = "trafficSource_source") -> Column:
    """F7 (main.py:1205-1209): 'True' when source is (direct), else null."""
    return F.when(_c(source) == "(direct)", "True")
