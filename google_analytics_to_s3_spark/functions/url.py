"""URL / querystring scalar ops as native Catalyst expressions.

Replaces the reference's Python UDF helpers (F8-F10, F13 in SURVEY.md
§2.9; reference functions/sessionization/main.py:329-376, 479-497,
1230-1242) with ``parse_url`` / ``split`` / higher-order functions —
no Python workers, CSE-able, codegen-friendly.

Known intentional divergences from the reference UDFs (documented, all
pathological inputs): relative URLs (no scheme) parse as empty
host/path instead of urlparse's lenient splitting. Duplicate query
keys: the ``parse_url``-based helpers (``url_query_param``,
``query_keys``) resolve first-occurrence, while :func:`canonical_url`
goes through ``str_to_map`` and resolves LAST-wins (matching the
reference's Python-dict behavior) — see its docstring for the session
conf this depends on.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_path(url: Column | str) -> Column:
    """F10: urlparse(url).path."""
    return F.parse_url(_c(url), F.lit("PATH"))


def url_host(url: Column | str) -> Column:
    """F10: urlparse(url).netloc."""
    return F.parse_url(_c(url), F.lit("HOST"))


def url_query(url: Column | str) -> Column:
    return F.parse_url(_c(url), F.lit("QUERY"))


def url_query_param(url: Column | str, key: str) -> Column:
    """Raw (undecoded) value of ``key`` in the query string; null if absent."""
    return F.parse_url(_c(url), F.lit("QUERY"), F.lit(key))


def query_items(url: Column | str) -> Column:
    """Valid ``k=v`` items of the query string, in appearance order.

    Mirrors the reference's ``split_query`` validity rule
    (main.py:490-493): item non-empty and '=' not at position 0.
    """
    q = url_query(url)
    return F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda x: (F.length(x) > 0) & (F.instr(x, "=") > 1),
    )


def query_keys(url: Column | str) -> Column:
    """Keys of the valid query items, in appearance order."""
    return F.transform(query_items(url), lambda x: F.get(F.split(x, "=", 2), 0))


def has_query(url: Column | str) -> Column:
    """True iff the URL has a non-empty query string (main.py:488-489)."""
    q = url_query(url)
    return q.isNotNull() & (F.length(q) > 0)


def contains_any(col: Column, needles: list[str]) -> Column:
    return reduce(or_, [col.contains(n) for n in needles])


def page_path_levels(url: Column | str) -> Column:
    """F8 (``parse_page_path``, main.py:329-376): split the URL path into
    up to 4 ``/segment`` strings padded with ``''``.

    The reference registered this as an ArrayType UDF and then called it
    4x per row (main.py:1213-1221); here it is one array-valued native
    expression computed once.
    """
    parts = F.filter(
        F.split(F.coalesce(url_path(url), F.lit("")), "/"),
        lambda x: F.length(x) > 0,
    )
    level = lambda i: F.coalesce(  # noqa: E731
        F.concat(F.lit("/"), F.get(parts, i)), F.lit("")
    )
    return F.array(level(0), level(1), level(2), level(3))


def landing_page(is_new_session: Column | str, url: Column | str) -> Column:
    """F9 (main.py:711-716): URL path on session start, else null."""
    return F.when(_c(is_new_session) == 1, F.coalesce(url_path(url), F.lit("")))


# ---------------------------------------------------------------------------
# URL canonicalization (tracking-parameter-invariant page identity)
# ---------------------------------------------------------------------------

#: Query keys that identify a *visit*, not a *page* — ad-click and
#: campaign attribution parameters. Dropping them is what lets pageview
#: dedup collapse the N utm-tagged spellings of one page into one key.
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAM_KEYS = (
    "gclid", "fbclid", "msclkid", "dclid", "mc_cid", "mc_eid", "igshid",
)


def canonical_url(url: Column | str) -> Column:
    """Canonical page identity for a raw URL, as one native expression.

    Rules (each a well-known URL-normalization step):
      - scheme and host lowercased; the port is dropped (``parse_url
        HOST`` never includes it — acceptable because the collector
        only ever sees the default port);
      - trailing ``/`` stripped from the path (empty path → ``/``);
      - the fragment dropped (``parse_url QUERY`` never includes it);
      - tracking parameters removed (``utm_*`` prefixes and the click-id
        keys in :data:`TRACKING_PARAM_KEYS`);
      - surviving query parameters re-emitted in key-sorted order, so
        ``?a=1&b=2`` and ``?b=2&a=1`` canonicalize identically;
      - duplicate query keys resolve LAST-wins (``?a=1&a=2`` → ``a=2``,
        matching the reference's Python-dict semantics).

    CONF DEPENDENCY: the last-wins rule relies on
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by
    ``session.get_spark``); under Spark's default ``EXCEPTION`` policy
    ``str_to_map`` throws at runtime on duplicate keys. Sessions not
    built through this repo's factory must set the conf themselves.

    Pure projection — ``parse_url`` + map/array higher-order functions,
    no UDF, no shuffle; safe to apply in the scan stage of a 100 TB
    pageview table before the dedup groupBy.
    """
    u = _c(url)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    path = F.when(F.length(path) == 0, F.lit("/")).otherwise(path)

    def _keep(k: Column, v: Column) -> Column:
        is_tracking = reduce(
            or_,
            [k.startswith(p) for p in TRACKING_PARAM_PREFIXES]
            + [k == key for key in TRACKING_PARAM_KEYS],
        )
        return ~is_tracking

    qmap = F.str_to_map(
        F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit("")),
        F.lit("&"), F.lit("="),
    )
    kept = F.array_sort(F.map_entries(F.map_filter(qmap, _keep)))
    qs = F.array_join(
        F.transform(kept, lambda e: F.concat(e.key, F.lit("="), e.value)),
        "&",
    )
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(
            F.lit("")
        ),
    )
