"""URL / querystring scalar ops as native Catalyst expressions.

Replaces the reference's Python UDF helpers (F8-F10, F13 in SURVEY.md
§2.9; reference functions/sessionization/main.py:329-376, 479-497,
1230-1242) with ``parse_url`` / ``split`` / higher-order functions —
no Python workers, CSE-able, codegen-friendly.

Known intentional divergences from the reference UDFs (documented, all
pathological inputs): duplicate query keys resolve via ``parse_url``
(first occurrence) instead of Python-dict last-wins; relative URLs
(no scheme) parse as empty host/path instead of urlparse's lenient
splitting.
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
