"""Driver queries: page-identity URL dedup, cross-device identity
stitching, and user-erasure propagation.

Three capabilities a GA-shaped warehouse grows into (the reference
stops at per-hit URL parsing — main.py:329-376 — and per-field IP
anonymization — main.py:168-178; these are the corpus-level versions):

- ``url_dedup``: canonicalize raw pageview URLs (tracking params,
  host case, default port, trailing slash, fragment, param order) and
  collapse to one row per page identity.
- ``identity_stitching``: connected components over the bipartite
  (login user, device) graph — the cross-device "person" resolution
  behind GA4's reporting identity.
- ``user_erasure``: right-to-be-forgotten propagation with a per-table
  audit report (operators/privacy.py).

Synthesis rules are shared literal arithmetic on ``event_id`` (same
expressions in Spark and the DuckDB oracle, never algebraically
rearranged), following driver_queries_exports.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url import canonical_url
from ..sources.testdata import load_events

__all__ = ["QUERIES_IDENTITY", "ORACLES_IDENTITY"]


# --------------------------------------------------------------------------
# URL canonicalization dedup
# --------------------------------------------------------------------------

def _messy_url() -> F.Column:
    """Deterministically messy URL per event: host-case / default-port /
    trailing-slash / param-order / tracking-param / fragment variants
    of ``http://shop.example/p/<event_id%10>?q=<event_id%3>[&ref=...]``."""
    m = lambda n: F.col("event_id") % n  # noqa: E731
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.when(m(2) == 0, F.lit("Shop.Example")).otherwise(
        F.lit("shop.example")
    )
    port = F.when(m(3) == 0, F.lit(":80")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/p/"), s(m(10)),
        F.when(m(5) == 0, F.lit("/")).otherwise(F.lit("")),
    )
    ref_part = F.when(
        m(11) < 4, F.concat(F.lit("ref=r"), s(m(5)), F.lit("&"))
    ).otherwise(F.lit(""))
    mid_part = F.when(
        m(2) == 0,
        F.concat(F.lit("utm_campaign=c"), s(m(4)), F.lit("&q="), s(m(3))),
    ).otherwise(F.concat(F.lit("q="), s(m(3))))
    click_part = F.when(
        m(7) == 0, F.concat(F.lit("&fbclid="), s(F.col("event_id")))
    ).otherwise(F.lit(""))
    frag = F.when(m(6) < 2, F.concat(F.lit("#s"), s(m(6)))).otherwise(
        F.lit("")
    )
    return F.concat(
        F.lit("http://"), host, port, path, F.lit("?"),
        ref_part, mid_part, click_part, frag,
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pageview dedup by canonical page identity: every raw-URL variant
    (tracking params, host case, :80, trailing slash, fragment, param
    order) collapses into one canonical key (functions/url.py
    canonical_url — pure parse_url + higher-order-function projection),
    then ONE hash aggregation: hits, distinct raw spellings, first-seen.

    The oracle never runs a URL parser: it recomputes the canonical
    form directly from the synthesis arithmetic, so the parser path is
    verified end-to-end against an independent derivation."""
    e = load_events(spark, sf_dir).select("event_id", "ts_ms")
    raw = e.withColumn("url", _messy_url())
    return (
        raw.withColumn("canon", canonical_url("url"))
        .groupBy(F.col("canon").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("url").cast("long").alias("n_variants"),
            F.min("ts_ms").cast("long").alias("first_seen_ms"),
        )
    )


SQL_URL_DEDUP = """
WITH raw AS (
  SELECT event_id, epoch_ms(ts) AS ts_ms,
         'http://'
         || CASE WHEN event_id % 2 = 0 THEN 'Shop.Example'
                 ELSE 'shop.example' END
         || CASE WHEN event_id % 3 = 0 THEN ':80' ELSE '' END
         || '/p/' || CAST(event_id % 10 AS VARCHAR)
         || CASE WHEN event_id % 5 = 0 THEN '/' ELSE '' END
         || '?'
         || CASE WHEN event_id % 11 < 4
                 THEN 'ref=r' || CAST(event_id % 5 AS VARCHAR) || '&'
                 ELSE '' END
         || CASE WHEN event_id % 2 = 0
                 THEN 'utm_campaign=c' || CAST(event_id % 4 AS VARCHAR)
                      || '&q=' || CAST(event_id % 3 AS VARCHAR)
                 ELSE 'q=' || CAST(event_id % 3 AS VARCHAR) END
         || CASE WHEN event_id % 7 = 0
                 THEN '&fbclid=' || CAST(event_id AS VARCHAR)
                 ELSE '' END
         || CASE WHEN event_id % 6 < 2
                 THEN '#s' || CAST(event_id % 6 AS VARCHAR)
                 ELSE '' END AS url,
         -- canonical form recomputed from the arithmetic, NOT parsed:
         -- sorted surviving params are q (always) then ref (q < ref)
         'http://shop.example/p/' || CAST(event_id % 10 AS VARCHAR)
         || '?q=' || CAST(event_id % 3 AS VARCHAR)
         || CASE WHEN event_id % 11 < 4
                 THEN '&ref=r' || CAST(event_id % 5 AS VARCHAR)
                 ELSE '' END AS canonical_url
  FROM events
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
       CAST(min(ts_ms) AS BIGINT) AS first_seen_ms
FROM raw GROUP BY 1
"""


# --------------------------------------------------------------------------
# Cross-device identity stitching
# --------------------------------------------------------------------------

_DEV_BASE = 1000       # device node ids: 1000 + user_id*3 + event_id%3
_KIOSK_BASE = 100_000  # shared-device node ids: 100000 + event_id%3


def _stitch_edges(e: DataFrame) -> DataFrame:
    """Bipartite (login, device) edges: every user rotates through 3
    personal devices; ~1% of events happen on one of 3 shared kiosks,
    which is what makes stitching non-trivial (kiosks merge otherwise
    unrelated users into one person-cluster — the over-merge a real
    deployment must then window or threshold away)."""
    own = e.select(
        F.col("user_id").alias("src"),
        (F.lit(_DEV_BASE) + F.col("user_id") * 3 + F.col("event_id") % 3)
        .alias("dst"),
    )
    kiosk = e.filter(F.col("event_id") % 101 == 0).select(
        F.col("user_id").alias("src"),
        (F.lit(_KIOSK_BASE) + F.col("event_id") % 3).alias("dst"),
    )
    return own.unionByName(kiosk).distinct()


def q_identity_stitching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GA4-style reporting identity: connected components over the
    (login user, device) graph via large-star/small-star contraction
    (operators/graph.py, O(log n) rounds on any diameter). person_id =
    smallest user id in the component (device node ids are offset above
    the user id space, so min(component) is always a login). The oracle
    is a recursive-CTE transitive closure over the same edge synthesis."""
    from ..operators.graph import connected_components_star

    e = load_events(spark, sf_dir).select("event_id", "user_id")
    labels = connected_components_star(
        _stitch_edges(e), id_out="id", comp_out="component"
    )
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum((F.col("id") < _DEV_BASE).cast("long"))
        .cast("long")
        .alias("n_users"),
    )
    return (
        labels.filter(F.col("id") < _DEV_BASE)
        .join(sizes, "component")
        .select(
            F.col("id").alias("user_id"),
            F.col("component").alias("person_id"),
            "n_users",
            "n_nodes",
        )
    )


SQL_IDENTITY_STITCHING = f"""
WITH RECURSIVE ed AS (
  SELECT user_id AS a,
         {_DEV_BASE} + user_id * 3 + event_id % 3 AS b
  FROM events
  UNION
  SELECT user_id, {_KIOSK_BASE} + event_id % 3
  FROM events WHERE event_id % 101 = 0
),
edges AS (SELECT a AS src, b AS dst FROM ed UNION SELECT b, a FROM ed),
reach(id, root) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
),
lab AS (SELECT id, min(root) AS component FROM reach GROUP BY id),
sizes AS (
  SELECT component,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(CASE WHEN id < {_DEV_BASE} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_users
  FROM lab GROUP BY 1
)
SELECT l.id AS user_id, l.component AS person_id, s.n_users, s.n_nodes
FROM lab l JOIN sizes s USING (component)
WHERE l.id < {_DEV_BASE}
"""


# --------------------------------------------------------------------------
# User erasure propagation
# --------------------------------------------------------------------------

_ERASE_MOD = 53  # deterministic deletion-request sample: user_id % 53 = 0


def q_user_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit: a deletion-request list propagates
    through the raw event table and two derived marts (daily engagement,
    user profile); one report row per table with total/purged/kept rows
    and distinct users hit. Every purge check is a broadcast join of the
    tiny request list — the fact tables never shuffle
    (operators/privacy.py)."""
    from ..operators.privacy import erasure_report

    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_ms", "event_type", "value"
    )
    requests = (
        e.filter(F.col("user_id") % _ERASE_MOD == 0)
        .select("user_id")
        .distinct()
    )
    daily = (
        e.select(
            "user_id", F.expr("ts_ms div 86400000").alias("day")
        ).distinct()
    )
    profile = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
        ).alias("ltv"),
    )
    return erasure_report(
        [
            ("events", e, "user_id"),
            ("daily_engagement", daily, "user_id"),
            ("user_profile", profile, "user_id"),
        ],
        requests,
    )


SQL_USER_ERASURE = f"""
WITH r AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {_ERASE_MOD} = 0
),
ev AS (SELECT user_id FROM events),
de AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
),
up AS (SELECT user_id FROM events GROUP BY user_id)
SELECT 'events' AS table_name,
       CAST(count(*) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM r)
                THEN 1 ELSE 0 END) AS BIGINT) AS rows_purged,
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM r)
                THEN 0 ELSE 1 END) AS BIGINT) AS rows_kept,
       CAST(count(DISTINCT CASE WHEN user_id IN (SELECT user_id FROM r)
                           THEN user_id END) AS BIGINT) AS users_purged
FROM ev
UNION ALL
SELECT 'daily_engagement',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM r)
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM r)
                THEN 0 ELSE 1 END) AS BIGINT),
       CAST(count(DISTINCT CASE WHEN user_id IN (SELECT user_id FROM r)
                           THEN user_id END) AS BIGINT)
FROM de
UNION ALL
SELECT 'user_profile',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM r)
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM r)
                THEN 0 ELSE 1 END) AS BIGINT),
       CAST(count(DISTINCT CASE WHEN user_id IN (SELECT user_id FROM r)
                           THEN user_id END) AS BIGINT)
FROM up
"""


QUERIES_IDENTITY: dict = {
    "url_dedup": q_url_dedup,
    "identity_stitching": q_identity_stitching,
    "user_erasure": q_user_erasure,
}

ORACLES_IDENTITY: dict[str, str] = {
    "url_dedup": SQL_URL_DEDUP,
    "identity_stitching": SQL_IDENTITY_STITCHING,
    "user_erasure": SQL_USER_ERASURE,
}
