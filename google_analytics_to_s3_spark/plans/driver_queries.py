"""Driver-facing query registry: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB oracle SQL equivalent.

Parity rules (so the driver's order-insensitive value-hash matches):

- Column names are aliased identically in Spark and SQL.
- Ordering-sensitive windows get a total order (ts, unique id).
- Aggregated doubles are summed through ``decimal(38,6)`` (exact,
  order-independent — plain double sums are nondeterministic under
  partial aggregation) and cast back to double. Inputs have ≤2 decimal
  digits, products ≤4, so scale-6 rounding is exact in both engines.
- ``visit_id`` uses md5 here (DuckDB 1.0 has no sha1); the engine's
  default sha1 (reference main.py:437) is covered by unit tests.
- events.ts (parquet TIMESTAMP_NANOS) is read as epoch-nanos long in
  Spark and truncated to epoch millis; DuckDB's ``epoch_ms(ts)``
  truncates identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ga import map_enum
from ..operators.sessionize import (
    sessionize,
    with_session_flags,
)
from ..sources.testdata import load_events, load_table

GAP_MS = 30 * 60 * 1000

# Shared oracle CTE: events with epoch-millis clock.
_EVENTS_MS = (
    "SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms FROM events"
)

_SESS_CTE = f"""
WITH e AS ({_EVENTS_MS}),
lagged AS (
  SELECT e.*,
         lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
           AS last_event
  FROM e
),
flagged AS (
  SELECT *,
         CASE WHEN last_event IS NULL OR ts_ms - last_event >= {GAP_MS}
              THEN 1 ELSE 0 END AS is_new_session
  FROM lagged
),
numbered AS (
  SELECT *,
         CAST(sum(is_new_session) OVER (
             PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS user_session_id,
         CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts_ms, event_id) AS INTEGER)
           AS event_sequence
  FROM flagged
)
"""


def _sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "ts_ms"
    )
    return sessionize(
        e, visitor_col="user_id", ts_col="ts_ms", tiebreak_cols=("event_id",)
    )


# --------------------------------------------------------------------------
# W1-W2: lag + session-start flag
# --------------------------------------------------------------------------

def q_sessionize_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select("event_id", "user_id", "ts_ms")
    out = with_session_flags(
        e, visitor_col="user_id", ts_col="ts_ms", tiebreak_cols=("event_id",)
    )
    return out.select("event_id", "user_id", "ts_ms", "last_event", "is_new_session")


SQL_SESSIONIZE_FLAGS = f"""
{_SESS_CTE}
SELECT event_id, user_id, ts_ms, last_event, is_new_session FROM numbered
"""

# --------------------------------------------------------------------------
# W3-W7: full sessionization (session number, bounds, id, sequence)
# --------------------------------------------------------------------------

def q_sessionize_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _sessionized_events(spark, sf_dir)
    return s.select(
        "event_id",
        "user_id",
        "ts_ms",
        "is_new_session",
        "user_session_id",
        "event_sequence",
        "visit_start",
        "visit_end",
        F.md5(
            F.concat(
                F.col("user_id").cast("string"),
                F.col("visit_start").cast("string"),
                F.col("visit_end").cast("string"),
            )
        ).alias("visit_id"),
    )


SQL_SESSIONIZE_FULL = f"""
{_SESS_CTE}
SELECT event_id, user_id, ts_ms, is_new_session, user_session_id,
       event_sequence,
       min(ts_ms) OVER w AS visit_start,
       max(ts_ms) OVER w AS visit_end,
       md5(concat(CAST(user_id AS VARCHAR),
                  CAST(min(ts_ms) OVER w AS VARCHAR),
                  CAST(max(ts_ms) OVER w AS VARCHAR))) AS visit_id
FROM numbered
WINDOW w AS (PARTITION BY user_id, user_session_id)
"""

# --------------------------------------------------------------------------
# Session stats: one row per session (groupBy refinement of the windows)
# --------------------------------------------------------------------------

def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _sessionized_events(spark, sf_dir)
    return s.groupBy("user_id", "user_session_id").agg(
        F.min("ts_ms").alias("visit_start"),
        F.max("ts_ms").alias("visit_end"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
        F.count("*").alias("n_events"),
    )


SQL_SESSION_STATS = f"""
{_SESS_CTE}
SELECT user_id, user_session_id,
       min(ts_ms) AS visit_start,
       max(ts_ms) AS visit_end,
       max(ts_ms) - min(ts_ms) AS duration_ms,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, user_session_id
"""

# --------------------------------------------------------------------------
# A2: per-session conditional purchase revenue (typed; exact decimal sum)
# --------------------------------------------------------------------------

def q_session_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _sessionized_events(spark, sf_dir)
    rev = F.when(
        F.col("event_type") == "purchase", F.col("value").cast("decimal(38,6)")
    )
    return s.groupBy("user_id", "user_session_id").agg(
        F.sum(rev).cast("double").alias("purchase_revenue"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )


SQL_SESSION_REVENUE = f"""
{_SESS_CTE}
SELECT user_id, user_session_id,
       CAST(sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
         AS purchase_revenue,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
FROM numbered
GROUP BY user_id, user_session_id
"""

# --------------------------------------------------------------------------
# Flagship: daily engagement mart (sessionize → day-grain rollup)
# --------------------------------------------------------------------------

def q_daily_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _sessionized_events(spark, sf_dir)
    day = F.expr("ts_ms div 86400000").alias("day_num")
    return (
        s.groupBy(day)
        .agg(
            F.sum("is_new_session").alias("n_sessions_started"),
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(38,6)"),
                )
            )
            .cast("double")
            .alias("purchase_revenue"),
        )
    )


SQL_DAILY_ENGAGEMENT = f"""
{_SESS_CTE}
SELECT ts_ms // 86400000 AS day_num,
       CAST(sum(is_new_session) AS BIGINT) AS n_sessions_started,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
         AS purchase_revenue
FROM numbered
GROUP BY 1
"""

# --------------------------------------------------------------------------
# F1: enum mapping (hits_type-style when-chain) — no UDF
# --------------------------------------------------------------------------

_EVENT_ENUM = {
    "view": "PAGE",
    "click": "EVENT",
    "purchase": "TRANSACTION",
    "signup": "SOCIAL",
    "error": "EXCEPTION",
}


def q_hit_type_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.withColumn("hits_type", map_enum("event_type", _EVENT_ENUM, "UNKNOWN"))
        .groupBy("hits_type")
        .agg(F.count("*").alias("n_hits"))
    )


SQL_HIT_TYPE_MAPPING = """
SELECT CASE event_type
         WHEN 'view' THEN 'PAGE'
         WHEN 'click' THEN 'EVENT'
         WHEN 'purchase' THEN 'TRANSACTION'
         WHEN 'signup' THEN 'SOCIAL'
         WHEN 'error' THEN 'EXCEPTION'
         ELSE 'UNKNOWN' END AS hits_type,
       count(*) AS n_hits
FROM events
GROUP BY 1
"""

# --------------------------------------------------------------------------
# Generic relational surface (inherited from Spark, declared per SURVEY §2)
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+filter+agg (hash agg with partial combine)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate <= timestamp_ntz'1998-09-02 00:00:00'")
    )
    dec = lambda c: F.col(c).cast("decimal(38,6)")  # noqa: E731
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(38,6)")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
         AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + agg + deterministic top-10."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < timestamp_ntz'1998-03-15 00:00:00'")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > timestamp_ntz'1998-03-15 00:00:00'")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join; dims broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= timestamp_ntz'1996-01-01 00:00:00' AND "
            "o_orderdate < timestamp_ntz'1997-01-01 00:00:00'"
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_order_lineitem_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-shaped left-outer equi-join: parent rows survive without children."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    per_order = l.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("items_value"),
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left_outer")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
            "items_value",
        )
    )


SQL_ORDER_LINEITEM_LEFT_JOIN = """
SELECT o_orderkey, o_orderstatus,
       COALESCE(n_items, 0) AS n_items, items_value
FROM orders
LEFT OUTER JOIN (
  SELECT l_orderkey, count(*) AS n_items,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           AS items_value
  FROM lineitem GROUP BY l_orderkey
) li ON o_orderkey = li.l_orderkey
"""


def q_union_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1-shaped union (by name) + distinct."""
    e = load_events(spark, sf_dir)
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    signups = e.filter(F.col("event_type") == "signup").select("user_id")
    return buyers.unionByName(signups).distinct()


SQL_UNION_ACTIVE_USERS = """
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
"""

# --------------------------------------------------------------------------
# Training-data ops: exact dedup + text stats (documents table)
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash: canonical = lowest doc_id per hash."""
    d = load_table(spark, sf_dir, "documents")
    w = F.expr("row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_hash"),
        w.alias("dup_rank"),
    ).withColumn("is_canonical", (F.col("dup_rank") == 1).cast("boolean"))


SQL_DEDUP_EXACT = """
SELECT doc_id, md5(text) AS text_hash,
       CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
            AS INTEGER) AS dup_rank,
       row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
         AS is_canonical
FROM documents
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality ratios, all native expressions."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.array(*[F.lit(s) for s in ("the", "a", "of", "and")])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
    )


SQL_TEXT_STATS = """
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
         AS n_tokens,
       CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t IN ('the', 'a', 'of', 'and'))) AS INTEGER)
         AS n_stopwords,
       CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
         / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
         AS stopword_ratio
FROM documents
"""

# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

QUERIES: dict = {
    "sessionize_flags": q_sessionize_flags,
    "sessionize_full": q_sessionize_full,
    "session_stats": q_session_stats,
    "session_revenue": q_session_revenue,
    "daily_engagement": q_daily_engagement,
    "hit_type_mapping": q_hit_type_mapping,
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "order_lineitem_left_join": q_order_lineitem_left_join,
    "union_active_users": q_union_active_users,
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
}

ORACLES: dict[str, str] = {
    "sessionize_flags": SQL_SESSIONIZE_FLAGS,
    "sessionize_full": SQL_SESSIONIZE_FULL,
    "session_stats": SQL_SESSION_STATS,
    "session_revenue": SQL_SESSION_REVENUE,
    "daily_engagement": SQL_DAILY_ENGAGEMENT,
    "hit_type_mapping": SQL_HIT_TYPE_MAPPING,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
    "order_lineitem_left_join": SQL_ORDER_LINEITEM_LEFT_JOIN,
    "union_active_users": SQL_UNION_ACTIVE_USERS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "text_stats": SQL_TEXT_STATS,
}
