"""Driver queries for the enrichment / attribution / reshape operators
(SURVEY.md §2.3 J2, §2.5 W8-W11, §2.8, §2.9 F2-F10 + L2/L5/L6).

The events table has no IP / user-agent / URL columns, so each query
derives deterministic synthetic inputs from ``event_id`` with pure
arithmetic and literal arrays — identically computable in Spark and
DuckDB — then runs the real operator on the Spark side. The oracle
recomputes the expected output independently (range join for geo,
string ops for IP, hand-verified golden truth tables for the UA and
traffic-source parsers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import GEO_ATTRS, with_geo_columns
from ..functions.ip import anonymize_ip
from ..functions.traffic import (
    is_true_direct,
    traffic_ad_content,
    traffic_campaign,
    traffic_keyword,
    traffic_medium,
    traffic_source,
)
from ..functions.ua import with_device_columns
from ..functions.url import (
    landing_page,
    page_path_levels,
    url_host,
    url_query_param,
)
from ..operators.asof import asof_join
from ..operators.attribution import with_touchpoints
from ..operators.multimodal import decode_image_meta, with_binary_payload
from ..operators.sessionize import with_session_flags
from ..operators.unpivot import unpivot_products
from ..sources.testdata import (
    load_events, load_parallel, load_table, spread_if_narrow,
)

# --------------------------------------------------------------------------
# Shared synthetic-input helpers (Knuth multiplicative hash — identical
# BIGINT arithmetic in Spark and DuckDB).
# --------------------------------------------------------------------------

_MIX = 2654435761


def _ip_int(mod: int) -> F.Column:
    return (F.col("event_id") * F.lit(_MIX)) % F.lit(mod)


def _dotted_quad(c: F.Column) -> F.Column:
    return F.concat_ws(
        ".",
        (c / 16777216).cast("long").cast("string"),
        ((c / 65536).cast("long") % 256).cast("string"),
        ((c / 256).cast("long") % 256).cast("string"),
        (c % 256).cast("string"),
    )


_SQL_OCTETS = (
    "CAST(ip_int // 16777216 AS VARCHAR) || '.' || "
    "CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' || "
    "CAST((ip_int // 256) % 256 AS VARCHAR) || '.' || "
    "CAST(ip_int % 256 AS VARCHAR)"
)

# --------------------------------------------------------------------------
# L2: IP anonymization (zero the IPv4 last octet)
# --------------------------------------------------------------------------


def q_anonymize_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select("event_id")
    d = e.withColumn("ip", _dotted_quad(_ip_int(4294967296)))
    return d.select("event_id", "ip", anonymize_ip("ip").alias("ip_anon"))


SQL_ANONYMIZE_IP = f"""
WITH h AS (
  SELECT event_id, (event_id * {_MIX}) % 4294967296 AS ip_int FROM events
)
SELECT event_id,
       {_SQL_OCTETS} AS ip,
       regexp_replace({_SQL_OCTETS}, '\\.[0-9]+$', '.0') AS ip_anon
FROM h
"""

# --------------------------------------------------------------------------
# L6/J2: GeoIP enrichment as a broadcast prefix-bucketed range join.
# Ranges derived from nation (25 /12-sized blocks); every synthetic IP
# lands in exactly one block.
# --------------------------------------------------------------------------

_N_GEO_BLOCK = 1048576  # 2^20 addresses per nation block
_GEO_SPACE = 25 * _N_GEO_BLOCK


def _geo_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nk = F.col("n_nationkey")
    filler = {
        a: F.lit("x")
        for a in GEO_ATTRS
        if a not in ("geo_continent", "geo_country", "geo_country_iso", "geo_city")
    }
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            (nk.cast("long") * _N_GEO_BLOCK).alias("ip_start"),
            ((nk.cast("long") + 1) * _N_GEO_BLOCK).alias("ip_end"),
            F.col("r_name").alias("geo_continent"),
            F.col("n_name").alias("geo_country"),
            F.substring("n_name", 1, 2).alias("geo_country_iso"),
            F.concat(F.lit("city-"), nk.cast("string")).alias("geo_city"),
            (nk.cast("double") * 1.5).alias("latitude"),
            (nk.cast("double") * -2.0).alias("longitude"),
        )
        .withColumns(filler)
    )


def q_geo_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select("event_id")
    hits = e.withColumn("ip", _dotted_quad(_ip_int(_GEO_SPACE)))
    out = with_geo_columns(hits, _geo_ranges(spark, sf_dir), ip_col="ip")
    return out.select(
        "event_id", "ip", "geo_continent", "geo_country",
        "geo_country_iso", "geo_city", "geo_latitude", "geo_longitude",
    )


SQL_GEO_ENRICH = f"""
WITH h AS (
  SELECT event_id, (event_id * {_MIX}) % {_GEO_SPACE} AS ip_int FROM events
),
ranges AS (
  SELECT n_nationkey * {_N_GEO_BLOCK} AS ip_start,
         (n_nationkey + 1) * {_N_GEO_BLOCK} AS ip_end,
         r_name, n_name, n_nationkey
  FROM nation JOIN region ON n_regionkey = r_regionkey
)
SELECT event_id,
       {_SQL_OCTETS} AS ip,
       coalesce(r.r_name, '(not set)') AS geo_continent,
       coalesce(r.n_name, '(not set)') AS geo_country,
       coalesce(substr(r.n_name, 1, 2), '(not set)') AS geo_country_iso,
       coalesce('city-' || CAST(r.n_nationkey AS VARCHAR), '(not set)')
         AS geo_city,
       coalesce(CAST(r.n_nationkey AS DOUBLE) * 1.5, 0.0) AS geo_latitude,
       coalesce(CAST(r.n_nationkey AS DOUBLE) * -2.0, 0.0) AS geo_longitude
FROM h LEFT JOIN ranges r ON ip_int >= r.ip_start AND ip_int < r.ip_end
"""

# --------------------------------------------------------------------------
# L5: user-agent parse (native-expression impl) over 8 real UA strings.
# The oracle is a hand-verified golden truth table (also asserted by
# tests/test_enrich.py::test_ua_golden).
# --------------------------------------------------------------------------

UA_STRINGS = [
    # 0: Chrome on Windows
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    # 1: Safari on iPhone
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
    "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 "
    "Safari/604.1",
    # 2: Firefox on Linux
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    # 3: Edge on Windows
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    # 4: Samsung Internet on Android
    "Mozilla/5.0 (Linux; Android 13; SAMSUNG SM-G991B) AppleWebKit/537.36 "
    "(KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile "
    "Safari/537.36",
    # 5: Googlebot
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    # 6: curl
    "curl/8.4.0",
    # 7: Safari on macOS
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15",
]

# (is_bot, client_name, client_version, os_name, os_version,
#  device_type, is_mobile, device_brand) per UA index.
UA_GOLDEN = [
    (False, "Chrome", "120.0.0.0", "Windows", "10.0", "desktop", False, "(not set)"),
    (False, "Safari", "17.1", "iOS", "17_1", "mobile", True, "Apple"),
    (False, "Firefox", "121.0", "Linux", None, "desktop", False, "(not set)"),
    (False, "Edge", "120.0.2210.91", "Windows", "10.0", "desktop", False, "(not set)"),
    (False, "Samsung Internet", "23.0", "Android", "13", "mobile", True, "Samsung"),
    (True, None, None, None, None, None, None, None),
    (True, None, None, None, None, None, None, None),
    (False, "Safari", "17.0", "Mac OS X", "10_15_7", "desktop", False, "Apple"),
]

_UA_FIELDS = [
    "device_is_bot", "device_client_name", "device_client_version",
    "device_os_name", "device_os_version", "device_device_type",
    "device_is_mobile", "device_device_brand",
]


def q_ua_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Regex-heavy map work: spread the single-file scan across cores
    # (on a cluster, large inputs split naturally and this is a no-op
    # choice — see sources/testdata.load_parallel).
    # hash-partition on the bounded ua seed instead of keyless
    # round-robin: same single exchange, no sort-before-repartition
    # pass (guide §2.5), and rows with one ua_idx co-locate
    from .driver_queries_analytics import _spread

    e = _spread(load_events(spark, sf_dir).select("event_id"), spark)
    uas = F.array(*[F.lit(s) for s in UA_STRINGS])
    d = e.withColumn("ua_idx", (F.col("event_id") % 8).cast("int")).withColumn(
        "user_agent", F.element_at(uas, F.col("ua_idx") + 1)
    )
    out = with_device_columns(d)
    return out.groupBy("ua_idx", *_UA_FIELDS).agg(F.count("*").alias("n"))


# ua-parser-taxonomy family per UA index (functions/ua.py
# _ua_parser_family; parity corpus tests/test_ua_parity.py): only the
# mobile-split rows differ from UA_GOLDEN's engine families.
UA_GOLDEN_FAMILIES = [
    "Chrome", "Mobile Safari", "Firefox", "Edge",
    "Samsung Internet", None, None, "Safari",
]


def q_ua_parse_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ua-parser-taxonomy client families
    (with_device_columns(ua_parser_families=True)): driver-visible
    evidence for the mobile-split renames that raise exact-family
    agreement with the reference's ``user_agents`` lib to 27/29 on
    the parity corpus (reference enrichment/filters/
    user_agent.py:14-32)."""
    # hash-partition on the bounded ua seed instead of keyless
    # round-robin: same single exchange, no sort-before-repartition
    # pass (guide §2.5), and rows with one ua_idx co-locate
    from .driver_queries_analytics import _spread

    e = _spread(load_events(spark, sf_dir).select("event_id"), spark)
    uas = F.array(*[F.lit(s) for s in UA_STRINGS])
    d = e.withColumn("ua_idx", (F.col("event_id") % 8).cast("int")).withColumn(
        "user_agent", F.element_at(uas, F.col("ua_idx") + 1)
    )
    out = with_device_columns(d, ua_parser_families=True)
    return out.groupBy(
        "ua_idx", "device_is_bot", "device_client_name"
    ).agg(F.count("*").alias("n"))


def _ua_family_values() -> str:
    rows = []
    for i, (g, fam) in enumerate(zip(UA_GOLDEN, UA_GOLDEN_FAMILIES)):
        rows.append(
            "(" + ", ".join([str(i), _sql_lit(g[0]), _sql_lit(fam)]) + ")"
        )
    return ",\n  ".join(rows)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    return "'" + str(v).replace("'", "''") + "'"


def _ua_values() -> str:
    rows = []
    for i, g in enumerate(UA_GOLDEN):
        rows.append("(" + ", ".join([str(i)] + [_sql_lit(v) for v in g]) + ")")
    return ",\n  ".join(rows)


SQL_UA_PARSE = f"""
WITH m(ua_idx, device_is_bot, device_client_name, device_client_version,
       device_os_name, device_os_version, device_device_type,
       device_is_mobile, device_device_brand) AS (
  VALUES
  {_ua_values()}
)
SELECT CAST(m.ua_idx AS INTEGER) AS ua_idx,
       m.device_is_bot, m.device_client_name, m.device_client_version,
       m.device_os_name, m.device_os_version, m.device_device_type,
       m.device_is_mobile, m.device_device_brand,
       count(*) AS n
FROM events e JOIN m ON e.event_id % 8 = m.ua_idx
GROUP BY ALL
"""

SQL_UA_PARSE_FAMILIES = f"""
WITH m(ua_idx, device_is_bot, device_client_name) AS (
  VALUES
  {_ua_family_values()}
)
SELECT CAST(m.ua_idx AS INTEGER) AS ua_idx,
       m.device_is_bot, m.device_client_name,
       count(*) AS n
FROM events e JOIN m ON e.event_id % 8 = m.ua_idx
GROUP BY ALL
"""

# --------------------------------------------------------------------------
# W8-W11: multi-touch touchpoint accumulation per visitor
# --------------------------------------------------------------------------

TP_SOURCES = ["google", "(direct)", "facebook", "newsletter", "(direct)"]


def q_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select("user_id", "event_id", "ts_ms")
    # r14 (same as traffic_attribution's r13 fix): the window's
    # implicit exchange is tiny by BYTES, so AQE coalesced it to one
    # partition and the compute-dense touchpoint windows + array
    # builds ran single-threaded (stage trace: 1 task, ~2.3 s of the
    # query's 2.5). An explicit repartition on the window key is still
    # exactly ONE exchange — it satisfies the window clustering — but
    # user-specified partitioning is exempt from AQE coalescing.
    # Gated: an already-parallel input skips it.
    e = spread_if_narrow(e, F.col("user_id"))
    src = F.element_at(
        F.array(*[F.lit(s) for s in TP_SOURCES]),
        (F.col("event_id") % len(TP_SOURCES)).cast("int") + 1,
    )
    d = e.withColumn("source", src)
    out = with_touchpoints(
        d,
        visitor_col="user_id",
        ts_col="ts_ms",
        source_col="source",
        tiebreak_cols=("event_id",),
    )
    # array_join to scalars: the driver's oracle canonicalizer cannot hash
    # numpy arrays (same failure class as user_event_arrays in r1).
    # (r13 audit: the `.distinct()` already reuses the window's
    # user_id hash partitioning — a subset of the distinct keys — so
    # it costs no second exchange; left as is.)
    return out.select(
        "user_id",
        F.array_join("touchpoints", ",").alias("touchpoints"),
        F.array_join("touchpoints_wo_direct", ",").alias(
            "touchpoints_wo_direct"
        ),
        "first_touchpoint",
        "last_touchpoint",
    ).distinct()


_TP_ARR = "[" + ", ".join(f"'{s}'" for s in TP_SOURCES) + "]"

SQL_TOUCHPOINTS = f"""
WITH src AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         ({_TP_ARR})[(event_id % {len(TP_SOURCES)}) + 1] AS source
  FROM events
),
agg AS (
  SELECT user_id, list(source ORDER BY ts_ms, event_id) AS touchpoints
  FROM src GROUP BY user_id
)
SELECT user_id,
       array_to_string(touchpoints, ',') AS touchpoints,
       array_to_string(list_filter(touchpoints, x -> x != '(direct)'), ',')
         AS touchpoints_wo_direct,
       touchpoints[1] AS first_touchpoint,
       coalesce(list_filter(touchpoints, x -> x != '(direct)')[-1], '(direct)')
         AS last_touchpoint
FROM agg
"""

# --------------------------------------------------------------------------
# Multi-touch attribution models over the touchpoint sequences (the
# analyses the reference's W8-W11 arrays exist to feed).
# --------------------------------------------------------------------------

_ATTR_HALFLIFE_MS = 86_400_000  # 1 day
_ATTR_DECAY_CAP = 20


def q_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/attribution.attribution_credits: distribute each
    converting visitor's purchase value over their ordered touchpoints
    under six attribution models (first/last/last-non-direct/linear/
    U-shaped/time-decay), rolled up per (source, cohort). Time-decay
    weights are exact BIGINTs (integer div + shiftleft), per-touch
    credits DECIMAL(38,6) — the sums here are order-independent."""
    from ..operators.attribution import attribution_credits

    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", "ts_ms", "event_type", "value"
    )
    # r14: same AQE-coalescing fix as touchpoints — the per-visitor
    # window work ran on the 2 partitions the tiny-bytes exchange
    # coalesced to; an explicit repartition on the window key keeps
    # the single exchange but full parallelism (gated).
    e = spread_if_narrow(e, F.col("user_id"))
    src = F.element_at(
        F.array(*[F.lit(s) for s in TP_SOURCES]),
        (F.col("event_id") % len(TP_SOURCES)).cast("int") + 1,
    )
    touches = e.select(
        "user_id", "event_id", "ts_ms", src.alias("source")
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("conv_value")
        )
    )
    credits = attribution_credits(
        touches,
        conv,
        visitor_col="user_id",
        ts_col="ts_ms",
        source_col="source",
        value_col="conv_value",
        tiebreak_cols=("event_id",),
        halflife_ms=_ATTR_HALFLIFE_MS,
        decay_cap=_ATTR_DECAY_CAP,
    )
    dbl = lambda c: F.sum(c).cast("double")  # noqa: E731
    return (
        credits.withColumn("cohort", F.col("user_id") % 7)
        .groupBy("source", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            dbl("credit_first").alias("credit_first"),
            dbl("credit_last").alias("credit_last"),
            dbl("credit_last_nd").alias("credit_last_nd"),
            dbl("credit_linear").alias("credit_linear"),
            dbl("credit_position").alias("credit_position"),
            dbl("credit_decay").alias("credit_decay"),
        )
    )


SQL_ATTRIBUTION_MODELS = f"""
WITH src AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         ({_TP_ARR})[(event_id % {len(TP_SOURCES)}) + 1] AS source,
         event_type, value
  FROM events
),
conv AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS conv_value
  FROM src WHERE event_type = 'purchase' GROUP BY user_id
),
t1 AS (
  SELECT s.user_id, s.ts_ms, s.source, c.conv_value,
         row_number() OVER (PARTITION BY s.user_id
                            ORDER BY s.ts_ms, s.event_id) AS touch_idx,
         count(*) OVER (PARTITION BY s.user_id) AS n_touches,
         least((max(s.ts_ms) OVER (PARTITION BY s.user_id) - s.ts_ms)
                 // {_ATTR_HALFLIFE_MS},
               {_ATTR_DECAY_CAP}) AS k
  FROM src s JOIN conv c USING (user_id)
),
t2 AS (
  SELECT *,
         CAST(1 AS BIGINT) << ({_ATTR_DECAY_CAP} - k) AS w,
         sum(CAST(1 AS BIGINT) << ({_ATTR_DECAY_CAP} - k))
           OVER (PARTITION BY user_id) AS w_total,
         max(CASE WHEN source != '(direct)' THEN touch_idx END)
           OVER (PARTITION BY user_id) AS last_nd_idx
  FROM t1
),
cr AS (
  SELECT user_id, source,
    CAST(round(CASE WHEN touch_idx = 1 THEN conv_value ELSE 0.0 END, 6)
         AS DECIMAL(38,6)) AS credit_first,
    CAST(round(CASE WHEN touch_idx = n_touches THEN conv_value
               ELSE 0.0 END, 6) AS DECIMAL(38,6)) AS credit_last,
    CAST(round(CASE WHEN coalesce(last_nd_idx, n_touches) = touch_idx
               THEN conv_value ELSE 0.0 END, 6)
         AS DECIMAL(38,6)) AS credit_last_nd,
    CAST(round(conv_value / n_touches, 6) AS DECIMAL(38,6))
      AS credit_linear,
    CAST(round(CASE WHEN n_touches = 1 THEN conv_value
                    WHEN n_touches = 2 THEN conv_value * 0.5
                    WHEN touch_idx = 1 OR touch_idx = n_touches
                      THEN conv_value * 0.4
                    ELSE conv_value * 0.2 / (n_touches - 2) END, 6)
         AS DECIMAL(38,6)) AS credit_position,
    CAST(round(conv_value * w / w_total, 6) AS DECIMAL(38,6))
      AS credit_decay
  FROM t2
)
SELECT source, user_id % 7 AS cohort,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(credit_first) AS DOUBLE) AS credit_first,
       CAST(sum(credit_last) AS DOUBLE) AS credit_last,
       CAST(sum(credit_last_nd) AS DOUBLE) AS credit_last_nd,
       CAST(sum(credit_linear) AS DOUBLE) AS credit_linear,
       CAST(sum(credit_position) AS DOUBLE) AS credit_position,
       CAST(sum(credit_decay) AS DOUBLE) AS credit_decay
FROM cr GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# §2.8: wide→long product unpivot (explode-based, join-free)
# --------------------------------------------------------------------------


def q_unpivot_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select("event_id", "user_id")
    m = lambda n: F.col("event_id") % n  # noqa: E731
    d = (
        e.withColumn(
            "body_pr0id",
            F.when(m(7) != 0, F.concat(F.lit("sku-"), m(50).cast("string"))),
        )
        .withColumn("body_pr0qt", F.when(m(7) != 0, (m(5) + 1).cast("string")))
        .withColumn("body_pr1id", F.when(m(3) == 0, F.lit("sku-extra")))
        .withColumn("body_pr1qt", F.when(m(3) == 0, F.lit("1")))
    )
    out = unpivot_products(d, n_slots=2, params=["id", "qt"], keep_index=True)
    return out.select("event_id", "user_id", "pr_index", "prid", "prqt")


SQL_UNPIVOT_PRODUCTS = """
WITH base AS (SELECT event_id, user_id FROM events),
s0 AS (
  SELECT event_id, user_id, 0 AS pr_index,
         'sku-' || CAST(event_id % 50 AS VARCHAR) AS prid,
         CAST(event_id % 5 + 1 AS VARCHAR) AS prqt
  FROM base WHERE event_id % 7 != 0
),
s1 AS (
  SELECT event_id, user_id, 1 AS pr_index, 'sku-extra' AS prid, '1' AS prqt
  FROM base WHERE event_id % 3 = 0
),
none AS (
  SELECT event_id, user_id, CAST(NULL AS INTEGER) AS pr_index,
         CAST(NULL AS VARCHAR) AS prid, CAST(NULL AS VARCHAR) AS prqt
  FROM base WHERE event_id % 7 = 0 AND event_id % 3 != 0
)
SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM none
"""

# --------------------------------------------------------------------------
# Native session_window sessionization (Spark's built-in gap-session
# operator — the idiomatic alternative to the W1-W5 window chain; also
# the streaming-mode operator, see streaming/).
# --------------------------------------------------------------------------

_GAP_MS = 30 * 60 * 1000


def q_session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select("user_id", "ts_ms")
    d = e.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    return (
        d.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            (F.unix_millis(F.col("w.end")) - F.lit(_GAP_MS)).alias(
                "session_end_ms"
            ),
            "n_events",
        )
    )


SQL_SESSION_WINDOW_ROLLUP = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events
),
lagged AS (
  SELECT e.*, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
           AS last_event
  FROM e
),
flagged AS (
  SELECT *, CASE WHEN last_event IS NULL OR ts_ms - last_event >= {_GAP_MS}
                 THEN 1 ELSE 0 END AS is_new_session
  FROM lagged
),
numbered AS (
  SELECT *, sum(is_new_session) OVER (
      PARTITION BY user_id ORDER BY ts_ms, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
       count(*) AS n_events
FROM numbered GROUP BY user_id, sid
"""

# --------------------------------------------------------------------------
# F2-F10: traffic-source attribution truth table over 8 (dl, dr)
# scenarios; oracle = hand-verified golden values (cross-checked by
# tests/test_traffic.py against the reference truth tables).
# --------------------------------------------------------------------------

DL_URLS = [
    "https://shop.example.com/products/shoes?utm_source=newsletter"
    "&utm_medium=email&utm_campaign=summer&utm_term=boots&utm_content=ad1",
    "https://shop.example.com/landing?gclid=abc123",
    "https://shop.example.com/home",
    "https://shop.example.com/article",
    "https://shop.example.com/blog/post",
    "https://shop.example.com/app",
    "https://shop.example.com/promo?fbclid=xyz789",
    "https://shop.example.com/cart",
]

DR_URLS = [
    None,
    None,
    None,
    "https://www.google.com/search?q=shoes",
    "https://news.example.org/daily/story",
    "android-app://com.example.shop",
    "https://l.facebook.com/l.php?u=x",
    "https://googleadservices.com/pagead/aclk",
]

# Expected values on session-start rows, per scenario (hand-derived from
# the reference truth tables, main.py:466-716).
GOLDEN_SOURCE = [
    "newsletter", "google", "(direct)", "google",
    "example", "com.example.shop", "facebook", "google",
]
GOLDEN_MEDIUM = [
    "email", "paid", "(none)", "organic",
    "referral", "referral", "paid", "referral",
]
GOLDEN_CAMPAIGN = ["summer"] + ["(not set)"] * 7
GOLDEN_KEYWORD = [
    "boots", "(not set)", "(not set)", "(not provided)",
    "(not set)", "(not set)", "(not set)", "(not set)",
]
GOLDEN_CONTENT = ["ad1"] + ["(not set)"] * 7
GOLDEN_LANDING = [
    "/products/shoes", "/landing", "/home", "/article",
    "/blog/post", "/app", "/promo", "/cart",
]
GOLDEN_PAGE_L1 = [
    "/products", "/landing", "/home", "/article",
    "/blog", "/app", "/promo", "/cart",
]
GOLDEN_PAGE_L2 = ["/shoes", "", "", "", "/post", "", "", ""]


def q_traffic_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: the giant per-row when-chain/parse_url projection runs AFTER
    # the session window. With the implicit ENSURE_REQUIREMENTS
    # exchange, AQE coalesces the tiny-by-bytes shuffle to ~1 partition
    # and the compute-dense projection serializes. An explicit
    # repartition on the same key is still exactly ONE exchange (it
    # satisfies the window's clustering), but user-specified
    # partitioning is exempt from AQE coalescing — the projection keeps
    # full parallelism. Identical rows either way (measured 2.0→0.8 s).
    p = spark.sparkContext.defaultParallelism
    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_ms"
    ).repartition(p, F.col("user_id"))
    flagged = with_session_flags(
        e, visitor_col="user_id", ts_col="ts_ms", tiebreak_cols=("event_id",)
    )
    scen = (F.col("event_id") % 8).cast("int")
    dls = F.array(*[F.lit(u) for u in DL_URLS])
    drs = F.array(*[F.lit(u).cast("string") for u in DR_URLS])
    d = (
        flagged.withColumn("scen", scen)
        .withColumn("body_dl", F.element_at(dls, F.col("scen") + 1))
        .withColumn("body_dr", F.element_at(drs, F.col("scen") + 1))
    )
    d = d.withColumn("medium", traffic_medium("is_new_session"))
    levels = page_path_levels("body_dl")
    return d.select(
        "event_id",
        "scen",
        "is_new_session",
        traffic_source("is_new_session").alias("source"),
        F.col("medium"),
        traffic_campaign("is_new_session").alias("campaign"),
        traffic_keyword("is_new_session", medium="medium").alias("keyword"),
        traffic_ad_content("is_new_session").alias("ad_content"),
        is_true_direct(traffic_source("is_new_session")).alias("true_direct"),
        landing_page("is_new_session", "body_dl").alias("landing"),
        F.get(levels, 0).alias("page_level_1"),
        F.get(levels, 1).alias("page_level_2"),
    )


def _arr(vals: list[str]) -> str:
    return "[" + ", ".join("'" + v + "'" for v in vals) + "]"


SQL_TRAFFIC_ATTRIBUTION = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
),
lagged AS (
  SELECT e.*, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
           AS last_event
  FROM e
),
flagged AS (
  SELECT *, CASE WHEN last_event IS NULL OR ts_ms - last_event >= {_GAP_MS}
                 THEN 1 ELSE 0 END AS is_new_session
  FROM lagged
),
t AS (
  SELECT event_id, CAST(event_id % 8 AS INTEGER) AS scen, is_new_session
  FROM flagged
)
SELECT event_id, scen, is_new_session,
  CASE WHEN is_new_session = 1 THEN ({_arr(GOLDEN_SOURCE)})[scen + 1]
       ELSE '(not set)' END AS source,
  CASE WHEN is_new_session = 1 THEN ({_arr(GOLDEN_MEDIUM)})[scen + 1]
       ELSE '(none)' END AS medium,
  CASE WHEN is_new_session = 1 THEN ({_arr(GOLDEN_CAMPAIGN)})[scen + 1]
       ELSE '(not set)' END AS campaign,
  CASE WHEN is_new_session = 1 THEN ({_arr(GOLDEN_KEYWORD)})[scen + 1]
       ELSE '(not set)' END AS keyword,
  CASE WHEN is_new_session = 1 THEN ({_arr(GOLDEN_CONTENT)})[scen + 1]
       ELSE '(not set)' END AS ad_content,
  CASE WHEN is_new_session = 1 AND scen = 2 THEN 'True' END AS true_direct,
  CASE WHEN is_new_session = 1 THEN ({_arr(GOLDEN_LANDING)})[scen + 1]
       END AS landing,
  ({_arr(GOLDEN_PAGE_L1)})[scen + 1] AS page_level_1,
  ({_arr(GOLDEN_PAGE_L2)})[scen + 1] AS page_level_2
FROM t
"""

# --------------------------------------------------------------------------
# As-of join: each purchase gets the latest at-or-before signup event
# of the same user. Oracle = DuckDB's native ASOF LEFT JOIN.
# --------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_ms"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms"
    )
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts_ms")
        .agg(F.max("event_id").alias("signup_event"))
    )
    out = asof_join(
        purchases,
        signups,
        key_cols=["user_id"],
        left_ts="ts_ms",
        right_ts="ts_ms",
        right_value_cols=["signup_event"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.col("_asof.signup_event").alias("signup_event"),
    )


SQL_ASOF_JOIN = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
),
purchases AS (
  SELECT event_id, user_id, ts_ms FROM e WHERE event_type = 'purchase'
),
signups AS (
  SELECT user_id, ts_ms, max(event_id) AS signup_event
  FROM e WHERE event_type = 'signup' GROUP BY user_id, ts_ms
)
SELECT p.event_id, p.user_id, p.ts_ms, s.signup_event
FROM purchases p
ASOF LEFT JOIN signups s
  ON p.user_id = s.user_id AND p.ts_ms >= s.ts_ms
"""


# --------------------------------------------------------------------------
# Structured Streaming sessionization, end-to-end: events → JSONL file
# source → session_window + watermark → checkpointed parquet sink → read
# back. A far-future sentinel advances the watermark so every real
# session flushes; the closed sessions must equal the batch gap-session
# rollup, so the oracle is the same SQL as session_window_rollup.
# --------------------------------------------------------------------------

_SENTINEL_USER = -1


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..streaming.sessions import (
        read_events_stream,
        stream_sessionize,
        write_stream,
    )

    base = tempfile.mkdtemp(prefix="ga_stream_q_")
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    e = load_events(spark, sf_dir).select("event_id", "user_id", "ts_ms")
    e.write.mode("overwrite").json(in_dir)
    q = write_stream(
        stream_sessionize(
            read_events_stream(spark, in_dir), watermark_delay="1 minutes"
        ),
        out_dir,
        ckpt,
    )
    q.awaitTermination()

    max_ts = e.agg(F.max("ts_ms")).first()[0]
    spark.createDataFrame(
        [(10**12, _SENTINEL_USER, max_ts + 10 * 86400000)],
        "event_id long, user_id long, ts_ms long",
    ).write.mode("append").json(in_dir)
    q = write_stream(
        stream_sessionize(
            read_events_stream(spark, in_dir), watermark_delay="1 minutes"
        ),
        out_dir,
        ckpt,
    )
    q.awaitTermination()

    return spark.read.parquet(out_dir).filter(
        F.col("user_id") != _SENTINEL_USER
    )


# --------------------------------------------------------------------------
# Multimodal: binary payload + mapInPandas decode stub (deterministic
# sha256-derived metadata; operators/multimodal.py).
# --------------------------------------------------------------------------


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    return decode_image_meta(with_binary_payload(d))


SQL_MULTIMODAL_DECODE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       sha256(text) AS payload_sha256,
       CAST(('0x' || substr(sha256(text), 1, 2)) AS INTEGER) AS width,
       CAST(('0x' || substr(sha256(text), 3, 2)) AS INTEGER) AS height
FROM documents
"""


def q_incremental_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB attribution design, oracle-proven: split events at the
    median day into history/today, collapse each half to O(visitors)
    touchpoint summaries, merge the summaries (full-outer join of state
    rows — the historical hit table is never re-read), and derive
    W8-W11. The oracle recomputes attribution over ALL events in one
    pass, so a green row proves incremental == recompute (the
    reference's design, main.py:1265-1273) on real data.
    """
    from ..operators.attribution import (
        merge_touchpoint_summaries,
        summary_attribution,
        touchpoint_summary,
    )

    e = load_events(spark, sf_dir).select("user_id", "event_id", "ts_ms")
    src = F.element_at(
        F.array(*[F.lit(s) for s in TP_SOURCES]),
        (F.col("event_id") % len(TP_SOURCES)).cast("int") + 1,
    )
    d = e.withColumn("source", src).withColumn(
        "day", F.expr("ts_ms div 86400000")
    )
    bounds = d.agg(
        F.expr("(min(day) + max(day) + 1) div 2").alias("_split")
    )
    d = d.join(F.broadcast(bounds))
    hist = d.filter(F.col("day") < F.col("_split"))
    today = d.filter(F.col("day") >= F.col("_split"))
    args = dict(
        visitor_col="user_id", ts_col="ts_ms", source_col="source",
        tiebreak_cols=("event_id",),
    )
    merged = merge_touchpoint_summaries(
        touchpoint_summary(hist, **args),
        touchpoint_summary(today, **args),
        visitor_col="user_id",
    )
    out = summary_attribution(merged)
    return out.select(
        "user_id",
        F.array_join("touchpoints", ",").alias("touchpoints"),
        F.array_join("touchpoints_wo_direct", ",").alias(
            "touchpoints_wo_direct"
        ),
        "first_touchpoint",
        "last_touchpoint",
        "max_ts",
    )


SQL_INCREMENTAL_ATTRIBUTION = f"""
WITH src AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         ({_TP_ARR})[(event_id % {len(TP_SOURCES)}) + 1] AS source
  FROM events
),
agg AS (
  SELECT user_id,
         list(source ORDER BY ts_ms, event_id) AS touchpoints,
         max(ts_ms) AS max_ts
  FROM src GROUP BY user_id
)
SELECT user_id,
       array_to_string(touchpoints, ',') AS touchpoints,
       array_to_string(list_filter(touchpoints, x -> x != '(direct)'), ',')
         AS touchpoints_wo_direct,
       touchpoints[1] AS first_touchpoint,
       coalesce(list_filter(touchpoints, x -> x != '(direct)')[-1],
                '(direct)') AS last_touchpoint,
       max_ts
FROM agg
"""


# --------------------------------------------------------------------------
# F8-F10/F13: URL decomposition (page-path levels, host, query params)
# as ONE driver query with a full oracle. The testdata has no URL
# column, so deterministic catalog URLs are synthesized from `part`
# (p_type's three words -> three path segments) and the real
# functions/url.py expressions run on the Spark side; the oracle
# re-parses the identical URLs with DuckDB string functions.
# --------------------------------------------------------------------------


def q_page_path_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 page_path_levels + F10 host + F13 query-param extraction
    (functions/url.py; reference main.py:329-376, 479-497) rolled up by
    path prefix. Pure projections + one hash aggregate — map-side
    partials, no skew, scale-trivial."""
    p = load_table(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://shop.example.com/"),
        F.regexp_replace(F.lower(F.col("p_type")), " ", "/"),
        F.lit("/p"), F.col("p_partkey").cast("string"),
        F.lit("?brand="), F.regexp_replace(F.col("p_brand"), "#", "-"),
        F.lit("&size="), F.col("p_size").cast("string"),
    )
    d = p.select(F.col("p_partkey").alias("part_key"), url.alias("url"))
    lv = page_path_levels("url")
    rows = d.select(
        "part_key",
        url_host("url").alias("host"),
        F.get(lv, 0).alias("level1"),
        F.get(lv, 1).alias("level2"),
        F.get(lv, 2).alias("level3"),
        F.get(lv, 3).alias("level4"),
        url_query_param("url", "brand").alias("brand"),
        url_query_param("url", "size").cast("int").alias("size"),
    )
    return rows.groupBy("level1", "level2", "level3").agg(
        F.count("*").alias("n_parts"),
        F.count_distinct("level4").alias("n_pages"),
        F.count_distinct("brand").alias("n_brands"),
        F.sum("size").cast("long").alias("sum_size"),
        F.min("host").alias("host"),
    )


SQL_PAGE_PATH_LEVELS = """
WITH u AS (
  SELECT p_partkey,
         'https://shop.example.com/' || replace(lower(p_type), ' ', '/')
           || '/p' || CAST(p_partkey AS VARCHAR)
           || '?brand=' || replace(p_brand, '#', '-')
           || '&size=' || CAST(p_size AS VARCHAR) AS url
  FROM part
),
parsed AS (
  SELECT p_partkey,
         split_part(url, '/', 3) AS host,
         split_part(url, '?', 1) AS pathful,
         split_part(url, '?', 2) AS qs
  FROM u
),
lv AS (
  -- pad missing segments with '' (page_path_levels semantics), not '/'
  SELECT p_partkey, host,
         CASE WHEN split_part(pathful, '/', 4) <> ''
              THEN '/' || split_part(pathful, '/', 4) ELSE '' END AS level1,
         CASE WHEN split_part(pathful, '/', 5) <> ''
              THEN '/' || split_part(pathful, '/', 5) ELSE '' END AS level2,
         CASE WHEN split_part(pathful, '/', 6) <> ''
              THEN '/' || split_part(pathful, '/', 6) ELSE '' END AS level3,
         CASE WHEN split_part(pathful, '/', 7) <> ''
              THEN '/' || split_part(pathful, '/', 7) ELSE '' END AS level4,
         split_part(split_part(qs, 'brand=', 2), '&', 1) AS brand,
         CAST(split_part(qs, 'size=', 2) AS INTEGER) AS size
  FROM parsed
)
SELECT level1, level2, level3,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT level4) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT brand) AS BIGINT) AS n_brands,
       CAST(sum(size) AS BIGINT) AS sum_size,
       min(host) AS host
FROM lv GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# L1-L4: the collector-envelope decode path (base64 JSON envelope ->
# anonymized ip -> url-decoded GA querystring body -> flat body_*
# columns) end-to-end with a full oracle. The envelope is synthesized
# deterministically from events, round-tripped through the REAL
# sources/ga.decode_envelope transform; the oracle computes the
# expected flat rows directly.
# --------------------------------------------------------------------------

_ENV_BODY_FIELDS = [
    "body_v", "body_t", "body_cid", "body_el", "body_ev", "body_dp",
]


def q_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1-L4 (sources/ga.py decode_envelope; reference
    functions/transformation/main.py:11-75): base64(JSON envelope) with
    a url-encoded Measurement-Protocol body ('+' for space, %2F
    escapes) decoded back to flat hit columns. Map-side only — the
    decode never shuffles."""
    from ..sources.ga import decode_envelope

    # The per-row work (to_json → base64 → from_json → str_to_map with
    # url_decode) dominates; the testdata scan is one unsplittable row
    # group, so without a spread it all runs on one core (guide §2.5
    # input skew: repartition right after an unsplittable read; gated
    # on the scan being narrow — ADVICE r13). The exchange carries
    # only the 4 narrow input columns — the envelope synthesis/decode
    # expansion happens after it.
    e = spread_if_narrow(load_events(spark, sf_dir), F.col("event_id"))
    body = F.concat(
        F.lit("v=1&t="), F.col("event_type"),
        F.lit("&cid=u"), F.col("user_id").cast("string"),
        F.lit("&el=hello+world"),
        F.lit("&ev="), (F.col("user_id") % 97).cast("string"),
        F.lit("&dp=%2Fhome%2Fpage"),
    )
    env = F.to_json(F.struct(
        F.lit("apig").alias("system_source"),
        F.lit("1.0").alias("system_version"),
        F.concat(F.lit("m-"), F.col("event_id").cast("string")).alias(
            "message_id"
        ),
        F.concat(F.lit("t-"), F.col("event_id").cast("string")).alias(
            "trace_id"
        ),
        F.col("ts_ms").cast("string").alias("received_at_apig"),
        _dotted_quad(_ip_int(4294967296)).alias("ip"),
        F.lit("Mozilla/5.0").alias("user_agent"),
        body.alias("body"),
    ))
    raw = e.select(F.base64(env.cast("binary")).alias("value"))
    return decode_envelope(raw, body_fields=_ENV_BODY_FIELDS).select(
        "trace_id", "message_id", "ip", "received_at_apig",
        "body_t", "body_cid", "body_el", "body_ev", "body_dp",
    )


SQL_ENVELOPE_DECODE = f"""
WITH h AS (
  SELECT event_id, event_type, user_id, epoch_ms(ts) AS ts_ms,
         (event_id * {_MIX}) % 4294967296 AS ip_int
  FROM events
)
SELECT 't-' || CAST(event_id AS VARCHAR) AS trace_id,
       'm-' || CAST(event_id AS VARCHAR) AS message_id,
       regexp_replace({_SQL_OCTETS}, '\\.[0-9]+$', '.0') AS ip,
       CAST(ts_ms AS VARCHAR) AS received_at_apig,
       event_type AS body_t,
       'u' || CAST(user_id AS VARCHAR) AS body_cid,
       'hello world' AS body_el,
       CAST(user_id % 97 AS VARCHAR) AS body_ev,
       '/home/page' AS body_dp
FROM h
"""


# --------------------------------------------------------------------------
# F11 + F12: ecommerce action-type enum + typed product revenue with a
# full oracle. Product-action params are synthesized deterministically
# from event_id (integer qty/price strings -> every revenue term is an
# exact dyadic double, so the SUM is order-independent).
# --------------------------------------------------------------------------

_PA_ACTIONS = [
    "click", "detail", "add", "checkout", "purchase", "refund",
    "checkout_option", "view",
]


def q_action_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 action_type (functions/ga.py; reference main.py:793-809) and
    F12 product_revenue (main.py:811-817) end-to-end: map the GA
    product-action string to its enum code, type the qty/price strings,
    and roll purchase revenue up per action code. 'view' exercises the
    unknown->'0' branch; non-purchase actions keep NULL revenue."""
    from ..functions.ga import action_type, product_revenue

    e = load_events(spark, sf_dir).select("event_id")
    pa = F.element_at(
        F.array(*[F.lit(a) for a in _PA_ACTIONS]),
        (F.col("event_id") % 8 + 1).cast("int"),
    )
    d = e.select(
        "event_id",
        pa.alias("body_pa"),
        (F.col("event_id") % 5 + 1).cast("string").alias("prqt"),
        (F.col("event_id") % 97).cast("string").alias("prpr"),
    ).withColumn("action_type", action_type("body_pa"))
    return d.groupBy("action_type").agg(
        F.count("*").alias("n"),
        F.sum(product_revenue("action_type", "prqt", "prpr")).alias(
            "revenue"
        ),
    )


_PA_CASE = (
    "CASE ['click','detail','add','checkout','purchase','refund',"
    "'checkout_option','view'][CAST(event_id % 8 AS INTEGER) + 1] "
    "WHEN 'click' THEN '1' WHEN 'detail' THEN '2' WHEN 'add' THEN '3' "
    "WHEN 'checkout' THEN '5' WHEN 'purchase' THEN '6' "
    "WHEN 'refund' THEN '7' WHEN 'checkout_option' THEN '8' "
    "ELSE '0' END"
)

SQL_ACTION_REVENUE = f"""
WITH d AS (
  SELECT {_PA_CASE} AS action_type,
         event_id % 5 + 1 AS qty,
         event_id % 97 AS price
  FROM events
)
SELECT action_type, CAST(count(*) AS BIGINT) AS n,
       sum(CASE WHEN action_type = '6'
                THEN CAST(qty AS DOUBLE) * CAST(price AS DOUBLE) END)
         AS revenue
FROM d GROUP BY action_type
"""


_SHAP_CHANNELS = ["(direct)", "facebook", "google", "newsletter"]


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution
    (operators/attribution.py:shapley_attribution): each user's
    coalition is the set of channels their events touched (the same
    deterministic event_id->source mapping as attribution_models /
    touchpoints), conversion = any purchase; the exact Shapley sum
    runs over the 16-coalition lattice with integer factorial weights.
    Completes the attribution suite: 6 heuristic models + Markov
    removal effect + the coalition-game model."""
    from ..operators.attribution import shapley_attribution

    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type"
    )
    src = F.element_at(
        F.array(*[F.lit(s) for s in TP_SOURCES]),
        (F.col("event_id") % len(TP_SOURCES)).cast("int") + 1,
    )
    journeys = e.select(
        "user_id",
        src.alias("channel"),
        (F.col("event_type") == "purchase").cast("int").alias("conv"),
    )
    return shapley_attribution(
        journeys, "channel", "user_id", "conv", _SHAP_CHANNELS
    )


SQL_SHAPLEY_ATTRIBUTION = f"""
WITH src AS (
  SELECT user_id, ({_TP_ARR})[(event_id % {len(TP_SOURCES)}) + 1]
           AS source,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c
  FROM events
),
ch(ci, channel) AS (
  VALUES (0, '(direct)'), (1, 'facebook'), (2, 'google'),
         (3, 'newsletter')
),
tagged AS (
  SELECT s.user_id, ch.ci, s.c
  FROM src s JOIN ch ON s.source = ch.channel
),
pu AS (
  SELECT user_id, bit_or(1 << ci) AS mask, max(c) AS conv
  FROM tagged GROUP BY 1
),
coal AS (
  SELECT mask, count(*) AS n_j, sum(conv) AS n_c FROM pu GROUP BY 1
),
lat AS (SELECT s FROM generate_series(0, 15) t(s)),
v AS (
  SELECT s, coalesce(CAST(n_c AS DOUBLE) / CAST(n_j AS DOUBLE), 0.0)
           AS v
  FROM lat LEFT JOIN coal ON lat.s = coal.mask
),
pairs AS (
  SELECT ch.ci, ch.channel, v.s, v.v AS v_s,
         v.s + (1 << ch.ci) AS s_with,
         ((v.s >> 0) & 1) + ((v.s >> 1) & 1) + ((v.s >> 2) & 1)
           + ((v.s >> 3) & 1) AS pc
  FROM ch CROSS JOIN v
  WHERE ((v.s >> ch.ci) & 1) = 0
),
contrib AS (
  SELECT p.channel, p.ci,
         (v2.v - p.v_s) * CAST([6, 2, 2, 6][p.pc + 1] AS DOUBLE)
           AS term
  FROM pairs p JOIN v v2 ON p.s_with = v2.s
),
phi AS (
  SELECT channel, ci, round(sum(term) / 24.0, 6) AS shap
  FROM contrib GROUP BY 1, 2
),
touched AS (
  SELECT ci, sum(n_j) AS n_journeys
  FROM coal CROSS JOIN ch
  WHERE ((mask >> ci) & 1) = 1 GROUP BY 1
)
SELECT p.channel,
       CAST(coalesce(t.n_journeys, 0) AS BIGINT) AS n_journeys,
       p.shap
FROM phi p LEFT JOIN touched t USING (ci)
"""


QUERIES_ENRICH = {
    "shapley_attribution": q_shapley_attribution,
    "ua_parse_families": q_ua_parse_families,
    "action_revenue": q_action_revenue,
    "incremental_attribution": q_incremental_attribution,
    "multimodal_decode": q_multimodal_decode,
    "streaming_sessions": q_streaming_sessions,
    "asof_join": q_asof_join,
    "anonymize_ip": q_anonymize_ip,
    "geo_enrich": q_geo_enrich,
    "ua_parse": q_ua_parse,
    "touchpoints": q_touchpoints,
    "attribution_models": q_attribution_models,
    "unpivot_products": q_unpivot_products,
    "session_window_rollup": q_session_window_rollup,
    "traffic_attribution": q_traffic_attribution,
    "page_path_levels": q_page_path_levels,
    "envelope_decode": q_envelope_decode,
}

ORACLES_ENRICH = {
    "action_revenue": SQL_ACTION_REVENUE,
    "incremental_attribution": SQL_INCREMENTAL_ATTRIBUTION,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "streaming_sessions": SQL_SESSION_WINDOW_ROLLUP,
    "asof_join": SQL_ASOF_JOIN,
    "anonymize_ip": SQL_ANONYMIZE_IP,
    "geo_enrich": SQL_GEO_ENRICH,
    "ua_parse": SQL_UA_PARSE,
    "ua_parse_families": SQL_UA_PARSE_FAMILIES,
    "touchpoints": SQL_TOUCHPOINTS,
    "attribution_models": SQL_ATTRIBUTION_MODELS,
    "shapley_attribution": SQL_SHAPLEY_ATTRIBUTION,
    "unpivot_products": SQL_UNPIVOT_PRODUCTS,
    "session_window_rollup": SQL_SESSION_WINDOW_ROLLUP,
    "traffic_attribution": SQL_TRAFFIC_ATTRIBUTION,
    "page_path_levels": SQL_PAGE_PATH_LEVELS,
    "envelope_decode": SQL_ENVELOPE_DECODE,
}
