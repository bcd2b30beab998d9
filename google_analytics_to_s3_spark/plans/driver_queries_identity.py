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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.url import canonical_url
from ..sources.testdata import (
    load_events, load_parallel, load_table, spread_if_narrow,
)

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
    # canonical_url is a large parse_url + higher-order-function
    # expression per row; the testdata scan is one unsplittable row
    # group, so spread the 2-column event rows across cores before the
    # URL synthesis + parse (guide §2.5 input skew; gated on the scan
    # actually being narrow — ADVICE r13). The groupBy exchange after
    # it is unchanged.
    e = spread_if_narrow(
        load_events(spark, sf_dir).select("event_id", "ts_ms"),
        F.col("event_id"),
    )
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

# Device node ids must sit strictly above every possible user_id so that
# id < _DEV_BASE cleanly separates login nodes from device nodes; the
# shipped testdata reaches user_id 1499 at sf0.1 and grows with SF, so
# the bases are set far above any realistic id space (and
# q_identity_stitching asserts the invariant at runtime).
_DEV_BASE = 10_000_000     # device node ids: base + user_id*3 + event_id%3
_KIOSK_BASE = 100_000_000  # shared-device node ids: base + event_id%3


def _stitch_edges(e: DataFrame) -> DataFrame:
    """Bipartite (login, device) edges: every user rotates through 3
    personal devices; ~1% of events happen on one of 3 shared kiosks,
    which is what makes stitching non-trivial (kiosks merge otherwise
    unrelated users into one person-cluster — the over-merge a real
    deployment must then window or threshold away).

    Invariant: user ids must sit strictly below _DEV_BASE (and device
    ids below _KIOSK_BASE) so the id ranges never collide. Enforced
    LAZILY inside the projection (when/otherwise + raise_error), so
    building the plan costs nothing — plan-shape tests and registry
    enumeration never trigger a scan — and any violating row fails
    the job the moment the query actually executes."""
    # combined bound: user_id < _DEV_BASE keeps login/device ranges
    # apart, and _DEV_BASE + uid*3 + 2 < _KIOSK_BASE keeps device ids
    # below the kiosk range; with the shipped bases the tighter bound
    # is _DEV_BASE itself.
    uid_bound = min(_DEV_BASE, (_KIOSK_BASE - _DEV_BASE - 2) // 3)
    checked_uid = F.when(
        F.col("user_id") < F.lit(uid_bound), F.col("user_id")
    ).otherwise(F.raise_error(F.concat(
        F.lit("user_id "), F.col("user_id").cast("string"),
        F.lit(f" overlaps the node-id bases (_DEV_BASE={_DEV_BASE}, "
              f"_KIOSK_BASE={_KIOSK_BASE})"),
    )))
    own = e.select(
        checked_uid.alias("src"),
        (F.lit(_DEV_BASE) + F.col("user_id") * 3 + F.col("event_id") % 3)
        .alias("dst"),
    )
    kiosk = e.filter(F.col("event_id") % 101 == 0).select(
        checked_uid.alias("src"),
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


# --------------------------------------------------------------------------
# Markov removal-effect ("data-driven") attribution
# --------------------------------------------------------------------------

_MK_CHANNELS = ["google", "(direct)", "facebook", "newsletter"]
_MK_TP = ["google", "(direct)", "facebook", "newsletter", "(direct)"]
_MK_ARR = "[" + ", ".join(f"'{s}'" for s in _MK_TP) + "]"


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GA4-style data-driven attribution (operators/markov.py): per-user
    journeys → first-order chain with absorbing conv/null → per-channel
    removal effect and attributed conversions.

    The data-sized work is one visitor window + one hash agg down to a
    ≤30-row transition matrix; the absorption solve runs driver-side on
    an integer grid (bounded pull, k-means-centroid contract) and the
    oracle replays the identical K-round integer iteration as chained
    CTEs, so every grid value must agree exactly. The rounded double
    columns are computed by SPARK expressions over the grid integers
    (the repo's proven round-parity pairing with the DuckDB oracle —
    Python's banker's round is deliberately avoided). Assumes ≥1
    conversion and ≥1 positive removal gain — true by construction of
    the journey synthesis."""
    from ..operators.markov import channel_transitions, removal_effects

    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", "ts_ms", "event_type"
    )
    src = F.element_at(
        F.array(*[F.lit(s) for s in _MK_TP]),
        (F.col("event_id") % len(_MK_TP)).cast("int") + 1,
    )
    conv = F.max((F.col("event_type") == "purchase").cast("int")).over(
        Window.partitionBy("user_id")
    )
    touches = e.select(
        "user_id", "event_id", "ts_ms", src.alias("source"),
        conv.alias("converted"),
    )
    trans_df = channel_transitions(
        touches, "user_id", "ts_ms", "source", "event_id", "converted"
    )
    trans = [(r["s"], r["t"], r["cnt"]) for r in trans_df.collect()]
    n_conv = sum(c for _s, t, c in trans if t == "conv")
    grids = removal_effects(trans, _MK_CHANNELS)
    pb = grids["base"]["p"]
    sum_gain = sum(pb - grids[ch]["p"] for ch in _MK_CHANNELS)
    rows = [
        (ch, grids[ch]["n_in"], pb, grids[ch]["p"])
        for ch in _MK_CHANNELS
    ]
    grid_df = spark.createDataFrame(
        rows,
        "channel string, n_in long, p_conv_grid long, p_removed_grid long",
    )
    gain = (F.col("p_conv_grid") - F.col("p_removed_grid")).cast("double")
    # Degenerate-journey guard: with zero total removal gain (e.g. a
    # corpus where no channel is ever on a converting path) attribution
    # is defined as 0 for every channel rather than a 0/0.
    attributed = (
        F.round(F.lit(float(n_conv)) * gain / F.lit(float(sum_gain)), 6)
        if sum_gain > 0
        else F.lit(0.0)
    )
    return grid_df.select(
        "channel", "n_in", "p_conv_grid", "p_removed_grid",
        F.round(gain / F.col("p_conv_grid").cast("double"), 6).alias(
            "removal_effect"
        ),
        attributed.alias("attributed_conv"),
    )


def _markov_oracle_sql() -> str:
    from ..operators.markov import MARKOV_Q, MARKOV_SQUARINGS

    scen = "['base', " + ", ".join(f"'{c}'" for c in _MK_CHANNELS) + "]"
    # AS MATERIALIZED throughout: DuckDB otherwise re-inlines the whole
    # upstream pipeline into every squaring round (measured: superlinear
    # planning blowup; materialized the chain runs in ~0.1 s)
    its = []
    for k in range(1, MARKOV_SQUARINGS + 1):
        its.append(f"""m{k} AS MATERIALIZED (
  SELECT a.scen, a.s, b.t,
         CAST(sum(a.q * b.q) // {MARKOV_Q} AS BIGINT) AS q
  FROM m{k - 1} a JOIN m{k - 1} b ON a.scen = b.scen AND a.t = b.s
  GROUP BY 1, 2, 3
)""")
    chain = ",\n".join(its)
    return f"""
WITH t0 AS MATERIALIZED (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         ({_MK_ARR})[(event_id % {len(_MK_TP)}) + 1] AS source,
         event_type
  FROM events
),
cu AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM t0 GROUP BY 1
),
seq AS MATERIALIZED (
  SELECT t0.user_id, source,
         lead(source) OVER (PARTITION BY t0.user_id
                            ORDER BY ts_ms, event_id) AS nxt,
         row_number() OVER (PARTITION BY t0.user_id
                            ORDER BY ts_ms, event_id) AS rn,
         converted
  FROM t0 JOIN cu USING (user_id)
),
tm AS MATERIALIZED (
  SELECT s, t, CAST(sum(c) AS BIGINT) AS cnt FROM (
    SELECT 'start' AS s, source AS t, count(*) AS c
    FROM seq WHERE rn = 1 GROUP BY 1, 2
    UNION ALL
    SELECT source, nxt, count(*) FROM seq WHERE nxt IS NOT NULL
    GROUP BY 1, 2
    UNION ALL
    SELECT source,
           CASE WHEN converted = 1 THEN 'conv' ELSE 'null' END, count(*)
    FROM seq WHERE nxt IS NULL GROUP BY 1, 2
  ) GROUP BY 1, 2
),
rt AS (SELECT s, sum(cnt) AS total FROM tm GROUP BY 1),
sc AS MATERIALIZED (SELECT unnest({scen}) AS scen),
m0 AS MATERIALIZED (
  -- row totals keep null/removed mass (leaked probability); dropped
  -- transitions: t = 'null' always, t = scen under removal
  SELECT sc.scen, tm.s, tm.t,
         CAST(tm.cnt * {MARKOV_Q} // rt.total AS BIGINT) AS q
  FROM sc CROSS JOIN tm JOIN rt ON tm.s = rt.s
  WHERE tm.t <> 'null' AND tm.t <> sc.scen
  UNION ALL
  SELECT sc.scen, 'conv', 'conv', {MARKOV_Q} FROM sc
),
{chain},
fin AS (
  SELECT scen, q AS p FROM m{MARKOV_SQUARINGS}
  WHERE s = 'start' AND t = 'conv'
),
base AS (SELECT p AS pb FROM fin WHERE scen = 'base'),
rem AS (
  -- LEFT JOIN + coalesce: a channel whose removal disconnects start
  -- from conv entirely has no surviving grid row (sparse zero)
  SELECT sc.scen AS channel, coalesce(f.p, 0) AS p_removed
  FROM sc LEFT JOIN fin f ON f.scen = sc.scen
  WHERE sc.scen <> 'base'
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_conv FROM tm WHERE t = 'conv'
),
nin AS (
  SELECT t AS channel, CAST(sum(cnt) AS BIGINT) AS n_in
  FROM tm WHERE t NOT IN ('conv', 'null') GROUP BY 1
),
sg AS (
  SELECT CAST(sum(b.pb - r.p_removed) AS BIGINT) AS sum_gain
  FROM rem r CROSS JOIN base b
)
SELECT r.channel, CAST(coalesce(n.n_in, 0) AS BIGINT) AS n_in,
       b.pb AS p_conv_grid,
       r.p_removed AS p_removed_grid,
       round(CAST(b.pb - r.p_removed AS DOUBLE)
             / CAST(b.pb AS DOUBLE), 6) AS removal_effect,
       CASE WHEN s.sum_gain > 0
            THEN round(CAST(t.n_conv AS DOUBLE)
                       * CAST(b.pb - r.p_removed AS DOUBLE)
                       / CAST(s.sum_gain AS DOUBLE), 6)
            ELSE 0.0 END AS attributed_conv
FROM rem r
LEFT JOIN nin n USING (channel)
CROSS JOIN base b CROSS JOIN tot t CROSS JOIN sg s
"""


SQL_MARKOV_ATTRIBUTION = _markov_oracle_sql()


# --------------------------------------------------------------------------
# Positional phrase search (scan-local, zero-shuffle)
# --------------------------------------------------------------------------

_PHRASES = ["table hash", "slow hash batch"]


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase retrieval over the corpus, overlapping matches
    included — the sequence+filter HOF formulation (operators/text.py
    phrase_hits): candidate start positions are enumerated inside the
    scan projection, so the operator is map-side at any corpus size
    (vs the k-way positional-index self-join it replaces)."""
    from ..operators.text import phrase_search

    d = load_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_search(d, _PHRASES)


def _phrase_oracle_sql() -> str:
    legs = []
    for phrase in _PHRASES:
        words = phrase.split()
        k = len(words)
        cond = " AND ".join(
            (f"l[i] = '{w}'" if j == 0 else f"l[i + {j}] = '{w}'")
            for j, w in enumerate(words)
        )
        legs.append(f"""SELECT '{phrase}' AS phrase, doc_id,
       CAST(len(hits) AS BIGINT) AS n_matches,
       CAST(hits[1] AS BIGINT) AS first_pos
FROM (
  SELECT doc_id,
         list_filter(range(1, greatest(len(l) - {k} + 2, 1)),
                     i -> {cond}) AS hits
  FROM d
) WHERE len(hits) > 0""")
    body = "\nUNION ALL\n".join(legs)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
{body}
"""


SQL_PHRASE_SEARCH = _phrase_oracle_sql()


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence interval
# --------------------------------------------------------------------------

def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% percentile-bootstrap CI for mean purchase value via the
    coordination-free Poisson bootstrap (operators/stats.py): 64
    deterministic hash-replicates fan out map-side, BIGINT sums on the
    binary value grid, one double division per replicate."""
    from ..operators.stats import bootstrap_mean_ci

    # The 64× replicate fan-out computes an md5 per (event, rep) —
    # the heavy step. The testdata scan is one unsplittable row group,
    # so spread the (narrow) purchase rows across cores BEFORE the
    # fan-out (guide §2.5 input skew; §8 shuffle the light proxy, then
    # expand; gated on the scan being narrow — ADVICE r13). The
    # exchange carries 2 columns of the filtered rows.
    e = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "value")
    e = spread_if_narrow(e, F.col("event_id"))
    return bootstrap_mean_ci(e, "event_id", "value")


def _bootstrap_oracle_sql() -> str:
    from ..operators.stats import BOOT_VALUE_GRID, POISSON1_CDF_GRID

    cases = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(POISSON1_CDF_GRID)
    )
    return f"""
WITH src AS (
  SELECT event_id,
         CAST(floor(CAST(value AS DOUBLE) * {BOOT_VALUE_GRID}) AS BIGINT)
           AS v
  FROM events WHERE event_type = 'purchase'
),
fan AS (
  SELECT event_id, v, r.rep,
         ('0x' || substr(md5('boot-' || CAST(event_id AS VARCHAR)
                              || '-' || CAST(r.rep AS VARCHAR)), 1, 10)
         )::BIGINT % {1 << 40} AS u
  FROM src CROSS JOIN (SELECT unnest(range(0, 64)) AS rep) r
),
wts AS (SELECT v, rep, CASE {cases} ELSE 6 END AS w FROM fan),
per AS (
  -- HAVING sum(w) > 0 mirrors the operator's all-zero-replicate guard
  SELECT rep,
         CAST(sum(v * w) AS DOUBLE)
           / CAST(sum(w) * {BOOT_VALUE_GRID} AS DOUBLE) AS mean_b
  FROM wts GROUP BY rep HAVING sum(w) > 0
),
pt AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE)
           / CAST(count(*) * {BOOT_VALUE_GRID} AS DOUBLE) AS point_est
  FROM src
),
bs AS (SELECT list(mean_b ORDER BY mean_b) AS ms FROM per)
SELECT n, round(point_est, 6) AS point_est,
       round(ms[greatest(1, least(2, len(ms)))], 6) AS boot_lo,
       round(ms[greatest(1, least(63, len(ms)))], 6) AS boot_hi
FROM pt CROSS JOIN bs
"""


SQL_BOOTSTRAP_CI = _bootstrap_oracle_sql()


# --------------------------------------------------------------------------
# SCD2 as-of enrichment (facts × dimension versions at fact time)
# --------------------------------------------------------------------------

def q_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each shipped lineitem enriched with the customer's order-priority
    VERSION valid on the ship date (operators/scd.py scd2_asof_join:
    equi-join on the key, interval test as a post-join filter — never a
    range/BNLJ join), rolled up by priority-at-ship-time. The point of
    SCD2: the rollup reflects what the dimension said THEN, not now."""
    from ..operators.scd import scd2_asof_join, scd2_versions

    orders = load_table(spark, sf_dir, "orders")
    versions = scd2_versions(
        orders.select(
            "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
        ),
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey",
    ).select("o_custkey", "o_orderpriority", "valid_from", "valid_to")
    facts = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_quantity", "l_shipdate")
    )
    j = scd2_asof_join(facts, versions, "o_custkey", "l_shipdate")
    return j.groupBy(
        F.col("o_orderpriority").alias("priority_at_ship")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_qty"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
    )


SQL_SCD2_ASOF_ENRICH = """
WITH ch AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey FROM (
    SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
           lag(o_orderpriority) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev,
           row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS rn
    FROM orders
  ) WHERE rn = 1 OR prev IS DISTINCT FROM o_orderpriority
),
v AS (
  SELECT o_custkey, o_orderpriority,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS valid_to
  FROM ch
),
f AS (
  SELECT o.o_custkey, l.l_quantity, l.l_shipdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
j AS (
  SELECT f.l_quantity, f.o_custkey, v.o_orderpriority
  FROM f JOIN v ON f.o_custkey = v.o_custkey
    AND f.l_shipdate >= v.valid_from
    AND (v.valid_to IS NULL OR f.l_shipdate < v.valid_to)
)
SELECT o_orderpriority AS priority_at_ship,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM j GROUP BY 1
"""


# --------------------------------------------------------------------------
# Windowed PMI word associations
# --------------------------------------------------------------------------

_PMI_WINDOW = 3
_PMI_MIN = 40


def q_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus association mining: pointwise mutual information over
    token pairs co-occurring within 3 positions (operators/text.py
    pmi_scores). Pair enumeration is a map-side arrays_zip projection
    (fan-out = window × token count, linear); unigram table and the
    scalar totals broadcast; one ln per surviving pair in the repo's
    fixed-order double convention."""
    from ..operators.text import pmi_scores

    d = load_parallel(spark, sf_dir, "documents").select("text")
    return pmi_scores(d, "text", window=_PMI_WINDOW, min_pair=_PMI_MIN)


def _pmi_oracle_sql() -> str:
    legs = []
    for d in range(1, _PMI_WINDOW + 1):
        legs.append(
            f"SELECT unnest(list_zip(l[1:len(l) - {d}], "
            f"l[{d + 1}:len(l)])) AS p FROM d WHERE len(l) > {d}"
        )
    branches = "\n    UNION ALL\n    ".join(legs)
    gsum = " + ".join(
        f"greatest(len(l) - {d}, 0)" for d in range(1, _PMI_WINDOW + 1)
    )
    return f"""
WITH d AS (SELECT string_split(text, ' ') AS l FROM documents),
pr AS (
  SELECT least(p[1], p[2]) AS w1, greatest(p[1], p[2]) AS w2 FROM (
    {branches}
  )
),
pairs AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
  FROM pr GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN}
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(l) AS w FROM d
  ) GROUP BY 1
),
totals AS (
  SELECT CAST(sum(len(l)) AS BIGINT) AS n_w,
         CAST(sum({gsum}) AS BIGINT) AS n_pairs_total
  FROM d
)
SELECT p.w1, p.w2, p.n_pair,
       round(ln((CAST(p.n_pair AS DOUBLE) * CAST(t.n_w AS DOUBLE)
                 * CAST(t.n_w AS DOUBLE))
                / (CAST(t.n_pairs_total AS DOUBLE)
                   * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6)
         AS pmi
FROM pairs p
JOIN uni u1 ON p.w1 = u1.w
JOIN uni u2 ON p.w2 = u2.w
CROSS JOIN totals t
"""


SQL_WORD_PMI = _pmi_oracle_sql()


# --------------------------------------------------------------------------
# Item-item collaborative filtering
# --------------------------------------------------------------------------

_CF_K = 5
_CF_MIN_CO = 2
_CF_KEEP = 15


def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based CF (operators/recsys.py): top-5 cosine neighbors per
    part over (customer, part) purchase vectors truncated to each
    customer's 15 most-recently-shipped parts — the customer-history-
    grain companion to the order-grain basket_rules. Recency truncation
    makes pair work users × 15² EXACTLY (random co-purchase data is
    pathologically dense: every user × every part — the prune is what
    keeps the pair aggregation linear in users at any SF); ranking is
    one window over the item partitioning."""
    from ..operators.recsys import item_cosine_topk

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    ui = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_custkey", "l_partkey", "l_shipdate"
    )
    return item_cosine_topk(
        ui, "o_custkey", "l_partkey",
        k=_CF_K, min_co=_CF_MIN_CO,
        recency_col="l_shipdate", keep_per_user=_CF_KEEP,
    )


SQL_ITEM_SIMILARITY = f"""
WITH ui0 AS (
  SELECT o.o_custkey AS u, l.l_partkey AS i, max(l.l_shipdate) AS ts
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
ui2 AS (
  SELECT u, i FROM (
    SELECT u, i,
           row_number() OVER (PARTITION BY u ORDER BY ts DESC, i ASC)
             AS rn
    FROM ui0
  ) WHERE rn <= {_CF_KEEP}
),
co AS (
  SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS co_users
  FROM ui2 a JOIN ui2 b ON a.u = b.u AND a.i < b.i
  GROUP BY 1, 2 HAVING count(*) >= {_CF_MIN_CO}
),
cnt AS (SELECT i, count(*) AS n_users FROM ui2 GROUP BY i),
sc AS (
  SELECT ia, ib, co_users,
         CAST(co_users AS DOUBLE)
           / sqrt(CAST(ca.n_users * cb.n_users AS DOUBLE)) AS c
  FROM co
  JOIN cnt ca ON co.ia = ca.i
  JOIN cnt cb ON co.ib = cb.i
),
sym AS (
  SELECT ia AS item, ib AS rec_item, co_users, c FROM sc
  UNION ALL
  SELECT ib, ia, co_users, c FROM sc
)
SELECT item, rec_item, co_users, round(c, 6) AS cos,
       CAST(row_number() OVER w AS INTEGER) AS rank
FROM sym
WINDOW w AS (PARTITION BY item ORDER BY c DESC, rec_item ASC)
QUALIFY row_number() OVER w <= {_CF_K}
"""




# --------------------------------------------------------------------------
# CUSUM changepoint detection over the daily revenue series
# --------------------------------------------------------------------------

def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint localization on daily purchase revenue: the
    classic CUSUM statistic S_d = Σ_{≤d}(y - μ), kept EXACT by scaling
    with the day count (S'_d = nd·cumsum(y) - d·total, all BIGINT cents
    — no float mean ever enters); the changepoint estimate is
    argmax |S'| (earliest day on ties).

    Thin wiring over operators/anomaly.py:cusum_changepoint — see its
    docstring for the bounded-sort-partition and 1-row-broadcast scale
    contracts."""
    from ..operators.anomaly import cusum_changepoint

    e = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.expr("ts_ms div 86400000").alias("day"),
        F.floor(F.col("value").cast("double") * 100)
        .cast("long")
        .alias("cents"),
    )
    daily = e.groupBy("day").agg(
        F.sum("cents").cast("long").alias("rev_cents")
    )
    return cusum_changepoint(daily, "day", "rev_cents")


SQL_CUSUM_CHANGEPOINTS = """
WITH e AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
daily AS (
  SELECT day, CAST(sum(cents) AS BIGINT) AS rev_cents
  FROM e GROUP BY 1
),
tot AS (
  SELECT CAST(sum(rev_cents) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS nd
  FROM daily
),
cum AS (
  SELECT day, rev_cents,
         CAST(nd * sum(rev_cents) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - row_number() OVER (ORDER BY day) * total
           AS BIGINT) AS cusum_scaled
  FROM daily CROSS JOIN tot
),
mx AS (SELECT CAST(max(abs(cusum_scaled)) AS BIGINT) AS m FROM cum),
cp AS (
  SELECT CAST(min(day) AS BIGINT) AS cpd
  FROM cum CROSS JOIN mx WHERE abs(cusum_scaled) = m
)
SELECT day, rev_cents, cusum_scaled, (day = cpd) AS is_changepoint
FROM cum CROSS JOIN cp
"""


# --------------------------------------------------------------------------
# k-anonymity risk report with one-step generalization
# --------------------------------------------------------------------------

_KANON_K = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy risk report over the customer dimension: group sizes for
    the quasi-identifier (mktsegment, nationkey, acctbal-in-1000s),
    the at-risk flag (< k members), and whether ONE generalization step
    (coarsening the balance bucket 1000 → 5000) already clears the
    group — the generalization-ladder check of k-anonymization.
    Thin wiring over operators/privacy.py:k_anonymity_report; the
    erasure companion is user_erasure. `div` truncates toward zero,
    exactly like the oracle's `//` (DuckDB integer // is truncating,
    verified on negative bal_kb)."""
    from ..operators.privacy import k_anonymity_report

    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal").cast("double") / 1000)
        .cast("long")
        .alias("bal_kb"),
    )
    return k_anonymity_report(
        c,
        stable_cols=["c_mktsegment", "c_nationkey"],
        fine_col="bal_kb",
        coarse_col="bal_5kb",
        coarse_expr=F.expr("bal_kb div 5").cast("long"),
        k=_KANON_K,
    )


SQL_K_ANONYMITY = f"""
WITH c AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT)
           AS bal_kb
  FROM customer
),
fine AS (
  SELECT c_mktsegment, c_nationkey, bal_kb,
         CAST(count(*) AS BIGINT) AS n_fine
  FROM c GROUP BY 1, 2, 3
),
coarse AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(bal_kb // 5 AS BIGINT) AS bal_5kb,
         CAST(count(*) AS BIGINT) AS n_coarse
  FROM c GROUP BY 1, 2, 3
)
SELECT f.c_mktsegment, f.c_nationkey, f.bal_kb, f.n_fine, co.n_coarse,
       (f.n_fine < {_KANON_K}) AS at_risk,
       (f.n_fine < {_KANON_K} AND co.n_coarse >= {_KANON_K})
         AS fixed_by_generalization
FROM fine f
JOIN coarse co
  ON f.c_mktsegment = co.c_mktsegment
 AND f.c_nationkey = co.c_nationkey
 AND CAST(f.bal_kb // 5 AS BIGINT) = co.bal_5kb
"""


# --------------------------------------------------------------------------
# Day-of-week seasonal anomaly flags
# --------------------------------------------------------------------------

def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_anomalies with the seasonal conditioning a weekly-cycled
    metric needs: median/MAD baselines per (event_type, day-of-week)
    instead of per type — a Monday spike is judged against Mondays.
    Thin wiring over operators/anomaly.py:mad_anomaly_flags grouped by
    (event_type, day-of-week); the only data-sized shuffle is the
    daily count aggregation."""
    from ..operators.anomaly import mad_anomaly_flags

    e = load_events(spark, sf_dir).select(
        "event_type", F.expr("ts_ms div 86400000").alias("day_num")
    )
    daily = e.groupBy("event_type", "day_num").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumn("dow", (F.col("day_num") % 7).cast("long"))
    return mad_anomaly_flags(
        daily, ["event_type", "dow"], "n", threshold=2.0
    ).select(
        "event_type", "day_num", "dow", "n", "med", "mad", "is_anomaly"
    )


SQL_SEASONAL_ANOMALIES = """
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day_num,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
d2 AS (
  SELECT *, CAST(day_num % 7 AS BIGINT) AS dow FROM daily
),
med AS (
  SELECT event_type, dow, quantile_cont(n, 0.5) AS med
  FROM d2 GROUP BY 1, 2
),
dev AS (
  SELECT d.event_type, d.day_num, d.dow, d.n, m.med,
         abs(CAST(d.n AS DOUBLE) - m.med) AS adev
  FROM d2 d JOIN med m ON d.event_type = m.event_type AND d.dow = m.dow
),
mad AS (
  SELECT event_type, dow, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY 1, 2
)
SELECT v.event_type, v.day_num, v.dow, v.n, v.med, a.mad,
       (v.adev > 2.0 * a.mad) AS is_anomaly
FROM dev v JOIN mad a ON v.event_type = a.event_type AND v.dow = a.dow
"""

QUERIES_IDENTITY: dict = {
    "url_dedup": q_url_dedup,
    "identity_stitching": q_identity_stitching,
    "user_erasure": q_user_erasure,
    "markov_attribution": q_markov_attribution,
    "phrase_search": q_phrase_search,
    "bootstrap_ci": q_bootstrap_ci,
    "scd2_asof_enrich": q_scd2_asof_enrich,
    "word_pmi": q_word_pmi,
    "item_similarity": q_item_similarity,
    "cusum_changepoints": q_cusum_changepoints,
    "k_anonymity": q_k_anonymity,
    "seasonal_anomalies": q_seasonal_anomalies,
}

ORACLES_IDENTITY: dict[str, str] = {
    "url_dedup": SQL_URL_DEDUP,
    "identity_stitching": SQL_IDENTITY_STITCHING,
    "user_erasure": SQL_USER_ERASURE,
    "markov_attribution": SQL_MARKOV_ATTRIBUTION,
    "phrase_search": SQL_PHRASE_SEARCH,
    "bootstrap_ci": SQL_BOOTSTRAP_CI,
    "scd2_asof_enrich": SQL_SCD2_ASOF_ENRICH,
    "word_pmi": SQL_WORD_PMI,
    "item_similarity": SQL_ITEM_SIMILARITY,
    "cusum_changepoints": SQL_CUSUM_CHANGEPOINTS,
    "k_anonymity": SQL_K_ANONYMITY,
    "seasonal_anomalies": SQL_SEASONAL_ANOMALIES,
}


def q_phrase_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME phrase retrieval as phrase_search, answered from a
    positional inverted index (build + k-way positional self-join,
    operators/text.build_positional_index / phrase_query_index) —
    the build-once-query-many formulation. Shares phrase_search's
    oracle verbatim: a green row pins index == scan-local."""
    from ..operators.text import build_positional_index, phrase_query_index

    d = load_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    idx = build_positional_index(d)
    return phrase_query_index(idx, _PHRASES)


QUERIES_IDENTITY["phrase_index_search"] = q_phrase_index_search
ORACLES_IDENTITY["phrase_index_search"] = SQL_PHRASE_SEARCH
