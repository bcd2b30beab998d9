"""Driver queries: the round-7 ML-infrastructure batch.

Three families the "beyond the reference" training-data list implies
but nothing in the registry covered yet, each thin wiring over an
operator module with a full DuckDB value oracle:

- spatial: ``spatial_radius_pairs`` / ``spatial_nearest`` — the
  grid-bucketed planar radius join (operators/spatial.py). The
  oracle is the naive cross-product distance filter; the Spark plan
  is the 3x3-cell broadcast hash join (plan-asserted BNLJ-free in
  tests/test_spatial.py) — a green row proves the grid decomposition
  is lossless.
- linear algebra: ``covariance_matrix`` — the partition-local Gram
  pattern (operators/linalg.py) on the 64-dim embeddings table,
  integer-grid exact.
- feature selection: ``feature_chi2`` — chi-square / mutual
  information / Cramer's V of categorical event features against an
  engagement label (operators/features.py).

Coordinates for the spatial queries are synthesized deterministically
from ids (multiplicative hash onto a 10000x10000 integer plane), the
same convention as the decode queries' payload synthesis — the
testdata has no native lat/lon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.features import categorical_feature_scores
from ..operators.linalg import covariance_matrix
from ..operators.spatial import nearest_within, radius_join
from ..sources.testdata import load_events, load_table

__all__ = ["QUERIES_ML", "ORACLES_ML"]

_R = 150  # search radius on the 10000x10000 synthetic plane
_PX, _PY = 7919, 104729  # point coordinate hash multipliers
_QX, _QY = 6151, 13007  # POI coordinate hash multipliers


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events(spark, sf_dir).select(
        F.col("event_id").alias("pid"),
        (F.col("event_id") * _PX % 10000).alias("x"),
        (F.col("event_id") * _PY % 10000).alias("y"),
    )


def _pois(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("poi_id"),
        (F.col("s_suppkey") * _QX % 10000).alias("x"),
        (F.col("s_suppkey") * _QY % 10000).alias("y"),
    )


def q_spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (event point, supplier POI) pair within planar distance
    150 — the grid join's survivors with their exact integer squared
    distance."""
    return radius_join(_points(spark, sf_dir), _pois(spark, sf_dir), _R)


SQL_SPATIAL_RADIUS_PAIRS = f"""
WITH p AS (
  SELECT event_id AS pid,
         event_id * {_PX} % 10000 AS x,
         event_id * {_PY} % 10000 AS y
  FROM events
),
q AS (
  SELECT s_suppkey AS poi_id,
         s_suppkey * {_QX} % 10000 AS x,
         s_suppkey * {_QY} % 10000 AS y
  FROM supplier
)
SELECT p.pid, q.poi_id,
       (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS dist2
FROM p, q
WHERE (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)
      <= {_R * _R}
"""


def q_spatial_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded nearest POI per event point (ties -> smallest
    poi_id), NULL when nothing is within range, plus the in-radius
    count — every point appears exactly once."""
    return nearest_within(
        _points(spark, sf_dir), _pois(spark, sf_dir), _R
    )


SQL_SPATIAL_NEAREST = f"""
WITH p AS (
  SELECT event_id AS pid,
         event_id * {_PX} % 10000 AS x,
         event_id * {_PY} % 10000 AS y
  FROM events
),
q AS (
  SELECT s_suppkey AS poi_id,
         s_suppkey * {_QX} % 10000 AS x,
         s_suppkey * {_QY} % 10000 AS y
  FROM supplier
),
cand AS (
  SELECT p.pid, q.poi_id,
         (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS dist2
  FROM p, q
  WHERE (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)
        <= {_R * _R}
),
best AS (
  SELECT pid, poi_id AS nearest_poi, dist2 AS nearest_dist2,
         n_in_radius
  FROM (
    SELECT pid, poi_id, dist2,
           count(*) OVER (PARTITION BY pid) AS n_in_radius,
           row_number() OVER (PARTITION BY pid
                              ORDER BY dist2, poi_id) AS rn
    FROM cand
  ) WHERE rn = 1
)
SELECT p.pid, best.nearest_poi, best.nearest_dist2,
       COALESCE(best.n_in_radius, 0) AS n_in_radius
FROM p LEFT JOIN best USING (pid)
"""


_COV_DIM = 64
_COV_SCALE = 1000


def q_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 64x64 covariance/correlation of the embeddings table on
    the 1e-3 integer grid — 2080 upper-triangle rows from one Arrow
    Gram pass."""
    return covariance_matrix(
        load_table(spark, sf_dir, "embeddings"),
        "embedding",
        dim=_COV_DIM,
        scale=_COV_SCALE,
    )


SQL_COVARIANCE_MATRIX = f"""
WITH qv AS (
  SELECT vec_id, CAST(s.i AS INTEGER) - 1 AS i,
         CAST(CASE WHEN embedding[CAST(s.i AS INTEGER)] < 0
                   THEN -floor(abs(embedding[CAST(s.i AS INTEGER)]
                                   * {_COV_SCALE}.0) + 0.5)
                   ELSE floor(abs(embedding[CAST(s.i AS INTEGER)]
                                  * {_COV_SCALE}.0) + 0.5)
              END AS BIGINT) AS q
  FROM embeddings,
       LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) s
),
nn AS (SELECT count(*) AS n FROM embeddings),
m AS (
  SELECT i, sum(q) AS si, sum(q * q) AS sii
  FROM qv GROUP BY i
),
p AS (
  SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sij
  FROM qv a JOIN qv b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT p.i, p.j,
       -- "+ 0" canonicalizes DuckDB's signed zero: round() returns
       -- -0.0 for a tiny negative covariance while Spark's
       -- BigDecimal HALF_UP round has no signed zero, and the
       -- grading driver hashes raw cells (CORRECTNESS_r07
       -- covariance_matrix red: 3 cells, -0.0 vs 0.0).
       round(CAST(nn.n * p.sij - mi.si * mj.si AS DOUBLE)
             / ({_COV_SCALE}.0 * {_COV_SCALE}.0 * nn.n * nn.n), 6) + 0
         AS cov,
       round(CASE WHEN nn.n * mi.sii - mi.si * mi.si > 0
                   AND nn.n * mj.sii - mj.si * mj.si > 0
                  THEN CAST(nn.n * p.sij - mi.si * mj.si AS DOUBLE)
                       / sqrt(CAST(nn.n * mi.sii - mi.si * mi.si
                                   AS DOUBLE)
                              * CAST(nn.n * mj.sii - mj.si * mj.si
                                     AS DOUBLE))
             END, 6) + 0 AS corr
FROM p
JOIN m mi ON mi.i = p.i
JOIN m mj ON mj.i = p.j
CROSS JOIN nn
"""


def q_feature_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event features predict high-value engagement: chi2 / MI /
    Cramer's V of event_type, hour-of-day and day-of-week against the
    value >= 50 label."""
    e = load_events(spark, sf_dir)
    return categorical_feature_scores(
        e,
        features={
            "event_type": F.col("event_type"),
            "hour": F.expr("ts_ms div 3600000 % 24"),
            "dow": F.expr("(ts_ms div 86400000 + 4) % 7"),
        },
        label=F.when(F.col("value") >= 50, "hi").otherwise("lo"),
    )


SQL_FEATURE_CHI2 = """
WITH e AS (
  SELECT COALESCE(CAST(event_type AS VARCHAR), '<null>') AS event_type,
         CAST(epoch_ms(ts) // 3600000 % 24 AS VARCHAR) AS hour,
         CAST((epoch_ms(ts) // 86400000 + 4) % 7 AS VARCHAR) AS dow,
         CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS y
  FROM events
),
stacked AS (
  SELECT 'event_type' AS feature, event_type AS val, y FROM e
  UNION ALL SELECT 'hour', hour, y FROM e
  UNION ALL SELECT 'dow', dow, y FROM e
),
c AS (
  SELECT feature, val, y, count(*) AS o
  FROM stacked GROUP BY 1, 2, 3
),
t AS (
  SELECT feature, val, y, o,
         sum(o) OVER (PARTITION BY feature) AS n,
         sum(o) OVER (PARTITION BY feature, val) AS rt,
         sum(o) OVER (PARTITION BY feature, y) AS ct
  FROM c
)
SELECT feature,
       CAST(max(n) AS BIGINT) AS n,
       CAST(count(DISTINCT val) AS BIGINT) AS n_values,
       CAST(count(DISTINCT y) AS BIGINT) AS n_labels,
       CAST((count(DISTINCT val) - 1) * (count(DISTINCT y) - 1)
            AS INTEGER) AS dof,
       round(sum((CAST(o AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 * (CAST(o AS DOUBLE)
                    - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                      / CAST(n AS DOUBLE))
                 / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                    / CAST(n AS DOUBLE))), 6) AS chi2,
       round(sum(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
                 * ln(CAST(n AS DOUBLE) * CAST(o AS DOUBLE)
                      / (CAST(rt AS DOUBLE)
                         * CAST(ct AS DOUBLE)))), 6) AS mi,
       round(CASE WHEN least(count(DISTINCT val) - 1,
                             count(DISTINCT y) - 1) > 0
                  THEN sqrt(sum((CAST(o AS DOUBLE)
                                 - CAST(rt AS DOUBLE)
                                   * CAST(ct AS DOUBLE)
                                   / CAST(n AS DOUBLE))
                                * (CAST(o AS DOUBLE)
                                   - CAST(rt AS DOUBLE)
                                     * CAST(ct AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                / (CAST(rt AS DOUBLE)
                                   * CAST(ct AS DOUBLE)
                                   / CAST(n AS DOUBLE)))
                            / (CAST(max(n) AS DOUBLE)
                               * least(count(DISTINCT val) - 1,
                                       count(DISTINCT y) - 1)))
             END, 6) AS cramers_v
FROM t
GROUP BY feature
"""


QUERIES_ML = {
    "spatial_radius_pairs": q_spatial_radius_pairs,
    "spatial_nearest": q_spatial_nearest,
    "covariance_matrix": q_covariance_matrix,
    "feature_chi2": q_feature_chi2,
}

ORACLES_ML = {
    "spatial_radius_pairs": SQL_SPATIAL_RADIUS_PAIRS,
    "spatial_nearest": SQL_SPATIAL_NEAREST,
    "covariance_matrix": SQL_COVARIANCE_MATRIX,
    "feature_chi2": SQL_FEATURE_CHI2,
}


_ACF_LAGS = 7


def q_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality screen for the monitoring stack: exact ACF of the
    daily revenue series (BIGINT cents grain) at lags 1..7 — a weekly
    cycle shows up as the lag-7 peak."""
    from ..operators.anomaly import acf

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ms div 86400000").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    return acf(daily, "day", "cents", _ACF_LAGS)


SQL_REVENUE_ACF = f"""
WITH d AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
r AS (
  SELECT row_number() OVER (ORDER BY day) AS rn,
         CAST(cents AS HUGEINT) AS x
  FROM d
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS s,
         sum(x * x) AS sxx
  FROM r
),
k AS (SELECT CAST(unnest(range(1, {_ACF_LAGS} + 1)) AS HUGEINT) AS lag),
p AS (
  SELECT k.lag,
         sum(a.x * b.x) AS cross_s,
         sum(a.x) AS head_s,
         sum(b.x) AS tail_s,
         count(*) AS n_pairs
  FROM k
  JOIN r a ON true
  JOIN r b ON b.rn = a.rn + k.lag
  GROUP BY 1
)
SELECT CAST(lag AS INTEGER) AS lag,
       round(CASE WHEN n * n * sxx - n * s * s > 0
                  THEN CAST(n * n * cross_s - n * s * (head_s + tail_s)
                            + (n - lag) * s * s AS DOUBLE)
                       / CAST(n * n * sxx - n * s * s AS DOUBLE)
             END, 6) AS acf,
       CAST(n_pairs AS BIGINT) AS n_pairs
FROM p, tot
WHERE n_pairs > 0
"""


def q_benford_dq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order totals at cents grain —
    the financial-fact DQ gate."""
    from ..operators.dq import benford_report

    o = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return benford_report(o, "cents")


def _benford_sql() -> str:
    from ..operators.dq import BENFORD_CRIT_95, BENFORD_P

    digit_case = " ".join(
        f"WHEN cents >= {10 ** k} THEN cents // {10 ** k}"
        for k in range(18, -1, -1)
    )
    obs = ", ".join(
        f"sum(CASE WHEN first_d = {d} THEN 1 ELSE 0 END) AS o_{d}"
        for d in range(1, 10)
    )
    n_expr = " + ".join(f"o_{d}" for d in range(1, 10))
    chi_terms = " + ".join(
        f"(CAST(o_{d} AS DOUBLE) - n * {BENFORD_P[d]!r})"
        f" * (CAST(o_{d} AS DOUBLE) - n * {BENFORD_P[d]!r})"
        f" / (n * {BENFORD_P[d]!r})"
        for d in range(1, 10)
    )
    branches = " UNION ALL ".join(
        f"SELECT {d} AS digit, CAST(o_{d} AS BIGINT) AS observed, "
        f"CAST(n AS BIGINT) AS n, "
        # A bare float literal parses as DECIMAL(18,17) in DuckDB (the
        # r8 representation-drift class), and DECIMAL→DOUBLE rounds
        # through the scaled integer, flipping the last bit vs the
        # Python float. Casting the repr STRING uses the exact
        # string→double parser, bit-identical to the Spark literal.
        f"CAST('{BENFORD_P[d]!r}' AS DOUBLE) AS expected_p, "
        f"chi2, chi2 > {BENFORD_CRIT_95!r} AS benford_alarm, "
        f"CAST(n_skipped AS BIGINT) AS n_skipped FROM c"
        for d in range(1, 10)
    )
    return f"""
WITH amounts AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
f AS (
  SELECT cents, CASE {digit_case} END AS first_d FROM amounts
),
a AS (
  SELECT {obs},
         sum(CASE WHEN cents <= 0 OR cents IS NULL THEN 1 ELSE 0 END)
           AS n_skipped
  FROM f
),
b AS (SELECT *, CAST({n_expr} AS DOUBLE) AS n FROM a),
c AS (SELECT *, round({chi_terms}, 6) AS chi2 FROM b)
{branches}
"""


SQL_BENFORD_DQ = _benford_sql()

QUERIES_ML["revenue_acf"] = q_revenue_acf
QUERIES_ML["benford_dq"] = q_benford_dq
ORACLES_ML["revenue_acf"] = SQL_REVENUE_ACF
ORACLES_ML["benford_dq"] = SQL_BENFORD_DQ


_FS_M = {"seg": 0.95, "bucket": 0.85, "digit": 0.9}
_FS_THRESHOLD = 2.0
_FS_MAX_BLOCK = 10_000


def _fs_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bucket"),
        F.expr("right(c_name, 1)").alias("digit"),
    )


def q_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic duplicate screen over customers:
    nation-blocked candidate pairs scored on segment / balance-bucket
    / name-digit agreement with data-estimated u-probabilities; pairs
    at log2-odds >= 2 survive."""
    from ..operators.linkage import fs_field_u_multi, fs_link_scores

    r = _fs_records(spark, sf_dir)
    u = fs_field_u_multi(r, list(_FS_M))
    return fs_link_scores(
        r, "blk", _FS_M, u,
        id_col="id", threshold=_FS_THRESHOLD,
        max_block_size=_FS_MAX_BLOCK,
    )


def _fs_sql() -> str:
    u_ctes = ",\n".join(
        f"""u_{f} AS (
  SELECT CAST(sum(c * (c - 1)) AS DOUBLE)
         / (CAST(n2.n AS DOUBLE) * (n2.n - 1)) AS u
  FROM (SELECT {f}, count(*) AS c FROM r GROUP BY 1) fc
  CROSS JOIN (SELECT count(*) AS n FROM r) n2
  GROUP BY n2.n
)"""
        for f in _FS_M
    )
    terms = " + ".join(
        f"""CASE WHEN a.{f} IS NOT DISTINCT FROM b.{f}
             THEN ln({_FS_M[f]!r} / u_{f}.u) / ln(2.0)
             ELSE ln({1.0 - _FS_M[f]!r} / (1.0 - u_{f}.u)) / ln(2.0)
        END"""
        for f in _FS_M
    )
    agrees = ", ".join(
        f"a.{f} IS NOT DISTINCT FROM b.{f} AS agree_{f}" for f in _FS_M
    )
    u_joins = " ".join(f"CROSS JOIN u_{f}" for f in _FS_M)
    return f"""
WITH r AS (
  SELECT c_custkey AS id, c_nationkey AS blk, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
         right(c_name, 1) AS digit
  FROM customer
),
bc AS (
  SELECT blk FROM r GROUP BY blk
  HAVING count(*) <= {_FS_MAX_BLOCK}
),
{u_ctes}
SELECT * FROM (
  SELECT a.id AS id_a, b.id AS id_b,
         round({terms}, 6) AS score,
         {agrees}
  FROM r a
  JOIN bc ON a.blk = bc.blk
  JOIN r b ON a.blk = b.blk AND a.id < b.id
  {u_joins}
)
WHERE score >= {_FS_THRESHOLD!r}
"""


SQL_FS_LINKAGE = _fs_sql()

QUERIES_ML["fs_linkage"] = q_fs_linkage
ORACLES_ML["fs_linkage"] = SQL_FS_LINKAGE


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift screen: does the event-value distribution
    differ between alternating days (even vs odd epoch day)? Exact D
    over the cents-grain value CDFs via bucketed prefix sums — no
    single-reducer sort at any scale."""
    from ..operators.dq import ks_two_sample

    e = load_events(spark, sf_dir).select(
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.expr("ts_ms div 86400000 % 2 = 0"), "even")
        .otherwise("odd")
        .alias("grp"),
    )
    return ks_two_sample(e, "cents", "grp", "even", "odd")


SQL_KS_DRIFT = """
WITH e AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
         CASE WHEN epoch_ms(ts) // 86400000 % 2 = 0
              THEN 'even' ELSE 'odd' END AS grp
  FROM events
  WHERE value IS NOT NULL
),
pv AS (
  SELECT cents AS v,
         sum(CASE WHEN grp = 'even' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN grp = 'odd' THEN 1 ELSE 0 END) AS cb
  FROM e GROUP BY 1
),
n AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM pv),
c AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cuma,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cumb
  FROM pv
),
d AS (
  SELECT v, abs(n.n_b * cuma - n.n_a * cumb) AS dnum
  FROM c CROSS JOIN n
),
best AS (
  SELECT max(dnum) AS dnum,
         min(v) FILTER (WHERE dnum = (SELECT max(dnum) FROM d))
           AS d_at_value
  FROM d
)
SELECT CAST(n.n_a AS BIGINT) AS n_a,
       CAST(n.n_b AS BIGINT) AS n_b,
       round(CAST(best.dnum AS DOUBLE)
             / (CAST(n.n_a AS DOUBLE) * CAST(n.n_b AS DOUBLE)), 6)
         AS d_stat,
       CAST(best.d_at_value AS BIGINT) AS d_at_value,
       CAST(best.dnum AS DOUBLE)
       / (CAST(n.n_a AS DOUBLE) * CAST(n.n_b AS DOUBLE))
       > 1.358 * sqrt((n.n_a + n.n_b)
                      / (CAST(n.n_a AS DOUBLE) * CAST(n.n_b AS DOUBLE)))
         AS ks_alarm
FROM best CROSS JOIN n
"""

QUERIES_ML["ks_drift"] = q_ks_drift
ORACLES_ML["ks_drift"] = SQL_KS_DRIFT


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per event type: exact Gini + top-decile
    user share over per-user cents totals, ranks via the
    sketch-bucketed exact ranking (no per-group global sort)."""
    from ..operators.stats import gini_concentration

    e = load_events(spark, sf_dir)
    per_user = e.groupBy("event_type", "user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    return gini_concentration(
        per_user, "cents", "user_id", ["event_type"], top_share=0.1
    )


SQL_GINI_CONCENTRATION = """
WITH pu AS (
  SELECT event_type, user_id,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, user_id, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, user_id) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM pu
),
a AS (
  SELECT event_type,
         max(n) AS n,
         sum(CAST(cents AS HUGEINT)) AS total,
         sum(CAST(rnk AS HUGEINT) * cents) AS rx,
         sum(CASE WHEN rnk > n - floor(0.1 * n)
                  THEN CAST(cents AS HUGEINT)
                  ELSE 0 END) AS top_sum,
         max(CAST(floor(0.1 * n) AS BIGINT)) AS top_n
  FROM r GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(total AS BIGINT) AS total,
       round(CASE WHEN total > 0
                  THEN CAST(2 * rx - (n + 1) * total AS DOUBLE)
                       / CAST(CAST(n AS HUGEINT) * total AS DOUBLE)
             END, 6) AS gini,
       top_n,
       round(CASE WHEN total > 0
                  THEN CAST(top_sum AS DOUBLE) / CAST(total AS DOUBLE)
             END, 6) AS top_value_share
FROM a
"""

QUERIES_ML["gini_concentration"] = q_gini_concentration
ORACLES_ML["gini_concentration"] = SQL_GINI_CONCENTRATION


_HOLT_ALPHA, _HOLT_BETA, _HOLT_H = 0.3, 0.1, 7


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast of daily revenue (cents grain):
    one-step-ahead fits for each observed day + a 7-day projection.
    The distributed work is the day aggregation; the O(days)
    recursion replays on the driver under the bounded-series
    contract."""
    from ..operators.anomaly import holt_forecast

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ms div 86400000").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    return holt_forecast(
        daily, "day", "cents",
        alpha=_HOLT_ALPHA, beta=_HOLT_BETA, horizon=_HOLT_H,
    )


SQL_HOLT_FORECAST = f"""
WITH RECURSIVE d AS (
  SELECT row_number() OVER (ORDER BY day) AS rn, day, cents
  FROM (
    SELECT epoch_ms(ts) // 86400000 AS day,
           sum(CAST(floor(value * 100) AS BIGINT)) AS cents
    FROM events GROUP BY 1
  )
),
nn AS (SELECT count(*) AS cnt FROM d),
rec AS (
  SELECT CAST(1 AS BIGINT) AS rn, d.day,
         CAST(d.cents AS DOUBLE) AS s,
         (SELECT CAST(cents AS DOUBLE) FROM d WHERE rn = 2)
           - CAST(d.cents AS DOUBLE) AS b,
         CAST(NULL AS DOUBLE) AS pred
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.day,
         {_HOLT_ALPHA} * CAST(d.cents AS DOUBLE)
           + (1 - {_HOLT_ALPHA}) * (rec.s + rec.b) AS s,
         {_HOLT_BETA} * (({_HOLT_ALPHA} * CAST(d.cents AS DOUBLE)
                          + (1 - {_HOLT_ALPHA}) * (rec.s + rec.b))
                         - rec.s)
           + (1 - {_HOLT_BETA}) * rec.b AS b,
         rec.s + rec.b AS pred
  FROM rec JOIN d ON d.rn = rec.rn + 1
)
SELECT d.day, 'fit' AS kind, CAST(d.cents AS BIGINT) AS actual,
       round(rec.pred, 6) AS predicted
FROM rec JOIN d ON d.rn = rec.rn
WHERE rec.rn >= 2
UNION ALL
SELECT last.day + h.h AS day, 'forecast' AS kind,
       CAST(NULL AS BIGINT) AS actual,
       round(last.s + h.h * last.b, 6) AS predicted
FROM (SELECT rec.* FROM rec CROSS JOIN nn WHERE rec.rn = nn.cnt) last
CROSS JOIN (SELECT unnest(range(1, {_HOLT_H} + 1)) AS h) h
"""

QUERIES_ML["holt_forecast"] = q_holt_forecast
ORACLES_ML["holt_forecast"] = SQL_HOLT_FORECAST


# ---------------------------------------------------------------------------
# round-7 continuation batch: quasi-experiments (DiD), exact heavy
# hitters (sketch-then-verify), DP count release, closed-form OLS
# ---------------------------------------------------------------------------

_DID_CUT_DAY = 19738  # 2024-01-16: pre = Jan 1-15, post = Jan 16-30


def q_did_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences per event type: units are
    (event_type, user), the md5 arm stands in for a staggered rollout
    flag, the period split is mid-January; metric = period cents.
    One unit-grain aggregation + one conditional aggregation
    (operators/stats.did_lift) — scale-flat."""
    from ..operators.stats import did_lift

    e = load_events(spark, sf_dir)
    treat = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("did#"),
                               F.col("user_id").cast("string"))), 1, 14
            ), 16, 10,
        ).cast("long") % 2
    )
    unit = e.groupBy(
        "event_type",
        F.col("user_id").alias("uid"),
        treat.alias("treat"),
        (F.expr("ts_ms div 86400000") >= _DID_CUT_DAY)
        .cast("int").alias("post"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    return did_lift(
        unit, "cents", "treat", "post", ["event_type"]
    ).orderBy("event_type")


SQL_DID_LIFT = f"""
WITH unit AS (
  SELECT event_type,
         user_id AS uid,
         ('0x' || substr(md5('did#' || CAST(user_id AS VARCHAR)),
                         1, 14))::BIGINT % 2 AS treat,
         CASE WHEN epoch_ms(ts) // 86400000 >= {_DID_CUT_DAY}
              THEN 1 ELSE 0 END AS post,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2, 3, 4
),
cells AS (
  SELECT event_type,
         CAST(sum(CASE WHEN treat=0 AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
         CAST(sum(CASE WHEN treat=0 AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
         CAST(sum(CASE WHEN treat=1 AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
         CAST(sum(CASE WHEN treat=1 AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
         sum(CASE WHEN treat=0 AND post=0 THEN cents ELSE 0 END) AS s_c0,
         sum(CASE WHEN treat=0 AND post=1 THEN cents ELSE 0 END) AS s_c1,
         sum(CASE WHEN treat=1 AND post=0 THEN cents ELSE 0 END) AS s_t0,
         sum(CASE WHEN treat=1 AND post=1 THEN cents ELSE 0 END) AS s_t1
  FROM unit GROUP BY 1
)
SELECT event_type, n_c0, n_c1, n_t0, n_t1,
       round(CASE WHEN n_c0 > 0 THEN CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE) END, 6) AS mean_c0,
       round(CASE WHEN n_c1 > 0 THEN CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE) END, 6) AS mean_c1,
       round(CASE WHEN n_t0 > 0 THEN CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE) END, 6) AS mean_t0,
       round(CASE WHEN n_t1 > 0 THEN CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE) END, 6) AS mean_t1,
       round(((CASE WHEN n_t1 > 0 THEN CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE) END)
              - (CASE WHEN n_t0 > 0 THEN CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE) END))
             - ((CASE WHEN n_c1 > 0 THEN CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE) END)
                - (CASE WHEN n_c0 > 0 THEN CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE) END)), 6) AS did
FROM cells ORDER BY event_type
"""

QUERIES_ML["did_lift"] = q_did_lift
ORACLES_ML["did_lift"] = SQL_DID_LIFT


_HH_PHI = 0.015


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy hitters over a synthesized linear-skew key
    (floor(sqrt(event_id % 10000)) — key j carries share ~(2j+1)/1e4
    at EVERY scale factor, the same id-synthesis convention as the
    spatial queries). The Spark plan is Misra-Gries candidate
    generation + broadcast exact verify (operators/skew.py); the
    oracle is the plain GROUP BY ... HAVING over the full key domain —
    a green row proves the sketch pass is lossless."""
    from ..operators.skew import exact_heavy_hitters

    e = load_events(spark, sf_dir).select(
        F.floor(F.sqrt((F.col("event_id") % 10000).cast("double")))
        .cast("long").alias("skey")
    )
    return exact_heavy_hitters(e, "skey", phi=_HH_PHI).orderBy("skey")


SQL_HEAVY_HITTERS = f"""
WITH k AS (
  SELECT CAST(floor(sqrt(CAST(event_id % 10000 AS DOUBLE))) AS BIGINT)
         AS skey
  FROM events
),
c AS (SELECT skey, CAST(count(*) AS BIGINT) AS n_rows FROM k GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS total_rows FROM k)
SELECT skey, n_rows,
       round(CAST(n_rows AS DOUBLE) / CAST(total_rows AS DOUBLE), 6)
         AS share,
       total_rows
FROM c CROSS JOIN t
WHERE CAST(n_rows AS DOUBLE) > {_HH_PHI} * CAST(total_rows AS DOUBLE)
ORDER BY skey
"""

QUERIES_ML["heavy_hitters"] = q_heavy_hitters
ORACLES_ML["heavy_hitters"] = SQL_HEAVY_HITTERS


_DP_EPS, _DP_THRESHOLD = 0.5, 50


def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private (event_type, day) activity release:
    deterministic md5-grid Laplace(1/0.5) noise + noisy-threshold
    suppression (operators/privacy.dp_noisy_counts). The oracle
    replays the identical noise arithmetic — the release is auditable
    by construction."""
    from ..operators.privacy import dp_noisy_counts

    e = load_events(spark, sf_dir).select(
        "event_type", F.expr("ts_ms div 86400000").alias("day")
    )
    return dp_noisy_counts(
        e, ["event_type", "day"],
        epsilon=_DP_EPS, threshold=_DP_THRESHOLD, seed="dp",
    ).orderBy("event_type", "day")


SQL_DP_RELEASE = f"""
WITH g AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         CAST(count(*) AS BIGINT) AS true_n
  FROM events GROUP BY 1, 2
),
n AS (
  SELECT event_type, day, true_n,
         (('0x' || substr(md5('dp' || chr(31) || event_type
                              || chr(31) || CAST(day AS VARCHAR)),
                          1, 10))::BIGINT % 1048576) AS grid
  FROM g
),
r AS (
  SELECT event_type, day,
         CAST(round(CAST(true_n AS DOUBLE)
                    + (-1.0 / {_DP_EPS}) * sign(u05)
                      * ln(1.0 - 2.0 * abs(u05))) AS BIGINT)
           AS released_count
  FROM (SELECT *, (CAST(grid AS DOUBLE) + 0.5) / 1048576.0 - 0.5
                  AS u05 FROM n)
)
SELECT event_type, day, released_count
FROM r WHERE released_count >= {_DP_THRESHOLD}
ORDER BY event_type, day
"""

QUERIES_ML["dp_release"] = q_dp_release
ORACLES_ML["dp_release"] = SQL_DP_RELEASE


def q_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS of order revenue (cents) on total quantity +
    line count across all orders — the normal-equation pattern
    (operators/linalg.ols_closed_form): one unit-grain aggregation,
    one sufficient-statistics reduce, Cramer's rule on exact integer
    determinants."""
    from ..operators.linalg import ols_closed_form

    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
         .alias("y"),
        F.sum(F.floor("l_quantity").cast("long")).alias("x1"),
        F.count(F.lit(1)).cast("long").alias("x2"),
    )
    return ols_closed_form(per_order, "y", "x1", "x2")


SQL_OLS_REGRESSION = """
WITH per_order AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS y,
         sum(CAST(floor(l_quantity) AS BIGINT)) AS x1,
         CAST(count(*) AS BIGINT) AS x2
  FROM lineitem GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x1) AS HUGEINT) AS s1,
         CAST(sum(x2) AS HUGEINT) AS s2,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
         CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
         CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
         CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
         CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per_order
),
d AS (
  SELECT *,
         n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2) AS det,
         sy * (s11 * s22 - s12 * s12)
           - s1 * (s1y * s22 - s12 * s2y)
           + s2 * (s1y * s12 - s11 * s2y) AS det0,
         n * (s1y * s22 - s12 * s2y)
           - sy * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s2y - s1y * s2) AS det1,
         n * (s11 * s2y - s1y * s12)
           - s1 * (s1 * s2y - s1y * s2)
           + sy * (s1 * s12 - s11 * s2) AS det2
  FROM s
),
b AS (
  SELECT *,
         CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
         CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
         CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2
  FROM d
)
SELECT CAST(n AS BIGINT) AS n,
       round(CASE WHEN det <> 0 THEN b0 END, 6) AS beta0,
       round(CASE WHEN det <> 0 THEN b1 END, 6) AS beta1,
       round(CASE WHEN det <> 0 THEN b2 END, 6) AS beta2,
       round(CASE WHEN det <> 0
                  AND (CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n AS DOUBLE)) <> 0.0
                  THEN 1.0 - (CAST(syy AS DOUBLE)
                              - b0 * CAST(sy AS DOUBLE)
                              - b1 * CAST(s1y AS DOUBLE)
                              - b2 * CAST(s2y AS DOUBLE))
                             / (CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                                  / CAST(n AS DOUBLE))
             END, 6) AS r2
FROM b
"""

QUERIES_ML["ols_regression"] = q_ols_regression
ORACLES_ML["ols_regression"] = SQL_OLS_REGRESSION


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-mart rollup: day-grain HLL register tables merged to
    weekly distinct-user estimates by register max — the COUNT
    DISTINCT analogue of incremental_rollup (the mart stores 1024
    integers per day; the week readout never rescans raw events).
    Exact weekly distincts ride along for calibration."""
    from ..operators.stats import hll_estimate, hll_registers

    e = load_events(spark, sf_dir).select(
        F.expr("ts_ms div 86400000").alias("day"), "user_id"
    )
    day_regs = hll_registers(e, "user_id", ["day"])  # the persistable mart
    week_regs = day_regs.select(
        F.expr("day div 7").alias("week"), "bucket", "mj"
    )
    est = hll_estimate(week_regs, ["week"], out_col="hll_users")
    exact = e.groupBy(F.expr("day div 7").alias("week")).agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return est.join(exact, "week").orderBy("week")


def _hll_rollup_sql() -> str:
    from ..operators.stats import HLL_M, HLL_NUM, HLL_RMAX

    return f"""
WITH h AS (
  SELECT epoch_ms(ts) // 86400000 AS day, user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT
           AS h
  FROM events
),
day_regs AS (
  SELECT day, h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} > 0
                  THEN {HLL_RMAX} - length(bin(h // {HLL_M}))
                  ELSE {HLL_RMAX} END) AS mj
  FROM h GROUP BY 1, 2
),
week_regs AS (
  SELECT day // 7 AS week, bucket, max(mj) AS mj
  FROM day_regs GROUP BY 1, 2
),
a AS (
  SELECT week,
         CAST(count(*) AS BIGINT) AS occupied,
         CAST(sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - mj)) AS BIGINT)
           AS s_occ
  FROM week_regs GROUP BY 1
),
est AS (
  SELECT week, occupied,
         CASE WHEN ({HLL_NUM!r} / ((s_occ + ({HLL_M} - occupied)
                    * CAST({1 << HLL_RMAX} AS BIGINT))::DOUBLE))
                   <= {2.5 * HLL_M!r}
                   AND ({HLL_M} - occupied) > 0
              THEN {float(HLL_M)!r}
                   * ln({float(HLL_M)!r}
                        / ({HLL_M} - occupied)::DOUBLE)
              ELSE {HLL_NUM!r}
                   / ((s_occ + ({HLL_M} - occupied)
                       * CAST({1 << HLL_RMAX} AS BIGINT))::DOUBLE)
         END AS raw
  FROM a
),
exact AS (
  SELECT epoch_ms(ts) // 86400000 // 7 AS week,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1
)
SELECT week, occupied, round(raw, 6) AS hll_users, exact_users
FROM est JOIN exact USING (week)
ORDER BY week
"""


SQL_HLL_ROLLUP = _hll_rollup_sql()
QUERIES_ML["hll_rollup"] = q_hll_rollup
ORACLES_ML["hll_rollup"] = SQL_HLL_ROLLUP


_NDCG_K = 10


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per document source: a deterministic pseudo-model score
    is ranked against md5-grid graded relevance judgments (0..3) —
    the metric machinery is the thing under test (the calibration
    convention: judgments synthesized, arithmetic exact)."""
    from ..operators.stats import ndcg_at_k

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("m1#"),
                                   F.col("doc_id").cast("string"))), 1, 10
                ), 16, 10,
            ).cast("long") % 1000000
        ).alias("score"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("rel#"),
                                   F.col("doc_id").cast("string"))), 1, 10
                ), 16, 10,
            ).cast("long") % 4
        ).cast("int").alias("rel"),
    )
    return ndcg_at_k(
        d, ["source"], "score", "rel", "doc_id", k=_NDCG_K
    ).orderBy("source")


def _ndcg_sql() -> str:
    from ..operators.stats import NDCG_GRID, ndcg_weights

    ws = ndcg_weights(_NDCG_K)
    arr = "[" + ", ".join(f"{w}::BIGINT" for w in ws) + "]"
    return f"""
WITH d AS (
  SELECT source, doc_id,
         ('0x' || substr(md5('m1#' || CAST(doc_id AS VARCHAR)),
                         1, 10))::BIGINT % 1000000 AS score,
         ('0x' || substr(md5('rel#' || CAST(doc_id AS VARCHAR)),
                         1, 10))::BIGINT % 4 AS rel
  FROM documents
),
r AS (
  SELECT source,
         (CAST(1 AS BIGINT) << rel) - 1 AS gain,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id ASC) AS pos,
         row_number() OVER (PARTITION BY source
                            ORDER BY rel DESC, doc_id ASC) AS ipos
  FROM d
),
a AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN pos <= {_NDCG_K}
                  THEN gain * {arr}[pos] ELSE 0 END) AS BIGINT) AS dcg_s,
         CAST(sum(CASE WHEN ipos <= {_NDCG_K}
                  THEN gain * {arr}[ipos] ELSE 0 END) AS BIGINT) AS idcg_s
  FROM r GROUP BY 1
)
SELECT source, n_candidates,
       round(CAST(dcg_s AS DOUBLE) / {float(NDCG_GRID)!r}, 6) AS dcg,
       round(CAST(idcg_s AS DOUBLE) / {float(NDCG_GRID)!r}, 6) AS idcg,
       round(CASE WHEN idcg_s > 0
                  THEN CAST(dcg_s AS DOUBLE) / CAST(idcg_s AS DOUBLE)
             END, 6) AS ndcg
FROM a ORDER BY source
"""


SQL_NDCG_EVAL = _ndcg_sql()
QUERIES_ML["ndcg_eval"] = q_ndcg_eval
ORACLES_ML["ndcg_eval"] = SQL_NDCG_EVAL


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised brand inference over the part co-purchase
    graph: every 5th part is seeded with its true brand, two
    synchronous majority-vote rounds spread the labels
    (operators/graph.label_propagation); the oracle replays both
    rounds as chained CTEs."""
    from ..operators.graph import cooccurrence_pairs, label_propagation

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # r13 opt: one-exchange groupBy + array pair expansion replaces the
    # self-join on l_orderkey; the operator re-distincts edges anyway,
    # so the (already-distinct) pair set is identical (guide §2.4)
    edges = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    nodes = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        F.when(F.col("p_partkey") % 5 == 0, F.col("p_brand"))
        .alias("label"),
    )
    return label_propagation(
        nodes, edges, rounds=2, assume_distinct=True
    ).orderBy("node")


SQL_LABEL_PROPAGATION = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
),
und AS (
  SELECT s AS a, d AS b FROM e0
  UNION ALL
  SELECT d AS a, s AS b FROM e0
),
seeds AS (
  SELECT p_partkey AS n,
         CASE WHEN p_partkey % 5 = 0 THEN p_brand END AS seed
  FROM part
),
l0 AS (SELECT n, seed AS lbl FROM seeds),
v1 AS (
  SELECT und.b AS n, l0.lbl, count(*) AS votes
  FROM und JOIN l0 ON l0.n = und.a
  WHERE l0.lbl IS NOT NULL GROUP BY 1, 2
),
p1 AS (
  SELECT n, lbl AS pick FROM (
    SELECT n, lbl, row_number() OVER (
      PARTITION BY n ORDER BY votes DESC, lbl ASC) AS rk
    FROM v1) WHERE rk = 1
),
l1 AS (
  SELECT seeds.n,
         CASE WHEN seeds.seed IS NOT NULL THEN seeds.seed
              ELSE coalesce(p1.pick, l0.lbl) END AS lbl
  FROM seeds
  LEFT JOIN l0 ON l0.n = seeds.n
  LEFT JOIN p1 ON p1.n = seeds.n
),
v2 AS (
  SELECT und.b AS n, l1.lbl, count(*) AS votes
  FROM und JOIN l1 ON l1.n = und.a
  WHERE l1.lbl IS NOT NULL GROUP BY 1, 2
),
p2 AS (
  SELECT n, lbl AS pick FROM (
    SELECT n, lbl, row_number() OVER (
      PARTITION BY n ORDER BY votes DESC, lbl ASC) AS rk
    FROM v2) WHERE rk = 1
),
l2 AS (
  SELECT seeds.n,
         CASE WHEN seeds.seed IS NOT NULL THEN seeds.seed
              ELSE coalesce(p2.pick, l1.lbl) END AS lbl
  FROM seeds
  LEFT JOIN l1 ON l1.n = seeds.n
  LEFT JOIN p2 ON p2.n = seeds.n
)
SELECT n AS node, lbl AS label FROM l2 ORDER BY node
"""

QUERIES_ML["label_propagation"] = q_label_propagation
ORACLES_ML["label_propagation"] = SQL_LABEL_PROPAGATION


_HW_A, _HW_B, _HW_G, _HW_M, _HW_H = 0.3, 0.1, 0.2, 7, 7


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters forecast of daily revenue with a weekly
    season: fits after the two init weeks + a 7-day projection. The
    oracle replays the triple recursion as a recursive CTE carrying
    the 7-slot seasonal state as a list column."""
    from ..operators.anomaly import holt_winters_forecast

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ms div 86400000").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    return holt_winters_forecast(
        daily, "day", "cents",
        alpha=_HW_A, beta=_HW_B, gamma=_HW_G,
        season=_HW_M, horizon=_HW_H,
    )


SQL_HOLT_WINTERS = f"""
WITH RECURSIVE d AS (
  SELECT row_number() OVER (ORDER BY day) AS rn, day, cents
  FROM (
    SELECT epoch_ms(ts) // 86400000 AS day,
           sum(CAST(floor(value * 100) AS BIGINT)) AS cents
    FROM events GROUP BY 1
  )
),
nn AS (SELECT count(*) AS cnt FROM d),
init AS (
  SELECT CAST({_HW_M} AS BIGINT) AS rn,
         (SELECT sum(CAST(cents AS DOUBLE)) FROM d
          WHERE rn <= {_HW_M}) / {float(_HW_M)!r} AS s,
         ((SELECT sum(CAST(cents AS DOUBLE)) FROM d
           WHERE rn > {_HW_M} AND rn <= {2 * _HW_M}) / {float(_HW_M)!r}
          - (SELECT sum(CAST(cents AS DOUBLE)) FROM d
             WHERE rn <= {_HW_M}) / {float(_HW_M)!r})
           / {float(_HW_M)!r} AS b,
         (SELECT list(CAST(cents AS DOUBLE)
                      - (SELECT sum(CAST(cents AS DOUBLE)) FROM d
                         WHERE rn <= {_HW_M}) / {float(_HW_M)!r}
                      ORDER BY rn)
          FROM d WHERE rn <= {_HW_M}) AS cs,
         CAST(NULL AS DOUBLE) AS pred
),
rec AS (
  SELECT * FROM init
  UNION ALL
  SELECT d.rn,
         {_HW_A} * (CAST(d.cents AS DOUBLE) - rec.cs[1])
           + (1 - {_HW_A}) * (rec.s + rec.b) AS s,
         {_HW_B} * (({_HW_A} * (CAST(d.cents AS DOUBLE) - rec.cs[1])
                     + (1 - {_HW_A}) * (rec.s + rec.b)) - rec.s)
           + (1 - {_HW_B}) * rec.b AS b,
         list_append(
           rec.cs[2:{_HW_M}],
           {_HW_G} * (CAST(d.cents AS DOUBLE)
                      - ({_HW_A} * (CAST(d.cents AS DOUBLE) - rec.cs[1])
                         + (1 - {_HW_A}) * (rec.s + rec.b)))
             + (1 - {_HW_G}) * rec.cs[1]
         ) AS cs,
         rec.s + rec.b + rec.cs[1] AS pred
  FROM rec JOIN d ON d.rn = rec.rn + 1
)
SELECT d.day, 'fit' AS kind, CAST(d.cents AS BIGINT) AS actual,
       round(rec.pred, 6) AS predicted
FROM rec JOIN d ON d.rn = rec.rn
WHERE rec.rn > {2 * _HW_M}
UNION ALL
SELECT last.day + h.h AS day, 'forecast' AS kind,
       CAST(NULL AS BIGINT) AS actual,
       round(last.s + h.h * last.b
             + last.cs[CAST(h.h AS INTEGER)], 6) AS predicted
FROM (
  SELECT rec.s, rec.b, rec.cs, d.day
  FROM rec JOIN d ON d.rn = rec.rn CROSS JOIN nn
  WHERE rec.rn = nn.cnt
) last
CROSS JOIN (SELECT unnest(range(1, {_HW_H} + 1)) AS h) h
"""

QUERIES_ML["holt_winters"] = q_holt_winters
ORACLES_ML["holt_winters"] = SQL_HOLT_WINTERS


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue (median pairwise slope
    + median-residual intercept) — the outlier-proof companion of
    ols_regression, on the bounded day series."""
    from ..operators.anomaly import theil_sen_trend

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ms div 86400000").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    return theil_sen_trend(daily, "day", "cents")


SQL_THEIL_SEN = """
WITH d AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
p AS (
  SELECT a.day AS ti, b.day AS tj,
         CAST(b.cents - a.cents AS DOUBLE)
           / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM d a JOIN d b ON a.day < b.day
),
r AS (
  SELECT slope, ti, tj,
         row_number() OVER (ORDER BY slope, ti, tj) AS rn,
         count(*) OVER () AS np
  FROM p
),
ms AS (
  SELECT sum(slope) / count(*) AS slope,
         CAST(max(np) AS BIGINT) AS n_pairs
  FROM r WHERE rn * 2 = np OR rn * 2 = np + 1 OR rn * 2 = np + 2
),
res AS (
  SELECT CAST(d.cents AS DOUBLE) - ms.slope * CAST(d.day AS DOUBLE) AS r,
         d.day, ms.slope, ms.n_pairs
  FROM d CROSS JOIN ms
),
r2 AS (
  SELECT r, slope, n_pairs,
         row_number() OVER (ORDER BY r, day) AS rn,
         count(*) OVER () AS n
  FROM res
)
SELECT CAST(max(n) AS BIGINT) AS n_points,
       max(n_pairs) AS n_pairs,
       round(max(slope), 6) AS slope,
       round(sum(r) / count(*), 6) AS intercept
FROM r2 WHERE rn * 2 = n OR rn * 2 = n + 1 OR rn * 2 = n + 2
"""

QUERIES_ML["theil_sen"] = q_theil_sen
ORACLES_ML["theil_sen"] = SQL_THEIL_SEN


_IPS_K = 4  # uniform logging policy over 4 arms -> propensity 1/4


def q_offline_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation per event type: the logged randomized arm
    (md5 of the event id, uniform over 4) is scored against a
    user-context target policy (md5 of the user id) via IPS/SNIPS
    (operators/stats.ips_policy_value)."""
    from ..operators.stats import ips_policy_value

    e = load_events(spark, sf_dir).select(
        "event_type",
        (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("log#"),
                               F.col("event_id").cast("string"))), 1, 14
            ), 16, 10).cast("long") % _IPS_K
        ).alias("logged_arm"),
        (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("tgt#"),
                               F.col("user_id").cast("string"))), 1, 14
            ), 16, 10).cast("long") % _IPS_K
        ).alias("target_arm"),
        F.floor(F.col("value") * 100).cast("long").alias("reward"),
    )
    return ips_policy_value(
        e, "logged_arm", "target_arm", "reward",
        propensity=1.0 / _IPS_K, group_cols=["event_type"],
    ).orderBy("event_type")


SQL_OFFLINE_POLICY = f"""
WITH e AS (
  SELECT event_type,
         ('0x' || substr(md5('log#' || CAST(event_id AS VARCHAR)),
                         1, 14))::BIGINT % {_IPS_K} AS logged_arm,
         ('0x' || substr(md5('tgt#' || CAST(user_id AS VARCHAR)),
                         1, 14))::BIGINT % {_IPS_K} AS target_arm,
         CAST(floor(value * 100) AS BIGINT) AS reward
  FROM events
),
a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN logged_arm = target_arm THEN 1 ELSE 0 END)
              AS BIGINT) AS n_match,
         CAST(sum(CASE WHEN logged_arm = target_arm THEN reward
                  ELSE 0 END) AS BIGINT) AS mr
  FROM e GROUP BY 1
)
SELECT event_type, n, n_match,
       round(CAST(mr AS DOUBLE)
             / ({1.0 / _IPS_K!r} * CAST(n AS DOUBLE)), 6) AS ips_value,
       round(CASE WHEN n_match > 0
                  THEN CAST(mr AS DOUBLE) / CAST(n_match AS DOUBLE)
             END, 6) AS snips_value
FROM a ORDER BY event_type
"""

QUERIES_ML["offline_policy"] = q_offline_policy
ORACLES_ML["offline_policy"] = SQL_OFFLINE_POLICY


_CONF_ALPHA = 0.1


def q_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per event type: the
    calibration-mean predictor gets a distribution-free +/- q_hat
    band at 90% nominal coverage, and the held-out split reports the
    empirical coverage (operators/stats.split_conformal_intervals).
    Split = md5 grid (80/20)."""
    from ..operators.stats import split_conformal_intervals

    e = load_events(spark, sf_dir).select(
        "event_type", "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.when(
            (
                F.conv(F.substring(
                    F.md5(F.concat(F.lit("cal#"),
                                   F.col("event_id").cast("string"))),
                    1, 14,
                ), 16, 10).cast("long") % 5
            ) == 0,
            1,
        ).otherwise(0).alias("split"),
    )
    means = (
        e.filter(F.col("split") == 0)
        .groupBy("event_type")
        .agg(
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("pred")
        )
    )
    joined = e.join(F.broadcast(means), "event_type")
    return split_conformal_intervals(
        joined, ["event_type"], "pred", "cents", "split", "event_id",
        alpha=_CONF_ALPHA,
    ).orderBy("event_type")


def _conformal_sql() -> str:
    one_m_a = round((1.0 - _CONF_ALPHA) * 10**9)
    return f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         CASE WHEN ('0x' || substr(md5('cal#' || CAST(event_id AS VARCHAR)),
                                   1, 14))::BIGINT % 5 = 0
              THEN 1 ELSE 0 END AS split
  FROM events
),
m AS (
  SELECT event_type,
         CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pred
  FROM e WHERE split = 0 GROUP BY 1
),
cal AS (
  SELECT e.event_type, abs(CAST(cents AS DOUBLE) - pred) AS s, event_id
  FROM e JOIN m USING (event_type) WHERE split = 0
),
r AS (
  SELECT event_type, s,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS ncal
  FROM cal
),
q AS (
  SELECT event_type, max(s) AS qhat
  FROM r
  WHERE rk = ((ncal + 1) * {one_m_a} + 999999999) // 1000000000
  GROUP BY 1
),
qf AS (
  SELECT nc.event_type, nc.n_cal, q.qhat
  FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
        FROM cal GROUP BY 1) nc
  LEFT JOIN q USING (event_type)
),
t AS (
  SELECT e.event_type, abs(CAST(cents AS DOUBLE) - pred) AS s
  FROM e JOIN m USING (event_type) WHERE split = 1
),
cov AS (
  SELECT t.event_type,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN t.s <= qf.qhat THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM t JOIN qf USING (event_type) GROUP BY 1
)
SELECT qf.event_type, qf.n_cal,
       coalesce(cov.n_test, 0) AS n_test,
       round(qf.qhat, 6) AS q_hat,
       round(CASE WHEN cov.n_test > 0 AND qf.qhat IS NOT NULL
                  THEN CAST(cov.c AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
             END, 6) AS coverage
FROM qf LEFT JOIN cov USING (event_type)
ORDER BY event_type
"""


SQL_CONFORMAL_INTERVALS = _conformal_sql()
QUERIES_ML["conformal_intervals"] = q_conformal_intervals
ORACLES_ML["conformal_intervals"] = SQL_CONFORMAL_INTERVALS


def q_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test + MDE on the ab_lift experiment readout
    (same md5 arms, same high-value-purchase conversion): is the lift
    significant, and what lift was detectable at this n
    (operators/stats.two_proportion_ztest)?"""
    from ..operators.stats import two_proportion_ztest

    e = load_events(spark, sf_dir).select("user_id", "event_type", "value")
    arm = (
        F.conv(F.substring(F.md5(F.concat(F.lit("exp1#"),
                                          F.col("user_id").cast("string"))),
                           1, 14), 16, 10).cast("long") % 2
    )
    per_user = (
        e.withColumn("arm", arm)
        .groupBy("arm", "user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150), 1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return two_proportion_ztest(per_user, "arm", "converted")


SQL_AB_ZTEST = """
WITH per_user AS (
  SELECT ('0x' || substr(md5('exp1#' || CAST(user_id AS VARCHAR)),
                         1, 14))::BIGINT % 2 AS arm,
         user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_c,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_t
  FROM per_user
),
b AS (
  SELECT *,
         CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS p_c,
         CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS p_t,
         CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE) AS pp
  FROM a
),
c AS (
  SELECT *,
         sqrt(pp * (1.0 - pp)
              * (1.0 / CAST(n_c AS DOUBLE)
                 + 1.0 / CAST(n_t AS DOUBLE))) AS se,
         (n_c > 0 AND n_t > 0 AND pp > 0 AND pp < 1) AS ok
  FROM b
)
SELECT n_c, conv_c, n_t, conv_t,
       round(CASE WHEN n_c > 0 THEN p_c END, 6) AS rate_c,
       round(CASE WHEN n_t > 0 THEN p_t END, 6) AS rate_t,
       round(CASE WHEN ok THEN (p_t - p_c) / se END, 6) AS z,
       CASE WHEN ok THEN abs((p_t - p_c) / se) > 1.959964 END AS sig_95,
       CASE WHEN ok THEN abs((p_t - p_c) / se) > 2.575829 END AS sig_99,
       round(CASE WHEN ok THEN (1.959964 + 0.841621) * se END, 6)
         AS mde_80
FROM c
"""

QUERIES_ML["ab_ztest"] = q_ab_ztest
ORACLES_ML["ab_ztest"] = SQL_AB_ZTEST


_NEY_BUDGET = 100


def q_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling of documents by source on
    the n_chars metric: allocation table + realized deterministic
    sample sizes (operators/curation.neyman_allocation)."""
    from ..operators.curation import neyman_allocation

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    sampled, alloc = neyman_allocation(
        d, ["source"], "n_chars", budget=_NEY_BUDGET, id_col="doc_id"
    )
    realized = sampled.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("sampled_n")
    )
    return (
        alloc.join(realized, "source", "left")
        .select(
            "source", "n_rows", F.round("stddev", 6).alias("stddev"),
            "alloc", "rate_ppm",
            F.coalesce("sampled_n", F.lit(0).cast("long"))
            .alias("sampled_n"),
        )
        .orderBy("source")
    )


SQL_NEYMAN_SAMPLE = f"""
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx
  FROM documents GROUP BY 1
),
q AS (
  SELECT source, n_rows,
         CAST(round(sqrt(greatest(
           CASE WHEN n_rows > 1
                THEN CAST(n_rows * sxx - sx * sx AS DOUBLE)
                     / CAST(n_rows * CAST(n_rows - 1 AS HUGEINT)
                            AS DOUBLE)
                ELSE 0.0 END, 0.0)) * 1e6) AS BIGINT) AS sdq
  FROM s
),
t AS (SELECT CAST(sum(n_rows * sdq) AS BIGINT) AS tot FROM q),
alloc AS (
  SELECT source, n_rows,
         CAST(sdq AS DOUBLE) / 1e6 AS stddev,
         least(n_rows,
               CASE WHEN tot > 0
                    THEN CAST(round({float(_NEY_BUDGET)!r}
                              * CAST(n_rows * sdq AS DOUBLE)
                              / CAST(tot AS DOUBLE)) AS BIGINT)
                    ELSE 0 END) AS alloc
  FROM q CROSS JOIN t
),
alloc2 AS (
  SELECT *,
         CAST(round(CAST(alloc AS DOUBLE)
                    / CAST(n_rows AS DOUBLE) * 1e6) AS BIGINT)
           AS rate_ppm
  FROM alloc
),
realized AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS sampled_n
  FROM documents d JOIN alloc2 USING (source)
  WHERE ('0x' || substr(md5('ney#' || CAST(doc_id AS VARCHAR)),
                        1, 14))::BIGINT % 1000000 < rate_ppm
  GROUP BY 1
)
SELECT a.source, a.n_rows, round(a.stddev, 6) AS stddev, a.alloc,
       a.rate_ppm, coalesce(r.sampled_n, 0) AS sampled_n
FROM alloc2 a LEFT JOIN realized r USING (source)
ORDER BY a.source
"""

QUERIES_ML["neyman_sample"] = q_neyman_sample
ORACLES_ML["neyman_sample"] = SQL_NEYMAN_SAMPLE


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between md5 arms on time-to-first-purchase:
    duration runs from a user's first event to their first purchase
    (event) or to their last active day (censored — the user left
    without converting). Null-true arms, so the test exercises the
    full censoring machinery without a planted effect
    (operators/stats.logrank_test)."""
    from ..operators.stats import logrank_test

    e = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.expr("ts_ms div 86400000").alias("day")
    )
    u = e.groupBy("user_id").agg(
        F.min("day").alias("f"),
        F.max("day").alias("l"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("day"))
        ).alias("p"),
    )
    s = u.select(
        (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("lr#"),
                               F.col("user_id").cast("string"))), 1, 14
            ), 16, 10).cast("long") % 2
        ).cast("int").alias("arm"),
        (
            F.coalesce(F.col("p"), F.col("l")) - F.col("f") + 1
        ).cast("long").alias("dur"),
        F.col("p").isNotNull().cast("int").alias("ev"),
    )
    return logrank_test(s, "dur", "ev", "arm")


SQL_LOGRANK_TEST = """
WITH e AS (
  SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS day
  FROM events
),
u AS (
  SELECT user_id, min(day) AS f, max(day) AS l,
         min(CASE WHEN event_type = 'purchase' THEN day END) AS p
  FROM e GROUP BY 1
),
s AS (
  SELECT CAST(('0x' || substr(md5('lr#' || CAST(user_id AS VARCHAR)),
                              1, 14))::BIGINT % 2 AS INTEGER) AS arm,
         CAST(coalesce(p, l) - f + 1 AS BIGINT) AS dur,
         CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
at AS (
  SELECT dur AS t,
         CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
         CAST(sum(ev) AS BIGINT) AS d_all,
         CAST(sum(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT) AS d_1
  FROM s GROUP BY 1
),
risk AS (
  SELECT t, d_all, d_1,
         sum(n_all) OVER (ORDER BY t DESC) AS nj,
         sum(n_1) OVER (ORDER BY t DESC) AS n1j
  FROM at
),
terms AS (
  SELECT d_1,
         CAST(round(CAST(d_all AS DOUBLE) * CAST(n1j AS DOUBLE)
                    / CAST(nj AS DOUBLE) * 1000000000.0) AS BIGINT)
           AS eq,
         CAST(round(CASE WHEN nj > 1
              THEN CAST(d_all AS DOUBLE)
                   * (CAST(n1j AS DOUBLE) / CAST(nj AS DOUBLE))
                   * (1.0 - CAST(n1j AS DOUBLE) / CAST(nj AS DOUBLE))
                   * (CAST(nj AS DOUBLE) - CAST(d_all AS DOUBLE))
                   / (CAST(nj AS DOUBLE) - 1.0)
              ELSE 0.0 END * 1000000000.0) AS BIGINT) AS vq
  FROM risk WHERE d_all > 0
),
agg AS (
  SELECT CAST(sum(d_1) AS BIGINT) AS o1,
         CAST(sum(eq) AS BIGINT) AS e1q,
         CAST(sum(vq) AS BIGINT) AS vq
  FROM terms
),
counts AS (
  SELECT
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm0,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm1,
    CAST(sum(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT)
      AS events_arm0,
    CAST(sum(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT)
      AS events_arm1
  FROM s
)
SELECT n_arm0, n_arm1, events_arm0, events_arm1, o1,
       round(CAST(e1q AS DOUBLE) / 1000000000.0, 6) AS e1,
       round(CAST(vq AS DOUBLE) / 1000000000.0, 6) AS v,
       round(CASE WHEN vq > 0 THEN
         (CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1000000000.0)
         * (CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1000000000.0)
         / (CAST(vq AS DOUBLE) / 1000000000.0) END, 6) AS chi2,
       CASE WHEN vq > 0 THEN
         (CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1000000000.0)
         * (CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1000000000.0)
         / (CAST(vq AS DOUBLE) / 1000000000.0) > 3.841459 END AS sig_95,
       CASE WHEN vq > 0 THEN
         (CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1000000000.0)
         * (CAST(o1 AS DOUBLE) - CAST(e1q AS DOUBLE) / 1000000000.0)
         / (CAST(vq AS DOUBLE) / 1000000000.0) > 6.634897 END AS sig_99
FROM counts CROSS JOIN agg
"""

QUERIES_ML["logrank_test"] = q_logrank_test
ORACLES_ML["logrank_test"] = SQL_LOGRANK_TEST


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum test of per-user purchase revenue between the md5
    experiment arms — the nonparametric companion of ab_ztest for the
    heavy-tailed metric (operators/stats.mann_whitney_u)."""
    from ..operators.stats import mann_whitney_u

    e = load_events(spark, sf_dir)
    arm = (
        F.conv(F.substring(F.md5(F.concat(F.lit("exp1#"),
                                          F.col("user_id").cast("string"))),
                           1, 14), 16, 10).cast("long") % 2
    )
    per_user = (
        e.withColumn("arm", arm)
        .groupBy("arm", "user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("cents")
        )
    )
    return mann_whitney_u(per_user, "cents", "arm")


SQL_MANN_WHITNEY = """
WITH pu AS (
  SELECT ('0x' || substr(md5('exp1#' || CAST(user_id AS VARCHAR)),
                         1, 14))::BIGINT % 2 AS arm,
         user_id,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100) AS BIGINT)
                  ELSE 0 END) AS cents
  FROM events GROUP BY 1, 2
),
per_value AS (
  SELECT cents AS v,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM pu GROUP BY 1
),
cum AS (
  SELECT v, c0, c1,
         sum(c0 + c1) OVER (ORDER BY v) - (c0 + c1) AS cum_lt
  FROM per_value
),
agg AS (
  SELECT CAST(sum(CAST(c1 AS HUGEINT)
                  * (2 * CAST(cum_lt AS HUGEINT) + (c0 + c1) + 1))
              AS HUGEINT) AS r1x2,
         CAST(sum(CAST(c0 + c1 AS HUGEINT) * (c0 + c1) * (c0 + c1)
                  - (c0 + c1)) AS HUGEINT) AS tie,
         CAST(sum(c0) AS BIGINT) AS n0,
         CAST(sum(c1) AS BIGINT) AS n1
  FROM cum
),
fin AS (
  SELECT n0, n1,
         (CAST(r1x2 AS DOUBLE)
          - CAST(n1 * (n1 + 1) AS DOUBLE)) / 2.0 AS u1,
         CAST(n0 * n1 AS DOUBLE) / 2.0 AS mu,
         CAST(n0 * n1 AS DOUBLE) / 12.0
           * (CAST(n0 + n1 + 1 AS DOUBLE)
              - CAST(tie AS DOUBLE)
                / CAST((n0 + n1) * CAST(n0 + n1 - 1 AS HUGEINT)
                       AS DOUBLE)) AS var
  FROM agg
)
SELECT n0 AS n_0, n1 AS n_1,
       round(u1, 6) AS u1,
       round(CASE WHEN var > 0 THEN (u1 - mu) / sqrt(var) END, 6) AS z,
       CASE WHEN var > 0
            THEN abs((u1 - mu) / sqrt(var)) > 1.959964 END AS sig_95,
       CASE WHEN var > 0
            THEN abs((u1 - mu) / sqrt(var)) > 2.575829 END AS sig_99
FROM fin
"""

QUERIES_ML["mann_whitney"] = q_mann_whitney
ORACLES_ML["mann_whitney"] = SQL_MANN_WHITNEY


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity of the customer table: quasi-identifier =
    (mktsegment, nationkey), sensitive = account-balance sign bucket
    (operators/privacy.l_diversity_report) — the leak k-anonymity
    misses when a whole group shares one sensitive value."""
    from ..operators.privacy import l_diversity_report

    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey",
        F.when(F.col("c_acctbal") < 0, F.lit("debt"))
        .when(F.col("c_acctbal") < 5000, F.lit("low"))
        .otherwise(F.lit("high")).alias("bal_bucket"),
    )
    return l_diversity_report(
        c, ["c_mktsegment", "c_nationkey"], "bal_bucket", l_min=3
    ).orderBy("c_mktsegment", "c_nationkey")


SQL_L_DIVERSITY = """
WITH c AS (
  SELECT c_mktsegment, c_nationkey,
         CASE WHEN c_acctbal < 0 THEN 'debt'
              WHEN c_acctbal < 5000 THEN 'low'
              ELSE 'high' END AS bal_bucket
  FROM customer
),
per_val AS (
  SELECT c_mktsegment, c_nationkey, bal_bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2, 3
),
totals AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS distinct_sensitive
  FROM per_val GROUP BY 1, 2
),
ent AS (
  SELECT p.c_mktsegment, p.c_nationkey,
         CAST(sum(CAST(round(
           -(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE))
           * ln(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS hq
  FROM per_val p
  JOIN totals t ON p.c_mktsegment = t.c_mktsegment
               AND p.c_nationkey = t.c_nationkey
  GROUP BY 1, 2
)
SELECT t.c_mktsegment, t.c_nationkey, t.n_rows, t.distinct_sensitive,
       round(CAST(e.hq AS DOUBLE) / 1000000000.0, 6) AS entropy,
       t.distinct_sensitive >= 3 AS is_diverse
FROM totals t
JOIN ent e ON t.c_mktsegment = e.c_mktsegment
          AND t.c_nationkey = e.c_nationkey
ORDER BY t.c_mktsegment, t.c_nationkey
"""

QUERIES_ML["l_diversity"] = q_l_diversity
ORACLES_ML["l_diversity"] = SQL_L_DIVERSITY


def q_dr_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy value next to its IPS companion: the
    reward model is each event type's integer mean cents (computed
    once, broadcast back as the baseline), arms as in offline_policy
    (operators/stats.dr_policy_value)."""
    from ..operators.stats import dr_policy_value

    e = load_events(spark, sf_dir).select(
        "event_type",
        (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("log#"),
                               F.col("event_id").cast("string"))), 1, 14
            ), 16, 10).cast("long") % 4
        ).alias("logged_arm"),
        (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("tgt#"),
                               F.col("user_id").cast("string"))), 1, 14
            ), 16, 10).cast("long") % 4
        ).alias("target_arm"),
        F.floor(F.col("value") * 100).cast("long").alias("reward"),
    )
    model = e.groupBy(F.col("event_type").alias("_et")).agg(
        F.expr("sum(reward) div count(1)").cast("long").alias("baseline")
    )
    j = e.join(
        F.broadcast(model), e.event_type == model._et
    ).drop("_et")
    return dr_policy_value(
        j, "logged_arm", "target_arm", "reward", "baseline",
        propensity=0.25, group_cols=["event_type"],
    ).orderBy("event_type")


SQL_DR_POLICY = """
WITH e AS (
  SELECT event_type,
         ('0x' || substr(md5('log#' || CAST(event_id AS VARCHAR)),
                         1, 14))::BIGINT % 4 AS logged_arm,
         ('0x' || substr(md5('tgt#' || CAST(user_id AS VARCHAR)),
                         1, 14))::BIGINT % 4 AS target_arm,
         CAST(floor(value * 100) AS BIGINT) AS reward
  FROM events
),
model AS (
  SELECT event_type, CAST(sum(reward) // count(*) AS BIGINT) AS baseline
  FROM e GROUP BY 1
),
j AS (SELECT e.*, m.baseline FROM e JOIN model m USING (event_type)),
a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN logged_arm = target_arm THEN 1 ELSE 0 END)
              AS BIGINT) AS n_match,
         CAST(sum(baseline) AS BIGINT) AS bsum,
         CAST(sum(CASE WHEN logged_arm = target_arm
                  THEN reward - baseline ELSE 0 END) AS BIGINT) AS corr,
         CAST(sum(CASE WHEN logged_arm = target_arm THEN reward
                  ELSE 0 END) AS BIGINT) AS mr
  FROM j GROUP BY 1
)
SELECT event_type, n, n_match,
       round(CAST(bsum AS DOUBLE) / CAST(n AS DOUBLE)
             + CAST(corr AS DOUBLE) / (0.25 * CAST(n AS DOUBLE)), 6)
         AS dr_value,
       round(CAST(mr AS DOUBLE) / (0.25 * CAST(n AS DOUBLE)), 6)
         AS ips_value
FROM a ORDER BY event_type
"""

QUERIES_ML["dr_policy"] = q_dr_policy
ORACLES_ML["dr_policy"] = SQL_DR_POLICY


def q_als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 ALS over the (customer, part, quantity) purchase matrix
    — matrix factorization with a full bit-exact oracle thanks to the
    10^6 factor grid (operators/recsys.als_rank1): item factors plus
    the final training RMSE."""
    from ..operators.recsys import als_rank1

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    r = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
        F.floor("l_quantity").cast("long").alias("qty"),
    )
    return als_rank1(r, "user_id", "item_id", "qty", rounds=2).orderBy(
        "item_id"
    )


SQL_ALS_RANK1 = """
WITH r AS (
  SELECT o_custkey AS u, l_partkey AS i,
         CAST(floor(l_quantity) AS BIGINT) AS rr
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS vq FROM r),
u1 AS (
  SELECT u, CAST(round(CAST(sum(CAST(rr AS HUGEINT) * vq) AS DOUBLE)
                       * 1000000000000.0
                       / CAST(sum(CAST(vq AS HUGEINT) * vq) AS DOUBLE))
            AS BIGINT) AS uq
  FROM r JOIN v0 USING (i) GROUP BY u
),
v1 AS (
  SELECT i, CAST(round(CAST(sum(CAST(rr AS HUGEINT) * uq) AS DOUBLE)
                       * 1000000000000.0
                       / CAST(sum(CAST(uq AS HUGEINT) * uq) AS DOUBLE))
            AS BIGINT) AS vq
  FROM r JOIN u1 USING (u) GROUP BY i
),
u2 AS (
  SELECT u, CAST(round(CAST(sum(CAST(rr AS HUGEINT) * vq) AS DOUBLE)
                       * 1000000000000.0
                       / CAST(sum(CAST(vq AS HUGEINT) * vq) AS DOUBLE))
            AS BIGINT) AS uq
  FROM r JOIN v1 USING (i) GROUP BY u
),
v2 AS (
  SELECT i, CAST(round(CAST(sum(CAST(rr AS HUGEINT) * uq) AS DOUBLE)
                       * 1000000000000.0
                       / CAST(sum(CAST(uq AS HUGEINT) * uq) AS DOUBLE))
            AS BIGINT) AS vq
  FROM r JOIN u2 USING (u) GROUP BY i
),
e AS (
  SELECT CAST(rr AS HUGEINT) * 1000000 * 1000000
         - CAST(u2.uq AS HUGEINT) * v2.vq AS e12
  FROM r JOIN u2 USING (u) JOIN v2 USING (i)
),
sse AS (
  SELECT round(sqrt(CAST(sum(e12 * e12) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE))
               / (1000000.0 * 1000000.0), 6) AS train_rmse
  FROM e
)
SELECT i AS item_id, vq AS v_q,
       round(CAST(vq AS DOUBLE) / 1000000.0, 6) AS v_factor,
       train_rmse
FROM v2 CROSS JOIN sse
ORDER BY item_id
"""

QUERIES_ML["als_rank1"] = q_als_rank1
ORACLES_ML["als_rank1"] = SQL_ALS_RANK1


_RRF_K, _RRF_TOP = 60, 5


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two deterministic pseudo-rankers over
    documents per source (operators/recsys.reciprocal_rank_fusion):
    the rank-only ensembling used to merge BM25 with embedding
    retrieval — exact BIGINT fused scores on the 2^40 grid."""
    from ..operators.recsys import reciprocal_rank_fusion

    d = load_table(spark, sf_dir, "documents").select("source", "doc_id")

    def ranker(tag: str) -> DataFrame:
        return d.select(
            "source", "doc_id",
            (
                F.conv(F.substring(
                    F.md5(F.concat(F.lit(tag),
                                   F.col("doc_id").cast("string"))), 1, 10
                ), 16, 10).cast("long") % 1000000
            ).alias("score"),
        )

    return reciprocal_rank_fusion(
        [ranker("m1#"), ranker("m2#")],
        ["source"], "doc_id", "score", k=_RRF_K, top_n=_RRF_TOP,
    ).orderBy("source", "fused_rank")


def _rrf_sql() -> str:
    from ..operators.recsys import RRF_GRID

    leg = """
  SELECT source, doc_id,
         CAST(round({grid} / ({k} + CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5('{tag}' || CAST(doc_id AS VARCHAR)),
                                    1, 10))::BIGINT % 1000000 DESC,
                    doc_id ASC) AS DOUBLE))) AS BIGINT) AS w
  FROM documents"""
    legs = " UNION ALL ".join(
        leg.format(grid=float(RRF_GRID), k=float(_RRF_K), tag=t)
        for t in ("m1#", "m2#")
    )
    return f"""
WITH un AS ({legs}),
fused AS (
  SELECT source, doc_id,
         CAST(count(*) AS BIGINT) AS n_rankers,
         CAST(sum(w) AS BIGINT) AS fused_q
  FROM un GROUP BY 1, 2
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY source
                            ORDER BY fused_q DESC, doc_id ASC)
           AS fused_rank
  FROM fused
)
SELECT source, doc_id, n_rankers, fused_q,
       round(CAST(fused_q AS DOUBLE) / {float(RRF_GRID)!r}, 6)
         AS rrf_score,
       fused_rank
FROM ranked WHERE fused_rank <= {_RRF_TOP}
ORDER BY source, fused_rank
"""


SQL_RRF_FUSION = _rrf_sql()
QUERIES_ML["rrf_fusion"] = q_rrf_fusion
ORACLES_ML["rrf_fusion"] = SQL_RRF_FUSION


def q_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: the Fellegi-Sunter pair screen
    (fs_linkage's exact scores/threshold) feeds star-contraction
    connected components — scored PAIRS become entity CLUSTERS, the
    composition a dedupe pipeline actually ships. Output: one row per
    member of a non-singleton cluster (entity_id, component,
    cluster_size)."""
    from ..operators.graph import connected_components_star
    from ..operators.linkage import fs_field_u_multi, fs_link_scores

    r = _fs_records(spark, sf_dir)
    u = fs_field_u_multi(r, list(_FS_M))
    pairs = fs_link_scores(
        r, "blk", _FS_M, u,
        id_col="id", threshold=_FS_THRESHOLD,
        max_block_size=_FS_MAX_BLOCK,
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components_star(pairs, id_out="entity_id",
                                     comp_out="component")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .filter(F.col("cluster_size") > 1)
        .select("entity_id", "component", "cluster_size")
        .orderBy("component", "entity_id")
    )


def _linkage_clusters_sql() -> str:
    # the fs_linkage pair SQL (verbatim construction) + a recursive
    # min-label closure (the identity_stitching oracle pattern)
    base = SQL_FS_LINKAGE.strip().rstrip()
    return f"""
WITH RECURSIVE fs_pairs AS ({base}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM fs_pairs
  UNION
  SELECT id_b, id_a FROM fs_pairs
),
reach(id, root) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
),
lab AS (SELECT id, min(root) AS component FROM reach GROUP BY id),
sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
  FROM lab GROUP BY 1
)
SELECT lab.id AS entity_id, lab.component, sizes.cluster_size
FROM lab JOIN sizes USING (component)
WHERE sizes.cluster_size > 1
ORDER BY component, entity_id
"""


SQL_LINKAGE_CLUSTERS = _linkage_clusters_sql()
QUERIES_ML["linkage_clusters"] = q_linkage_clusters
ORACLES_ML["linkage_clusters"] = SQL_LINKAGE_CLUSTERS


def q_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of daily revenue: robust linear trend
    (the theil_sen coefficients, reported grain), day-of-week seasonal
    medians of the detrended series, and the remainder — per day:
    (day, cents, trend, seasonal, remainder). Bounded day series (the
    CUSUM contract); medians by the theil_sen even/odd rank rule.

    Driver contract (CORRECTNESS_r08): trend/seasonal/remainder are
    emitted on the 1e6 BIGINT grid (the did_event_study gapq pattern)
    so the driver hashes pure integers — the r8 red was a double/
    HUGEINT representation gap, not a value mismatch (Spark and DuckDB
    agree repr-level at sf0.001/0.01/0.1)."""
    from ..operators.anomaly import theil_sen_trend

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ms div 86400000").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    ).localCheckpoint(eager=False)
    fit = theil_sen_trend(daily, "day", "cents").select(
        "slope", "intercept"
    )
    det = daily.crossJoin(F.broadcast(fit)).select(
        "day", "cents", "slope", "intercept",
        (
            F.col("cents").cast("double")
            - (F.col("slope") * F.col("day").cast("double")
               + F.col("intercept"))
        ).alias("_det"),
        (F.col("day") % 7).alias("_dow"),
    )
    w = Window.partitionBy("_dow").orderBy("_det", "day")
    ranked = det.select(
        "*",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy("_dow")).alias("_n"),
    )
    med = ranked.filter(
        (F.col("_rk") * 2 == F.col("_n"))
        | (F.col("_rk") * 2 == F.col("_n") + 1)
        | (F.col("_rk") * 2 == F.col("_n") + 2)
    ).groupBy("_dow").agg(
        (F.sum("_det") / F.count(F.lit(1))).alias("_seasonal")
    )
    return (
        det.join(F.broadcast(med), "_dow")
        .select(
            "day", "cents",
            F.round(
                (F.col("slope") * F.col("day").cast("double")
                 + F.col("intercept")) * 1e6
            ).cast("long").alias("trend"),
            F.round(F.col("_seasonal") * 1e6).cast("long")
            .alias("seasonal"),
            F.round((F.col("_det") - F.col("_seasonal")) * 1e6)
            .cast("long").alias("remainder"),
        )
        .orderBy("day")
    )


SQL_TS_DECOMPOSE = """
WITH d AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
p AS (
  SELECT a.day AS ti, b.day AS tj,
         CAST(b.cents - a.cents AS DOUBLE)
           / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM d a JOIN d b ON a.day < b.day
),
r AS (
  SELECT slope, ti, tj,
         row_number() OVER (ORDER BY slope, ti, tj) AS rn,
         count(*) OVER () AS np
  FROM p
),
ms AS (
  SELECT sum(slope) / count(*) AS slope
  FROM r WHERE rn * 2 = np OR rn * 2 = np + 1 OR rn * 2 = np + 2
),
res AS (
  SELECT CAST(d.cents AS DOUBLE) - ms.slope * CAST(d.day AS DOUBLE) AS r,
         d.day, ms.slope
  FROM d CROSS JOIN ms
),
r2 AS (
  SELECT r, slope, row_number() OVER (ORDER BY r, day) AS rn,
         count(*) OVER () AS n
  FROM res
),
fit AS (
  SELECT round(max(slope), 6) AS slope,
         round(sum(r) / count(*), 6) AS intercept
  FROM r2 WHERE rn * 2 = n OR rn * 2 = n + 1 OR rn * 2 = n + 2
),
det AS (
  SELECT d.day, d.cents, fit.slope, fit.intercept,
         CAST(d.cents AS DOUBLE)
           - (fit.slope * CAST(d.day AS DOUBLE) + fit.intercept) AS dt,
         d.day % 7 AS dow
  FROM d CROSS JOIN fit
),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY dow ORDER BY dt, day) AS rn,
         count(*) OVER (PARTITION BY dow) AS n
  FROM det
),
med AS (
  SELECT dow, sum(dt) / count(*) AS seasonal
  FROM rk WHERE rn * 2 = n OR rn * 2 = n + 1 OR rn * 2 = n + 2
  GROUP BY 1
)
SELECT det.day, CAST(det.cents AS BIGINT) AS cents,
       CAST(round((det.slope * CAST(det.day AS DOUBLE) + det.intercept)
                  * 1e6) AS BIGINT) AS trend,
       CAST(round(med.seasonal * 1e6) AS BIGINT) AS seasonal,
       CAST(round((det.dt - med.seasonal) * 1e6) AS BIGINT) AS remainder
FROM det JOIN med USING (dow)
ORDER BY det.day
"""

QUERIES_ML["ts_decompose"] = q_ts_decompose
ORACLES_ML["ts_decompose"] = SQL_TS_DECOMPOSE


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the pseudo-model from
    calibration_report's family: md5-grid scores vs a correlated
    deterministic outcome, fit via the exact minimax closed form over
    10 score bins (operators/stats.isotonic_calibrate)."""
    from ..operators.stats import isotonic_calibrate

    e = load_events(spark, sf_dir).select(
        (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("sc#"),
                               F.col("event_id").cast("string"))), 1, 10
            ), 16, 10).cast("long") % 1000000
        ).alias("score"),
        "event_id",
    ).select(
        "score",
        # outcome correlated with score: positive when a second hash
        # lands under a score-dependent threshold
        (
            (
                F.conv(F.substring(
                    F.md5(F.concat(F.lit("y#"),
                                   F.col("event_id").cast("string"))),
                    1, 10,
                ), 16, 10).cast("long") % 1000000
            ) < (F.col("score") / 2 + 100000)
        ).cast("long").alias("y"),
    )
    return isotonic_calibrate(e, "score", "y", n_bins=10).orderBy("bin")


SQL_ISOTONIC_CALIBRATION = """
WITH e AS (
  SELECT ('0x' || substr(md5('sc#' || CAST(event_id AS VARCHAR)),
                         1, 10))::BIGINT % 1000000 AS score,
         event_id
  FROM events
),
l AS (
  SELECT score,
         CASE WHEN ('0x' || substr(md5('y#' || CAST(event_id AS VARCHAR)),
                                   1, 10))::BIGINT % 1000000
                   < (score / 2 + 100000)
              THEN 1 ELSE 0 END AS y
  FROM e
),
b AS (
  SELECT least(9, score // 100000) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS pos
  FROM l GROUP BY 1
),
pre AS (
  SELECT bin, n, pos,
         sum(n) OVER (ORDER BY bin) AS cn,
         sum(pos) OVER (ORDER BY bin) AS cp
  FROM b
),
ranges AS (
  SELECT j.bin AS j, k.bin AS k,
         CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
           / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS avg_jk
  FROM pre j JOIN pre k ON j.bin <= k.bin
),
inner_mn AS (
  SELECT i.bin AS i, r.j, min(r.avg_jk) AS mn
  FROM pre i JOIN ranges r ON r.j <= i.bin AND r.k >= i.bin
  GROUP BY 1, 2
),
iso AS (SELECT i, max(mn) AS iso FROM inner_mn GROUP BY 1)
SELECT pre.bin, pre.n,
       round(CAST(pre.pos AS DOUBLE) / CAST(pre.n AS DOUBLE), 6) AS rate,
       round(iso.iso, 6) AS iso_rate
FROM pre JOIN iso ON iso.i = pre.bin
ORDER BY pre.bin
"""

QUERIES_ML["isotonic_calibration"] = q_isotonic_calibration
ORACLES_ML["isotonic_calibration"] = SQL_ISOTONIC_CALIBRATION


def q_eb_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user high-value-purchase rates
    (operators/stats.eb_beta_binomial_smooth): small-sample users pull
    toward the method-of-moments beta prior instead of topping the
    leaderboard on 2-of-2 luck."""
    from ..operators.stats import eb_beta_binomial_smooth

    e = load_events(spark, sf_dir)
    per_user = e.groupBy(F.col("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150), 1,
            ).otherwise(0)
        ).cast("long").alias("n_highval"),
    )
    return eb_beta_binomial_smooth(
        per_user, ["user_id"], "n_events", "n_highval"
    ).orderBy("user_id")


SQL_EB_SMOOTHING = """
WITH per_user AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' AND value > 150
                  THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM events GROUP BY 1
),
base AS (
  SELECT user_id, n, pos,
         CAST(round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                    * 1000000000.0) AS BIGINT) AS rq
  FROM per_user
),
pri AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(rq AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(rq AS HUGEINT) * CAST(rq AS HUGEINT)) AS HUGEINT) AS s2
  FROM base
),
pm AS (
  SELECT k,
         CAST(s AS DOUBLE) / CAST(k AS DOUBLE) / 1000000000.0 AS m,
         CASE WHEN k > 1 THEN
           (CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0))
           / 1e18
         END AS v
  FROM pri
),
pc AS (
  SELECT m, v,
         CASE WHEN v > 0 AND (m * (1.0 - m) / v - 1.0) > 0
              THEN m * (1.0 - m) / v - 1.0 END AS c
  FROM pm
)
SELECT user_id, n, pos,
       round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       round(CASE WHEN c IS NOT NULL THEN
               (CAST(pos AS DOUBLE) + m * c)
               / (CAST(n AS DOUBLE) + m * c + (1.0 - m) * c)
             ELSE CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
         AS smoothed
FROM base CROSS JOIN pc
ORDER BY user_id
"""

QUERIES_ML["eb_smoothing"] = q_eb_smoothing
ORACLES_ML["eb_smoothing"] = SQL_EB_SMOOTHING


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling one-step-ahead backtest: MAE + MAPE of the Holt linear
    and Holt-Winters seasonal forecasters' published fit rows over the
    SAME days — the model-selection readout (seasonal should win when
    a weekly cycle exists). Pure composition over the two operators'
    outputs; exact integer |error| sums on the rounded-fit grain."""
    from ..operators.anomaly import holt_forecast, holt_winters_forecast

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ms div 86400000").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    ).localCheckpoint(eager=False)

    def errors(df: DataFrame, name: str) -> DataFrame:
        # |error| terms quantized to integer grids BEFORE the
        # cross-day sums (the addition-order-free convention)
        f = df.filter(F.col("kind") == "fit")
        ae = F.abs(F.col("actual").cast("double") - F.col("predicted"))
        return f.select(
            F.lit(name).alias("model"),
            F.col("day"),
            F.round(ae * 1e6).cast("long").alias("_aeq"),
            F.round(ae / F.col("actual").cast("double") * 1e9)
            .cast("long").alias("_apeq"),
        )
    h = errors(
        holt_forecast(daily, "day", "cents", alpha=0.3, beta=0.1,
                      horizon=0),
        "holt",
    )
    hw = errors(
        holt_winters_forecast(daily, "day", "cents", alpha=0.3, beta=0.1,
                              gamma=0.2, season=7, horizon=7),
        "holt_winters",
    )
    # compare on the COMMON fit days (HW starts after 2 seasons)
    common = hw.select("day").distinct()
    both = h.join(common, "day").unionByName(hw.join(common, "day"))
    return (
        both.groupBy("model")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.sum("_aeq").cast("double")
                / F.count(F.lit(1)).cast("double") / F.lit(1e6), 6
            ).alias("mae"),
            F.round(
                F.sum("_apeq").cast("double")
                / F.count(F.lit(1)).cast("double") / F.lit(1e9), 6
            ).alias("mape"),
        )
        .orderBy("model")
    )


SQL_FORECAST_BACKTEST = f"""
WITH h AS (
  SELECT day, actual, predicted FROM ({SQL_HOLT_FORECAST}) WHERE kind = 'fit'
),
hw AS (
  SELECT day, actual, predicted FROM ({SQL_HOLT_WINTERS}) WHERE kind = 'fit'
),
common AS (SELECT DISTINCT day FROM hw),
allp AS (
  SELECT 'holt' AS model,
         CAST(round(abs(CAST(actual AS DOUBLE) - predicted) * 1e6)
              AS BIGINT) AS aeq,
         CAST(round(abs(CAST(actual AS DOUBLE) - predicted)
                    / CAST(actual AS DOUBLE) * 1e9) AS BIGINT) AS apeq
  FROM h JOIN common USING (day)
  UNION ALL
  SELECT 'holt_winters',
         CAST(round(abs(CAST(actual AS DOUBLE) - predicted) * 1e6)
              AS BIGINT),
         CAST(round(abs(CAST(actual AS DOUBLE) - predicted)
                    / CAST(actual AS DOUBLE) * 1e9) AS BIGINT)
  FROM hw JOIN common USING (day)
)
SELECT model,
       CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(sum(aeq) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1e6, 6) AS mae,
       round(CAST(sum(apeq) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1e9, 6) AS mape
FROM allp GROUP BY 1 ORDER BY model
"""

QUERIES_ML["forecast_backtest"] = q_forecast_backtest
ORACLES_ML["forecast_backtest"] = SQL_FORECAST_BACKTEST


def q_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table for the isotonic_calibration
    pseudo-model: per score decile (descending), the cumulative share
    of all positives captured and the lift vs random targeting — the
    campaign-targeting readout that completes the model-eval family
    (AUC ranks, ECE calibrates, gains TARGETS). Bounded-bin cumulative
    window over one hash aggregation.

    Driver contract (CORRECTNESS_r08): capture/lift emitted on the
    1e6 BIGINT grid and the cumulative sums cast BIGINT (DuckDB window
    sum over BIGINT yields HUGEINT) so the driver hashes pure integers
    — the r8 red was representation drift, values were identical."""
    e = load_events(spark, sf_dir).select(
        (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("sc#"),
                               F.col("event_id").cast("string"))), 1, 10
            ), 16, 10).cast("long") % 1000000
        ).alias("score"),
        "event_id",
    ).select(
        "score",
        (
            (
                F.conv(F.substring(
                    F.md5(F.concat(F.lit("y#"),
                                   F.col("event_id").cast("string"))),
                    1, 10,
                ), 16, 10).cast("long") % 1000000
            ) < (F.col("score") / 2 + 100000)
        ).cast("long").alias("y"),
    )
    b = e.groupBy(
        F.least(F.lit(9), F.expr("score div 100000")).alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(F.lit(1))
    return b.select(
        "decile", "n", "pos",
        F.sum("n").over(w).cast("long").alias("cum_n"),
        F.sum("pos").over(w).cast("long").alias("cum_pos"),
        F.round(
            F.sum("pos").over(w).cast("double")
            / F.sum("pos").over(tot).cast("double") * 1e6
        ).cast("long").alias("capture"),
        F.round(
            (
                F.sum("pos").over(w).cast("double")
                / F.sum("pos").over(tot).cast("double")
            )
            / (
                F.sum("n").over(w).cast("double")
                / F.sum("n").over(tot).cast("double")
            )
            * 1e6
        ).cast("long").alias("lift"),
    ).orderBy(F.col("decile").desc())


SQL_CUMULATIVE_GAINS = """
WITH e AS (
  SELECT ('0x' || substr(md5('sc#' || CAST(event_id AS VARCHAR)),
                         1, 10))::BIGINT % 1000000 AS score,
         event_id
  FROM events
),
l AS (
  SELECT score,
         CASE WHEN ('0x' || substr(md5('y#' || CAST(event_id AS VARCHAR)),
                                   1, 10))::BIGINT % 1000000
                   < (score / 2 + 100000)
              THEN 1 ELSE 0 END AS y
  FROM e
),
b AS (
  SELECT least(9, score // 100000) AS decile,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS pos
  FROM l GROUP BY 1
)
SELECT decile, n, pos,
       CAST(sum(n) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_n,
       CAST(sum(pos) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_pos,
       CAST(round(CAST(sum(pos) OVER (ORDER BY decile DESC) AS DOUBLE)
             / CAST(sum(pos) OVER () AS DOUBLE) * 1e6) AS BIGINT)
         AS capture,
       CAST(round((CAST(sum(pos) OVER (ORDER BY decile DESC) AS DOUBLE)
              / CAST(sum(pos) OVER () AS DOUBLE))
             / (CAST(sum(n) OVER (ORDER BY decile DESC) AS DOUBLE)
                / CAST(sum(n) OVER () AS DOUBLE)) * 1e6) AS BIGINT)
         AS lift
FROM b ORDER BY decile DESC
"""

QUERIES_ML["cumulative_gains"] = q_cumulative_gains
ORACLES_ML["cumulative_gains"] = SQL_CUMULATIVE_GAINS


def q_did_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study view of the did_lift experiment: per-day
    treatment-control revenue gap relative to the pre-period baseline
    (operators/stats.did_event_study). Null-true md5 arms make this
    the placebo check — effects should hover near zero on BOTH sides
    of the cutoff (the pre-trend test a pooled DiD cannot show)."""
    from ..operators.stats import did_event_study

    e = load_events(spark, sf_dir)
    treat = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit("did#"),
                           F.col("user_id").cast("string"))), 1, 14
        ), 16, 10).cast("long") % 2
    )
    unit = e.groupBy(
        F.col("user_id").alias("uid"),
        treat.alias("treat"),
        F.expr("ts_ms div 86400000").alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    return did_event_study(unit, "cents", "treat", "day", _DID_CUT_DAY)


SQL_DID_EVENT_STUDY = f"""
WITH unit AS (
  SELECT user_id AS uid,
         ('0x' || substr(md5('did#' || CAST(user_id AS VARCHAR)),
                         1, 14))::BIGINT % 2 AS treat,
         epoch_ms(ts) // 86400000 AS day,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2, 3
),
cells AS (
  SELECT day AS period,
         CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN treat = 0 THEN cents ELSE 0 END) AS BIGINT)
           AS sc,
         CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN treat = 1 THEN cents ELSE 0 END) AS BIGINT)
           AS st
  FROM unit GROUP BY 1
),
g AS (
  SELECT period, n_c, n_t,
         CASE WHEN n_c > 0 AND n_t > 0
              THEN CAST(st AS DOUBLE) / CAST(n_t AS DOUBLE)
                   - CAST(sc AS DOUBLE) / CAST(n_c AS DOUBLE) END AS gap,
         period >= {_DID_CUT_DAY} AS is_post,
         CAST(round((CASE WHEN n_c > 0 AND n_t > 0
              THEN CAST(st AS DOUBLE) / CAST(n_t AS DOUBLE)
                   - CAST(sc AS DOUBLE) / CAST(n_c AS DOUBLE) END)
              * 1e6) AS BIGINT) AS gapq
  FROM cells
),
base AS (
  SELECT CAST(sum(gapq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6
         AS b
  FROM g WHERE NOT is_post AND gapq IS NOT NULL
)
SELECT period, is_post, n_c, n_t,
       round(gap, 6) AS gap,
       round(gap - base.b, 6) AS effect
FROM g CROSS JOIN base
ORDER BY period
"""

QUERIES_ML["did_event_study"] = q_did_event_study
ORACLES_ML["did_event_study"] = SQL_DID_EVENT_STUDY
