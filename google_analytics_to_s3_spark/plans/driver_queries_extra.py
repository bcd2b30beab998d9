"""Round-continuation driver queries: embedding sign-LSH dedup, exact
dedup with a keep-best policy, GROUPING SETS, and hopping (sliding)
time-window aggregation.

Each follows the oracle-parity conventions of driver_queries.py
(identical aliases, decimal-exact sums, epoch-ms arithmetic instead of
timezone-dependent date functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import (
    PLANTED_UNION_SQL,
    planted_copies,
    random_projection,
    rhp_dup_pairs,
    rhp_planes,
)
from ..sources.testdata import (
    load_events, load_parallel, load_table, spread_if_narrow,
)

# --------------------------------------------------------------------------
# Embedding near-dup via random-hyperplane LSH (sign-LSH)
# --------------------------------------------------------------------------

# 4 bands × 16 bits: 65 536 buckets per band. At 8 bits/band the 4 000
# planted-corpus vectors averaged ~16 per bucket → 607 k candidate pairs
# to exact-verify for only 2 000 true dups; 16 bits/band cuts random
# collisions ~256× (measured: ~5 k candidates) so the verify join is
# negligible. Recall still certain: per-bit planted-pair agreement
# ≈ 0.9991 → per-band 0.9991¹⁶ ≈ 0.9857 → miss ≈ (1-0.9857)⁴ ≈ 4e-8.
# Bucket count per band should scale ~corpus size at 100 TB — that is
# this same constant, not a design change.
_RHP_BITS, _RHP_BANDS, _RHP_DIM, _RHP_T = 64, 4, 64, 0.99

# same dot-product spelling as driver_queries._COS so the fold order and
# double casts match the Spark side exactly
_DOT_LIT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM = (
    "sqrt(list_sum(list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def q_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH near-dup over corpus ∪ planted copies: with 4×8-bit
    bands and planted cosine ≈ 0.999996 (per-bit agreement 0.9991,
    per-band 0.9991⁸ ≈ 0.9928), per-pair miss probability is
    (1 - 0.9928)⁴ ≈ 2.6e-9 — the banding must surface every planted
    pair, and the exact-cosine verification must reject everything
    else (max organic pairwise cosine ≈ 0.51)."""
    emb = planted_copies(load_parallel(spark, sf_dir, "embeddings"))
    return rhp_dup_pairs(
        emb, threshold=_RHP_T, n_bits=_RHP_BITS, n_bands=_RHP_BANDS,
        dim=_RHP_DIM,
    )


def _rhp_oracle_sql() -> str:
    """DuckDB mirror of the banded sign-LSH join, planes inlined as the
    identical literals the Spark plan bakes in."""
    planes = rhp_planes(_RHP_BITS, _RHP_DIM)
    per_band = _RHP_BITS // _RHP_BANDS

    def lit(p: list[float]) -> str:
        return "[" + ", ".join(str(x) for x in p) + "]"

    def band_key(b: int) -> str:
        terms = []
        for pos in range(per_band):
            plane = lit(planes[b * per_band + pos])
            dot = _DOT_LIT.format(a="embedding", b=plane)
            terms.append(
                f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END) * {2 ** pos}"
            )
        return " + ".join(terms)

    key_rows = "\n  UNION ALL ".join(
        f"SELECT vec_id, embedding, nrm, {b} AS band, {band_key(b)} AS key "
        "FROM base"
        for b in range(_RHP_BANDS)
    )
    dot_lr = _DOT_LIT.format(a="l.embedding", b="r.embedding")
    return f"""
WITH planted AS ({PLANTED_UNION_SQL}),
base AS (
  SELECT vec_id, embedding, {_NORM.format(a='embedding')} AS nrm
  FROM planted
),
keys AS (
  {key_rows}
)
SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
       round({dot_lr} / (l.nrm * r.nrm), 6) AS score
FROM keys l JOIN keys r
  ON l.band = r.band AND l.key = r.key AND l.vec_id < r.vec_id
WHERE round({dot_lr} / (l.nrm * r.nrm), 6) >= {_RHP_T}
"""


SQL_EMBEDDING_LSH_PAIRS = _rhp_oracle_sql()


# --------------------------------------------------------------------------
# Exact dedup with keep-best policy (training-data curation staple)
# --------------------------------------------------------------------------

def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-exact dedup keeping one canonical row per group.

    Groups on md5(lower(text)) — the hash, not the text, is the shuffle
    key, so 100 KB documents shuffle as 32-byte digests once the
    projection drops the body. Keep policy: longest raw text, then
    lowest doc_id (deterministic).
    """
    # materialize the key ONCE: inline `partitionBy(md5(...))` in each
    # window makes Spark treat the two computed keys as distinct
    # expressions and shuffle twice; a named column shares one exchange
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "dup_key", F.md5(F.lower(F.col("text")))
    )
    w = Window.partitionBy("dup_key").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_copies", F.count("*").over(Window.partitionBy("dup_key"))
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "n_copies")
    )


SQL_DEDUP_KEEP_BEST = """
SELECT doc_id, lang, source, n_chars,
       count(*) OVER (PARTITION BY md5(lower(text))) AS n_copies
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY md5(lower(text)) ORDER BY n_chars DESC, doc_id ASC) = 1
"""


# --------------------------------------------------------------------------
# GROUPING SETS (between cube and rollup on the agg lattice)
# --------------------------------------------------------------------------

def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    e.withColumn("day", F.expr("ts_ms div 86400000")).createOrReplaceTempView(
        "events_gs"
    )
    return spark.sql(
        """
        SELECT event_type, day,
               CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
        """
    )


SQL_EVENTS_GROUPING_SETS = """
SELECT event_type, ts_ms // 86400000 AS day,
       CAST(GROUPING(event_type, "day") AS BIGINT) AS gid,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM (SELECT event_type, value, epoch_ms(ts) AS ts_ms FROM events)
GROUP BY GROUPING SETS ((event_type, "day"), (event_type), ())
"""


# --------------------------------------------------------------------------
# Hopping (sliding) time window: 10-minute window, 5-minute slide
# --------------------------------------------------------------------------

def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window aggregation with Spark's native ``window()``
    (the batch form of the streaming hopping window). Each event lands
    in exactly window/slide = 2 windows; the oracle mirrors that with
    an explicit 2-element unnest. Window starts are compared as epoch
    millis — ``window.start`` casts to epoch seconds independent of the
    session timezone.
    """
    e = load_events(spark, sf_dir).withColumn(
        "t", F.timestamp_millis(F.col("ts_ms"))
    )
    return (
        e.groupBy(
            F.window("t", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            (F.col("w.start").cast("long") * 1000).alias("ws_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SQL_HOPPING_WINDOW = """
SELECT ws_ms, event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM (
  SELECT event_type, value,
         unnest([ts_ms - (ts_ms % 300000),
                 ts_ms - (ts_ms % 300000) - 300000]) AS ws_ms
  FROM (SELECT event_type, value, epoch_ms(ts) AS ts_ms FROM events)
)
GROUP BY ws_ms, event_type
"""


# --------------------------------------------------------------------------
# Skew-safe two-phase aggregation in the graded surface
# --------------------------------------------------------------------------

def q_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted sum over a deliberately hot key (only a handful
    of event_type values → every key is a hot key): groupBy
    (key, salt16) partials, then groupBy key. Decimal accumulators make
    the result bit-identical to the oracle's single-phase GROUP BY —
    demonstrating that the skew mitigation is semantics-free.
    """
    from ..operators.skew import salted_sum

    e = load_events(spark, sf_dir)
    out = salted_sum(
        e,
        "event_type",
        F.sum(F.col("value").cast("decimal(38,6)")),
        n_salts=16,
        out_col="total",
    )
    return out.select(
        "event_type", F.col("total").cast("double").alias("total_value")
    )


SQL_SALTED_EVENT_TOTALS = """
SELECT event_type,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Time-series gap filling + forward fill (IGNORE NULLS window)
# --------------------------------------------------------------------------

def q_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize a per-user daily series with forward fill.

    Join-free formulation: instead of building a day spine and
    left-joining the observations back (a two-key join that at scale
    plans an SMJ on (user, day) PLUS a window re-exchange on user),
    each observed day looks at ``lead(day)`` and explodes
    ``sequence(day, next_day - 1)``, carrying its value across the gap
    it fills. Two exchanges of already-aggregated (user, day) rows —
    the daily groupBy, then the user-only window — and a map-side
    explode; raw events shuffle once, and nothing joins. The oracle
    states the same semantics declaratively with a spine join +
    ``last_value IGNORE NULLS``.
    """
    e = load_events(spark, sf_dir)
    daily = (
        e.withColumn("day", F.expr("ts_ms div 86400000"))
        .groupBy("user_id", "day")
        .agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("v")
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    seg = daily.withColumn("nxt", F.lead("day").over(w))
    filled = seg.select(
        "user_id",
        "v",
        F.col("day").alias("d_obs"),
        F.explode(
            F.sequence(
                "day", F.coalesce(F.col("nxt") - 1, F.col("day"))
            )
        ).alias("day"),
    )
    return filled.select(
        "user_id",
        "day",
        F.col("v").alias("filled_value"),
        (F.col("day") != F.col("d_obs")).alias("is_gap"),
    )


SQL_GAP_FILL_FFILL = """
WITH e AS (SELECT user_id, value, epoch_ms(ts) AS ts_ms FROM events),
daily AS (
  SELECT user_id, ts_ms // 86400000 AS day,
         CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
  FROM e GROUP BY user_id, day
),
spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily
          GROUP BY user_id),
spine AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM spans),
j AS (SELECT s.user_id, s.day, d.v
      FROM spine s LEFT JOIN daily d USING (user_id, day))
SELECT user_id, day,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       (v IS NULL) AS is_gap
FROM j
"""


# --------------------------------------------------------------------------
# Ranking-function completeness: percent_rank / cume_dist / nth_value
# --------------------------------------------------------------------------

def q_order_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


SQL_ORDER_RANK_STATS = """
SELECT o_custkey, o_orderkey,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd,
       nth_value(o_orderkey, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --------------------------------------------------------------------------
# Near-dup clustering: connected components of the 1-NN graph
# --------------------------------------------------------------------------

def q_knn_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster embeddings by connected components of the (undirected)
    nearest-neighbor graph — pairs → groups, the step a dedup pipeline
    needs to keep one canonical item per cluster. Iterative min-label
    propagation (operators/graph.py); the oracle is a recursive-CTE
    transitive closure, proving the fixpoint is the true component."""
    from ..operators.graph import connected_components
    from ..operators.similarity import knn_brute_force

    # cap the clustered slice: exact 1-NN is O(n²) pair work — the
    # right graph builder at corpus scale is the LSH/IVF candidate
    # join; the clustering itself is size-agnostic
    emb = load_parallel(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 1000
    )
    edges = knn_brute_force(emb, emb, k=1).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    comps = connected_components(edges, id_out="vec_id", comp_out="component")
    return comps.select("vec_id", "component")


_COS_LR = _DOT_LIT.format(a="l.embedding", b="r.embedding") + (
    " / ({nl} * {nr})".format(
        nl=_NORM.format(a="l.embedding"), nr=_NORM.format(a="r.embedding")
    )
)

SQL_KNN_COMPONENTS = f"""
WITH RECURSIVE emb AS (
  SELECT * FROM embeddings WHERE vec_id < 1000
),
nn AS (
  SELECT l.vec_id AS src, r.vec_id AS dst
  FROM emb l JOIN emb r ON l.vec_id <> r.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY l.vec_id ORDER BY {_COS_LR} DESC, r.vec_id ASC) <= 1
),
edges AS (
  SELECT src, dst FROM nn UNION SELECT dst, src FROM nn
),
reach(id, root) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS vec_id, min(root) AS component FROM reach GROUP BY id
"""


def q_knn_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as q_knn_components but via alternating
    large-star/small-star contraction (operators/graph.py,
    Kiveris et al. SoCC'14) — O(log n) rounds on any diameter. Shares
    the recursive-CTE oracle: both fixpoints must be the true
    transitive closure."""
    from ..operators.graph import connected_components_star
    from ..operators.similarity import knn_brute_force

    emb = load_parallel(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 1000
    )
    edges = knn_brute_force(emb, emb, k=1).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    comps = connected_components_star(
        edges, id_out="vec_id", comp_out="component"
    )
    return comps.select("vec_id", "component")


# --------------------------------------------------------------------------
# Deterministic Bloom-filter semi-join pruning. The filter is built as
# a DISTINCT bit-position table (bounded by m = 8192 rows REGARDLESS of
# build-side cardinality) and broadcast to the probe side — the
# runtime-filter pattern Spark applies physically
# (spark.sql.optimizer.runtime.bloomFilter.enabled) expressed as an
# explicit, engine-portable operator: md5-derived positions make every
# bit, hit and false positive identical in any SQL engine.
# --------------------------------------------------------------------------

_BLOOM_M = 8192
_BLOOM_K = 3
_BLOOM_T = 480_000.0  # build side: customers with an order this large


def _bloom_pos(key, i: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"b{i}-"), key.cast("string"))), 1, 14
            ),
            16, 10,
        ).cast("long") % _BLOOM_M
    )


def q_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe of every customer against the
    big-spender build set, next to exact membership (so the driver row
    also pins the false-positive behavior).

    Scale shape: the build side collapses to <= m distinct bit rows
    before any join; the probe is a broadcast hash join on the bit
    position. At 100 TB the bit table stays 8192 rows while a hash
    semi-join's build side would grow with the data.
    """
    o = load_table(spark, sf_dir, "orders")
    members = (
        o.filter(F.col("o_totalprice") > _BLOOM_T)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = (
        members.select(
            F.explode(
                F.array_distinct(
                    F.array(
                        *[_bloom_pos(F.col("k"), i) for i in range(_BLOOM_K)]
                    )
                )
            ).alias("pos")
        ).distinct()
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    arr = F.array_distinct(
        F.array(*[_bloom_pos(F.col("c_custkey"), i) for i in range(_BLOOM_K)])
    )
    probe = c.select(
        "c_custkey", F.size(arr).alias("n_pos"), F.explode(arr).alias("pos")
    )
    hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("c_custkey")
        .agg(F.count("*").alias("nhit"), F.first("n_pos").alias("n_pos"))
    )
    return (
        c.join(hits, "c_custkey", "left")
        .join(
            members.select(F.col("k").alias("c_custkey"))
            .withColumn("_m", F.lit(1)),
            "c_custkey", "left",
        )
        .select(
            "c_custkey",
            F.coalesce(F.col("nhit") == F.col("n_pos"), F.lit(False)).alias(
                "bloom_hit"
            ),
            F.col("_m").isNotNull().alias("is_member"),
        )
    )


SQL_BLOOM_PROBE = f"""
WITH members AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > {_BLOOM_T}
),
idx AS (SELECT unnest(range(0, {_BLOOM_K})) AS i),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '-'
                              || CAST(k AS VARCHAR)), 1, 14))::BIGINT
           % {_BLOOM_M} AS pos
  FROM members CROSS JOIN idx
),
probe AS (
  SELECT DISTINCT c_custkey,
         ('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '-'
                              || CAST(c_custkey AS VARCHAR)), 1, 14))::BIGINT
           % {_BLOOM_M} AS pos
  FROM customer CROSS JOIN idx
),
counts AS (
  SELECT c_custkey,
         count(*) AS n_pos,
         sum(CASE WHEN pos IN (SELECT pos FROM bits) THEN 1 ELSE 0 END)
           AS nhit
  FROM probe GROUP BY 1
)
SELECT c.c_custkey,
       (ct.nhit = ct.n_pos) AS bloom_hit,
       (c.c_custkey IN (SELECT k FROM members)) AS is_member
FROM customer c JOIN counts ct USING (c_custkey)
"""


# --------------------------------------------------------------------------
# Per-node triangle counts over the 3-NN embedding graph. Triangles are
# the local-clustering signal that separates near-clique duplicate
# clusters from incidental chains; the operator is the degree-ordered
# wedge counter (Suri & Vassilvitskii WWW'11) whose total wedge fan-out
# is O(m^{3/2}) regardless of degree skew.
# --------------------------------------------------------------------------

_TRI_K = 3


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation counts on the undirected 3-NN
    graph of the first 1000 embeddings (same capped slice and
    brute-force edge builder as knn_components — at corpus scale the
    edge list comes from the LSH/IVF candidate join instead).

    The oracle recomputes the same edges with QUALIFY and counts
    triangles by the canonical a<b<c three-way join — every wedge the
    Spark plan closes must appear exactly once there.
    """
    from ..operators.graph import triangle_counts
    from ..operators.similarity import knn_brute_force

    emb = load_parallel(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 1000
    )
    edges = knn_brute_force(emb, emb, k=_TRI_K).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return triangle_counts(edges, id_out="vec_id", count_out="n_triangles")


SQL_GRAPH_TRIANGLES = f"""
WITH emb AS (
  SELECT * FROM embeddings WHERE vec_id < 1000
),
nn AS (
  SELECT l.vec_id AS src, r.vec_id AS dst
  FROM emb l JOIN emb r ON l.vec_id <> r.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY l.vec_id ORDER BY {_COS_LR} DESC, r.vec_id ASC)
    <= {_TRI_K}
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM nn
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
),
nodes AS (
  SELECT a AS vec_id FROM und UNION SELECT b FROM und
),
per_node AS (
  SELECT v AS vec_id, count(*) AS c FROM (
    SELECT x AS v FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY 1
)
SELECT n.vec_id,
       CAST(coalesce(p.c, 0) AS BIGINT) AS n_triangles
FROM nodes n LEFT JOIN per_node p USING (vec_id)
"""


# --------------------------------------------------------------------------
# CDC merge (MERGE INTO semantics): apply a deterministic change batch
# of upserts + tombstones + inserts to the orders snapshot. The base
# table never shuffles — superseded rows leave via a broadcast LEFT
# ANTI join; the change batch alone pays the latest-version window.
# --------------------------------------------------------------------------


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/merge.merge_upsert over orders with a synthesized CDC
    batch: v2 beats v1 on overlapping keys (%100==3 ⊂ %10==3), %10==7
    keys are tombstoned, %1000==1 keys insert under a fresh keyspace.
    Rolled up per status so the row hash pins every branch: updated
    ('U'), re-updated ('V'), deleted (absent), inserted ('N'), and
    untouched rows at their original price."""
    from ..operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")

    def ch(flt, key, st, pr, v, dele):
        return o.filter(flt).select(
            key.alias("o_orderkey"),
            st.alias("o_orderstatus"),
            pr.alias("o_totalprice"),
            F.lit(v).alias("version"),
            F.lit(dele).alias("is_deleted"),
        )

    changes = (
        ch(k % 10 == 3, k, F.lit("U"), F.col("o_totalprice") + 100, 1, False)
        .unionByName(ch(k % 100 == 3, k, F.lit("V"),
                        F.col("o_totalprice") + 200, 2, False))
        .unionByName(ch(k % 10 == 7, k, F.col("o_orderstatus"),
                        F.col("o_totalprice"), 1, True))
        .unionByName(ch(k % 1000 == 1, k + 100_000_000, F.lit("N"),
                        F.col("o_totalprice"), 1, False))
    )
    merged = merge_upsert(
        o, changes, key_cols=["o_orderkey"],
        version_col="version", deleted_col="is_deleted",
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("total"),
    )


SQL_MERGE_UPSERT = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
ch AS (
  SELECT o_orderkey, 'U' AS st, o_totalprice + 100 AS pr,
         1 AS v, FALSE AS del
  FROM base WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey, 'V', o_totalprice + 200, 2, FALSE
  FROM base WHERE o_orderkey % 100 = 3
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1, TRUE
  FROM base WHERE o_orderkey % 10 = 7
  UNION ALL
  SELECT o_orderkey + 100000000, 'N', o_totalprice, 1, FALSE
  FROM base WHERE o_orderkey % 1000 = 1
),
latest AS (
  SELECT * FROM ch
  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) = 1
),
merged AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM base
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
  UNION ALL
  SELECT o_orderkey, st, pr FROM latest WHERE NOT del
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM merged GROUP BY 1
"""


# --------------------------------------------------------------------------
# Histogram quantile sketch: approximate P50/P90/P99 of the lineitem
# price per return flag from a 256-bin cumulative histogram — O(bins)
# state per group instead of percentile()'s per-group value
# materialization. Every step is integer or bit-identical IEEE-double,
# so the sketch carries a full value oracle.
# --------------------------------------------------------------------------

_HQ_BINS = 256


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/stats.histogram_quantiles over l_extendedprice grouped
    by l_returnflag. The only data-sized shuffle emits ≤ 3×256 (flag,
    bin) rows; the exact-percentile twin (order_percentiles) is the
    accuracy yardstick pinned in tests."""
    from ..operators.stats import histogram_quantiles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return histogram_quantiles(
        li, "l_extendedprice", ["l_returnflag"], n_bins=_HQ_BINS,
        percentiles=(50, 90, 99),
    )


SQL_QUANTILE_SKETCH = f"""
WITH stats AS (
  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
         max(CAST(l_extendedprice AS DOUBLE)) AS mx
  FROM lineitem
),
binned AS (
  SELECT l_returnflag,
         CAST(CASE WHEN s.mx > s.mn THEN least(
                floor((CAST(l_extendedprice AS DOUBLE) - s.mn)
                      * {float(_HQ_BINS)} / (s.mx - s.mn)),
                {_HQ_BINS - 1})
              ELSE 0 END AS BIGINT) AS bin,
         count(*) AS cnt
  FROM lineitem CROSS JOIN stats s
  GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, bin,
         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY l_returnflag) AS n_rows
  FROM binned
),
hit AS (
  SELECT l_returnflag, p, min(bin) AS bin, min(n_rows) AS n_rows
  FROM cum CROSS JOIN (SELECT unnest([50, 90, 99]) AS p)
  WHERE cum >= (p * n_rows + 99) // 100
  GROUP BY 1, 2
)
SELECT l_returnflag, CAST(p AS INT) AS p, bin,
       s.mn + CAST(bin AS DOUBLE) * (s.mx - s.mn) / {float(_HQ_BINS)}
         AS est_lo,
       CAST(n_rows AS BIGINT) AS n_rows
FROM hit CROSS JOIN stats s
"""


# --------------------------------------------------------------------------
# Entity resolution: blocked edit-distance fuzzy matching. Planted
# single-character deletions over part names must be recovered through
# prefix/suffix blocking + an exact levenshtein verify — the
# record-linkage gap between exact dedup and the shingle families.
# --------------------------------------------------------------------------


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/linkage.fuzzy_match_pairs over distinct entity labels
    (part name + '#' + 6 md5 hex chars of the key — the hash suffix
    makes entities unique the way real author/org names are, while
    TPC-H p_name alone has only ~64 distinct values) ∪ planted typo
    copies (char 5 deleted, fresh keyspace). The deletion sits between
    the two key windows — chars 1-4 and the final 4 hash chars both
    survive — so each planted pair lands in both its blocks; what the
    row pins is that recovery survives PURGING: the shared-p_name
    prefix blocks are exactly the non-discriminative oversized blocks
    the cap discards, leaving the suffix path to carry every planted
    pair (plus the threshold behavior of the cap itself)."""
    from ..operators.linkage import fuzzy_match_pairs

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            F.lit("#"),
            F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 6),
        ).alias("label"),
    )
    corrupt = p.filter(F.col("p_partkey") % 20 == 0).select(
        (F.col("p_partkey") + 10_000_000).alias("p_partkey"),
        F.concat(
            F.substring("label", 1, 4), F.substring("label", 6, 10_000)
        ).alias("label"),
    )
    return fuzzy_match_pairs(
        p.unionByName(corrupt),
        id_col="p_partkey",
        name_col="label",
        max_dist=1,
        block_chars=4,
        max_block_size=50,
    )


SQL_FUZZY_MATCH = """
WITH lbl AS (
  SELECT p_partkey,
         p_name || '#' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 6)
           AS label
  FROM part
),
base AS (
  SELECT p_partkey AS id, lower(label) AS nm FROM lbl
  UNION ALL
  SELECT p_partkey + 10000000,
         lower(substr(label, 1, 4) || substr(label, 6))
  FROM lbl WHERE p_partkey % 20 = 0
),
keyed AS (
  SELECT id, nm, 'p:' || substr(nm, 1, 4) AS blk FROM base
  UNION ALL
  SELECT id, nm, 's:' || substr(nm, -4, 4) FROM base
),
kept AS (
  SELECT k.* FROM keyed k
  JOIN (SELECT blk FROM keyed GROUP BY blk HAVING count(*) <= 50) ok
    USING (blk)
),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b,
         l.nm AS name_a, r.nm AS name_b
  FROM kept l JOIN kept r ON l.blk = r.blk AND l.id < r.id
)
SELECT id_a, id_b, name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS INT) AS dist
FROM cand
WHERE levenshtein(name_a, name_b) <= 1
"""


# --------------------------------------------------------------------------
# Interval (range-containment) join: events × overlapping promo windows
# via the grid-bucketed equi-join (operators/asof.interval_join) — the
# raw BETWEEN theta-join would be a BroadcastNestedLoopJoin.
# --------------------------------------------------------------------------

_IV_BASE_MS = 1_704_067_200_000   # 2024-01-01 00:00:00
_IV_SPACING_MS = 129_600_000      # 36 h
_IV_LENGTH_MS = 172_800_000       # 48 h (adjacent promos overlap 12 h)
_IV_N_PROMOS = 20
_IV_GRAN_MS = 43_200_000          # 12 h grid


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/asof.interval_join: attach every containing promo
    window to each event (windows overlap, so events can match twice),
    rolled up per promo. The equi-join key is the 12 h time grid — the
    plan is a hash join, never a nested-loop range scan."""
    from ..operators.asof import interval_join

    iv = spark.range(_IV_N_PROMOS).select(
        F.col("id").alias("promo_id"),
        (F.lit(_IV_BASE_MS) + F.col("id") * _IV_SPACING_MS).alias(
            "start_ms"
        ),
        (
            F.lit(_IV_BASE_MS)
            + F.col("id") * _IV_SPACING_MS
            + _IV_LENGTH_MS
        ).alias("end_ms"),
    )
    ev = load_events(spark, sf_dir).select(
        "ts_ms", "user_id", "event_type", "value"
    )
    j = interval_join(
        ev, iv, "ts_ms", "start_ms", "end_ms", granularity=_IV_GRAN_MS
    )
    return j.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(38,6)"),
            )
        )
        .cast("double")
        .alias("purchase_revenue"),
    )


SQL_INTERVAL_JOIN = f"""
WITH iv AS (
  SELECT CAST(i AS BIGINT) AS promo_id,
         {_IV_BASE_MS} + i * {_IV_SPACING_MS} AS start_ms,
         {_IV_BASE_MS} + i * {_IV_SPACING_MS} + {_IV_LENGTH_MS} AS end_ms
  FROM range(0, {_IV_N_PROMOS}) t(i)
),
ev AS (
  SELECT epoch_ms(ts) AS ts_ms, user_id, event_type, value FROM events
)
SELECT promo_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
         AS purchase_revenue
FROM ev JOIN iv ON ev.ts_ms >= iv.start_ms AND ev.ts_ms < iv.end_ms
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Distributed BPE merge training over the documents corpus. The corpus
# pays one word-count aggregation; each merge round is an explode +
# hash agg + 1-row broadcast over the vocab-sized word table. The
# oracle replays every round as chained CTEs — pair counts, argmax
# (ties broken lexicographically) and the greedy left-to-right merge
# (plain replace()) are engine-portable by construction.
# --------------------------------------------------------------------------

_BPE_ROUNDS = 3


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bpe: learn 3 BPE merges from documents.text (Sennrich
    ACL'16). Parity with a pure-Python BPE implementation is pinned in
    tests/test_extra_plans.py; here the DuckDB oracle replays the
    identical rounds bit-for-bit."""
    from ..operators.bpe import bpe_train_merges, word_frequencies

    docs = load_parallel(spark, sf_dir, "documents")
    return bpe_train_merges(
        word_frequencies(docs), n_merges=_BPE_ROUNDS
    )


def _bpe_oracle_sql(rounds: int = _BPE_ROUNDS) -> str:
    parts = ["""
WITH words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents
  ) WHERE length(word) BETWEEN 2 AND 12 GROUP BY 1
),
s0 AS (
  -- wrapped tokens (" s "): adjacent tokens share no characters, so
  -- the pair replace is exactly the classic greedy left-to-right merge
  SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS seq, freq
  FROM words
)"""]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(f""",
c{r} AS (
  SELECT u.a AS a, u.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(range(1, len(s)),
                  i -> struct_pack(a := s[i], b := s[i + 1]))) AS u,
           freq
    FROM (SELECT string_split(trim(seq), '  ') AS s, freq FROM {prev})
  ) GROUP BY 1, 2
),
b{r} AS (SELECT a, b, cnt FROM c{r} ORDER BY cnt DESC, a, b LIMIT 1),
s{r} AS (
  SELECT replace(seq, ' ' || b{r}.a || '  ' || b{r}.b || ' ',
                 ' ' || b{r}.a || b{r}.b || ' ') AS seq, freq
  FROM {prev} CROSS JOIN b{r}
)""")
    selects = "\nUNION ALL ".join(
        f"SELECT {r} AS merge_round, a, b, cnt FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n" + selects


SQL_BPE_MERGES = _bpe_oracle_sql()


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bpe.bpe_apply: train 3 merges, then ENCODE the vocab
    with them — tokenizer train + apply end-to-end, with the greedy
    left-to-right merge replayed round-for-round by the oracle."""
    from ..operators.bpe import (
        bpe_apply,
        bpe_train_merges,
        word_frequencies,
    )

    words = word_frequencies(load_parallel(spark, sf_dir, "documents"))
    merges = bpe_train_merges(words, n_merges=_BPE_ROUNDS)
    enc = bpe_apply(words, merges, _BPE_ROUNDS)
    return enc.select(
        "word",
        "freq",
        F.array_join("tokens", " ").alias("tokens"),
        "n_tokens",
    )


def _bpe_encode_oracle_sql(rounds: int = _BPE_ROUNDS) -> str:
    # reuse the training CTE chain (words, s0..sN, b1..bN), then run
    # the encode chain e0..eN applying each round's winning pair to the
    # word-carrying table; LEFT JOIN ON TRUE mirrors bpe_apply's
    # empty-round passthrough
    train = _bpe_oracle_sql(rounds)
    # _bpe_oracle_sql ends with the UNION ALL of b{r} selects; keep
    # only the WITH chain
    head = train[: train.index("\nSELECT 1 AS merge_round, a, b, cnt")]
    parts = [head]
    parts.append(""",
e0 AS (
  SELECT word, freq, regexp_replace(word, '(.)', ' \\1 ', 'g') AS seq
  FROM words
)""")
    for r in range(1, rounds + 1):
        parts.append(f""",
e{r} AS (
  SELECT word, freq,
         CASE WHEN b.a IS NOT NULL
              THEN replace(seq, ' ' || b.a || '  ' || b.b || ' ',
                           ' ' || b.a || b.b || ' ')
              ELSE seq END AS seq
  FROM e{r - 1} LEFT JOIN b{r} b ON TRUE
)""")
    parts.append(f"""
SELECT word, CAST(freq AS BIGINT) AS freq,
       array_to_string(string_split(trim(seq), '  '), ' ') AS tokens,
       CAST(len(string_split(trim(seq), '  ')) AS INT) AS n_tokens
FROM e{rounds}""")
    return "".join(parts)


SQL_BPE_ENCODE = _bpe_encode_oracle_sql()


# --------------------------------------------------------------------------
# Count-min frequency sketch over document words, probed next to exact
# counts — the frequency member of the sketch quartet (Bloom:
# membership, HLL: distinct, histogram: quantiles). d×w integer state
# regardless of vocabulary size; md5 positions make every counter and
# every overcount engine-identical, so the driver row pins the
# estimate-vs-exact behavior the same way bloom_probe pins false
# positives.
# --------------------------------------------------------------------------


_CMS_NARROW = 16


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/stats count_min_build/estimate: sketch the corpus word
    frequencies and estimate EVERY word's count next to its exact
    frequency, at two widths — 1024 (collision-free at this vocab:
    est == exact) and 16 (pigeonhole-forced collisions: deterministic
    overcounts, est >= exact always). One driver row pins both
    regimes, the way bloom_probe pins false positives."""
    from ..operators.bpe import word_frequencies
    from ..operators.stats import (
        count_min_build,
        count_min_estimate,
    )

    # the corpus-sized aggregation feeds four consumers (two builds,
    # probes, final join): materialize the vocab-sized result once
    words = word_frequencies(
        load_parallel(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)
    probes = words.select("word")
    wide = count_min_estimate(
        probes,
        count_min_build(words, "word", weight_col="freq"),
        "word",
        est_col="est_wide",
    )
    narrow = count_min_estimate(
        probes,
        count_min_build(
            words, "word", weight_col="freq", width=_CMS_NARROW
        ),
        "word",
        width=_CMS_NARROW,
        est_col="est_narrow",
    )
    return (
        words.join(wide, "word")
        .join(narrow, "word")
        .select(
            "word", "est_wide", "est_narrow",
            F.col("freq").alias("exact"),
        )
    )


_CMS_POS = (
    "('0x' || substr(md5('c' || CAST({r} AS VARCHAR) || '-' || {w}),"
    " 1, 14))::BIGINT % {m}"
)

SQL_CMS_COUNTS = f"""
WITH words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents
  ) WHERE length(word) BETWEEN 2 AND 12 GROUP BY 1
),
idx AS (SELECT unnest(range(0, 3)) AS r),
cells_w AS (
  SELECT r AS row, {_CMS_POS.format(r='r', w='word', m=1024)} AS pos,
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM words CROSS JOIN idx GROUP BY 1, 2
),
cells_n AS (
  SELECT r AS row, {_CMS_POS.format(r='r', w='word', m=_CMS_NARROW)} AS pos,
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM words CROSS JOIN idx GROUP BY 1, 2
),
est_w AS (
  SELECT p.word, min(coalesce(c.cnt, 0)) AS est_wide
  FROM words p CROSS JOIN idx
  LEFT JOIN cells_w c
    ON c.row = idx.r
   AND c.pos = {_CMS_POS.format(r='idx.r', w='p.word', m=1024)}
  GROUP BY 1
),
est_n AS (
  SELECT p.word, min(coalesce(c.cnt, 0)) AS est_narrow
  FROM words p CROSS JOIN idx
  LEFT JOIN cells_n c
    ON c.row = idx.r
   AND c.pos = {_CMS_POS.format(r='idx.r', w='p.word', m=_CMS_NARROW)}
  GROUP BY 1
)
SELECT w.word, CAST(est_wide AS BIGINT) AS est_wide,
       CAST(est_narrow AS BIGINT) AS est_narrow, w.freq AS exact
FROM words w JOIN est_w USING (word) JOIN est_n USING (word)
"""


# --------------------------------------------------------------------------
# k-core peeling: the density filter separating near-clique communities
# from tree/chain structure (a tree has no 2-core). The homogeneous
# organic graphs here make every fixed k trivial (3-NN: all survive
# k<=3, none k>=4), so the driver graph plants known cores on the
# customer id domain — a 200-node chain carrying a K6 on ids 0-5 and a
# K4 on ids 10-13. The 3-core must peel the whole chain in round one
# and keep exactly the two cliques; bounded rounds keep plan and
# oracle deterministic, and convergence at this round count is pinned
# in tests.
# --------------------------------------------------------------------------

_KCORE_K, _KCORE_ROUNDS = 3, 4


def _kcore_planted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = (
        load_table(spark, sf_dir, "customer")
        .select((F.col("c_custkey") % 200).alias("n"))
        .distinct()
    )
    chain = nodes.filter(F.col("n") < 199).select(
        F.col("n").alias("src"), (F.col("n") + 1).alias("dst")
    )
    six = nodes.filter(F.col("n") <= 5)
    k6 = (
        six.alias("x")
        .join(six.alias("y"), F.col("x.n") < F.col("y.n"))
        .select(F.col("x.n").alias("src"), F.col("y.n").alias("dst"))
    )
    four = nodes.filter((F.col("n") >= 10) & (F.col("n") <= 13))
    k4 = (
        four.alias("x")
        .join(four.alias("y"), F.col("x.n") < F.col("y.n"))
        .select(F.col("x.n").alias("src"), F.col("y.n").alias("dst"))
    )
    return chain.unionByName(k6).unionByName(k4)


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.k_core on the planted chain+K6+K4 graph:
    surviving (node, core_degree) after 4 rounds of degree-<3 peeling
    — exactly the two cliques, every chain node gone. The oracle
    replays every peeling round as chained materialized CTEs."""
    from ..operators.graph import k_core

    edges = _kcore_planted_edges(spark, sf_dir)
    return k_core(
        edges, k=_KCORE_K, n_rounds=_KCORE_ROUNDS, id_out="node"
    )


def _k_core_oracle_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    head = """
WITH nodes AS (
  SELECT DISTINCT c_custkey % 200 AS n FROM customer
),
planted AS (
  SELECT n AS src, n + 1 AS dst FROM nodes WHERE n < 199
  UNION ALL
  SELECT x.n, y.n FROM nodes x JOIN nodes y ON x.n < y.n
  WHERE x.n <= 5 AND y.n <= 5
  UNION ALL
  SELECT x.n, y.n FROM nodes x JOIN nodes y ON x.n < y.n
  WHERE x.n BETWEEN 10 AND 13 AND y.n BETWEEN 10 AND 13
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM planted
)"""
    parts = [head]
    # MATERIALIZED: each round references its predecessor three times;
    # default CTE inlining would expand e0 3^rounds times and exhaust
    # file handles re-scanning the parquet
    for r in range(1, rounds + 1):
        p = f"e{r - 1}"
        parts.append(f""",
k{r} AS MATERIALIZED (
  SELECT n FROM (
    SELECT a AS n FROM {p} UNION ALL SELECT b FROM {p}
  ) GROUP BY 1 HAVING count(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT * FROM {p}
  WHERE a IN (SELECT n FROM k{r}) AND b IN (SELECT n FROM k{r})
)""")
    tail = f"""
SELECT node, CAST(count(*) AS BIGINT) AS core_degree FROM (
  SELECT a AS node FROM e{rounds}
  UNION ALL SELECT b FROM e{rounds}
) GROUP BY 1
"""
    return "".join(parts) + tail


SQL_K_CORE = _k_core_oracle_sql()


def q_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64→16 dims
    (operators/similarity.random_projection, Achlioptas PODS'01 ±1
    matrix) in long (vec_id, dim, val) form — map-side only, the
    shrink step that precedes ANN indexing at corpus scale. Values are
    bit-exact across engines: 2^20 integer-grid quantization, BIGINT
    signed sums, one final ÷(2^20·√16)."""
    emb = load_parallel(spark, sf_dir, "embeddings")
    p = random_projection(emb, d_out=16)
    return p.select(
        "vec_id", F.posexplode("projected").alias("dim", "val")
    ).select(
        "vec_id", F.col("dim").cast("long").alias("dim"), "val"
    )


SQL_EMBEDDING_PROJECT = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(round(v::DOUBLE * 1048576) AS BIGINT)) AS q
  FROM embeddings
),
e AS (
  SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS i, q[u.i] AS v
  FROM q, unnest(range(1, 65)) AS u(i)
),
sgn AS (
  SELECT a.i, b.j,
         CASE WHEN ('0x' || substr(md5(a.i::VARCHAR || '#' || b.j::VARCHAR),
                                   1, 1))::BIGINT % 2 = 1
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range(0, 64)) AS i) a,
       (SELECT unnest(range(0, 16)) AS j) b
)
SELECT e.vec_id, sgn.j AS dim,
       round(CAST(sum(e.v * sgn.s) AS BIGINT)::DOUBLE / 4194304.0, 6) AS val
FROM e JOIN sgn ON sgn.i = e.i
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Distributed row indexing (operators/indexing.py)
# --------------------------------------------------------------------------


def q_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0..n-1 global index over documents via the two-pass
    bucket-count/offset pattern; the oracle is the single-engine
    ROW_NUMBER over the identical (md5-bucket, key) order, proving the
    distributed composition equals the global sort it replaces."""
    from ..operators.indexing import assign_global_index

    d = load_parallel(spark, sf_dir, "documents")
    return assign_global_index(
        d.select("doc_id"), "doc_id", buckets=16
    ).select("doc_id", "global_idx")


SQL_GLOBAL_INDEX = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
         ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
                    ::BIGINT % 16,
                  doc_id) - 1 AS BIGINT) AS global_idx
FROM documents
"""


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pre-training shuffle: seed-stable (shard, pos) for
    every document; oracle recomputes the same md5-order row numbers."""
    from ..operators.indexing import shuffle_shards

    d = load_parallel(spark, sf_dir, "documents")
    return shuffle_shards(
        d.select("doc_id"), "doc_id", shards=8, seed="r4"
    ).select("doc_id", "shard", "pos")


SQL_SHUFFLE_SHARDS = """
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('r4#' || CAST(doc_id AS VARCHAR)), 1, 14))
           ::BIGINT AS h
  FROM documents
)
SELECT doc_id,
       CAST(h % 8 AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
            AS BIGINT) AS pos
FROM h
"""


# --------------------------------------------------------------------------
# KMV distinct sketch with set operations (operators/stats.py)
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE_LIT = "72057594037927936.0"  # 2^56 as an exact double literal


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-active-audience overlap between every event-type pair from
    k-minimum-values sketches over (user, epoch-day) — Beyer et al.
    2007 sketches, Theta-sketch intersection rule. The user@day grain
    keeps the per-type audiences partially (not totally) overlapping,
    so both the saturated estimator and a non-trivial Jaccard are
    exercised. The oracle replays the identical sketch construction,
    union-merge and inclusion estimator in SQL — every hash, rank, and
    IEEE-double estimate must agree."""
    from ..operators.stats import kmv_overlap, kmv_sketches

    e = load_events(spark, sf_dir).select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"),
            F.lit("@"),
            F.expr("ts_ms div 86400000").cast("string"),
        ).alias("user_day"),
    )
    sk = kmv_sketches(e, "event_type", "user_day", k=_KMV_K)
    return kmv_overlap(sk, k=_KMV_K)


_KMV_EST_U = (
    f"CASE WHEN us.n_union < {_KMV_K} THEN CAST(us.n_union AS DOUBLE) "
    f"ELSE CAST({_KMV_K - 1} AS DOUBLE) * CAST({_KMV_SPACE_LIT} AS DOUBLE)"
    f" / CAST(us.hk AS DOUBLE) END"
)

SQL_KMV_OVERLAP = f"""
WITH pairs0 AS (
  SELECT DISTINCT event_type AS grp,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '@' ||
                             CAST(epoch_ms(ts) // 86400000 AS VARCHAR)),
                         1, 14))::BIGINT AS h
  FROM events
),
sk AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS r
  FROM pairs0
  QUALIFY r <= {_KMV_K}
),
singles AS (
  SELECT grp,
         CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS DOUBLE)
              ELSE CAST({_KMV_K - 1} AS DOUBLE)
                   * CAST({_KMV_SPACE_LIT} AS DOUBLE)
                   / CAST(max(h) AS DOUBLE) END AS est
  FROM sk GROUP BY grp
),
prs AS (
  SELECT a.grp AS ta, b.grp AS tb, a.est AS est_a, b.est AS est_b
  FROM singles a, singles b WHERE a.grp < b.grp
),
merged AS (
  SELECT DISTINCT p.ta, p.tb, s.h
  FROM prs p JOIN sk s ON s.grp = p.ta OR s.grp = p.tb
),
uni AS (
  SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS r
  FROM merged QUALIFY r <= {_KMV_K}
),
m AS (
  SELECT u.ta, u.tb, count(*) AS matches
  FROM uni u
  WHERE EXISTS (SELECT 1 FROM sk x WHERE x.grp = u.ta AND x.h = u.h)
    AND EXISTS (SELECT 1 FROM sk y WHERE y.grp = u.tb AND y.h = u.h)
  GROUP BY u.ta, u.tb
),
ustats AS (
  SELECT ta, tb, count(*) AS n_union, max(h) AS hk FROM uni GROUP BY ta, tb
)
SELECT us.ta AS type_a, us.tb AS type_b,
       round(p.est_a, 4) AS est_a, round(p.est_b, 4) AS est_b,
       CAST(us.n_union AS BIGINT) AS n_union,
       CAST(COALESCE(m.matches, 0) AS BIGINT) AS matches,
       round({_KMV_EST_U}, 4) AS est_union,
       round(CAST(COALESCE(m.matches, 0) AS DOUBLE)
             / CAST(us.n_union AS DOUBLE), 6) AS est_jaccard,
       round(CAST(COALESCE(m.matches, 0) AS DOUBLE)
             / CAST(us.n_union AS DOUBLE) * ({_KMV_EST_U}), 4)
         AS est_intersection
FROM ustats us
JOIN prs p ON p.ta = us.ta AND p.tb = us.tb
LEFT JOIN m ON m.ta = us.ta AND m.tb = us.tb
"""


# --------------------------------------------------------------------------
# Weighted sampling without replacement (operators/curation.py)
# --------------------------------------------------------------------------

_WS_K = 200


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis A-Res top-k: 200 documents sampled without
    replacement, inclusion proportional to n_chars. The oracle replays
    the identical u^(1/w) keys and takes the same top-k — the sample
    must match row-for-row, proving the TakeOrdered path equals the
    total-order definition."""
    from ..operators.curation import weighted_sample

    d = load_parallel(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    return weighted_sample(d, "n_chars", _WS_K, seed="ws0")


SQL_WEIGHTED_SAMPLE = f"""
WITH s AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         pow(('0x' || substr(md5('ws0#' || CAST(doc_id AS VARCHAR)),
                             1, 14))::BIGINT / 72057594037927936.0,
             1.0 / CAST(n_chars AS DOUBLE)) AS key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, round(key, 6) AS sample_key
FROM s ORDER BY key DESC, doc_id LIMIT {_WS_K}
"""


# --------------------------------------------------------------------------
# Z-order (Morton) clustering keys (sources/maintenance.py)
# --------------------------------------------------------------------------

_Z_BITS = 8


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (user_id, epoch-second) for every event — the
    clustering key write_zordered files by. Mins/maxs come from one
    1-row aggregate (the only driver pull); the oracle recomputes the
    identical integer normalization and bit interleave, so every key
    must match bit-for-bit."""
    from ..sources.maintenance import zorder_value

    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", F.expr("ts_ms div 1000").alias("ts_s")
    )
    row = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_s"), F.max("ts_s")
    ).first()
    z = zorder_value(
        [F.col("user_id"), F.col("ts_s")],
        [row[0], row[2]],
        [row[1], row[3]],
        bits=_Z_BITS,
    )
    return e.select("event_id", z.alias("zkey"))


def _zorder_oracle_sql() -> str:
    top = (1 << _Z_BITS) - 1
    terms = []
    for b in range(_Z_BITS):
        for i, nc in enumerate(("nu", "nt")):
            terms.append(f"(({nc} >> {b}) & 1) * {1 << (b * 2 + i)}")
    return f"""
WITH stats AS (
  SELECT min(user_id) AS mnu, max(user_id) AS mxu,
         min(epoch_ms(ts) // 1000) AS mnt, max(epoch_ms(ts) // 1000) AS mxt
  FROM events
),
norm AS (
  SELECT event_id,
         (user_id - s.mnu) * {top}
           // greatest(s.mxu - s.mnu, 1) AS nu,
         (epoch_ms(ts) // 1000 - s.mnt) * {top}
           // greatest(s.mxt - s.mnt, 1) AS nt
  FROM events, stats s
)
SELECT event_id, CAST({' + '.join(terms)} AS BIGINT) AS zkey
FROM norm
"""


SQL_ZORDER_KEYS = _zorder_oracle_sql()


# --------------------------------------------------------------------------
# Snapshot diff / change-feed recovery (operators/merge.py)
# --------------------------------------------------------------------------


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two customer snapshots with planted mutations (5% deleted,
    5% segment-churned, 5% cloned under new keys — md5-chosen, mirrored
    literally in the oracle). The oracle states the EXPECTED changeset
    directly from the mutation rules, so the digest/full-outer
    machinery must recover exactly the planted feed — no more (no
    false updates from digest collisions) and no less."""
    from ..operators.merge import snapshot_diff

    c = load_table(spark, sf_dir, "customer")
    hv = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 14),
               16, 10).cast("long") % 20
    )
    old = c.withColumn("_hv", hv)
    new = (
        old.filter(F.col("_hv") != 0)
        .withColumn(
            "c_mktsegment",
            F.when(F.col("_hv") == 1, F.lit("CHURNED"))
             .otherwise(F.col("c_mktsegment")),
        )
        .unionByName(
            old.filter(F.col("_hv") == 2).withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(1000000000)
            )
        )
    )
    return snapshot_diff(
        old, new, ["c_custkey"],
        ["c_name", "c_nationkey", "c_mktsegment"],
    )


SQL_SNAPSHOT_DIFF = """
WITH h AS (
  SELECT c_custkey,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 14))::BIGINT
           % 20 AS hv
  FROM customer
)
SELECT c_custkey, 'delete' AS change_type FROM h WHERE hv = 0
UNION ALL
SELECT c_custkey, 'update' AS change_type FROM h WHERE hv = 1
UNION ALL
SELECT c_custkey + 1000000000 AS c_custkey, 'insert' AS change_type
FROM h WHERE hv = 2
"""


# --------------------------------------------------------------------------
# Point-in-time rolling features (operators/features.py)
# --------------------------------------------------------------------------


def q_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-day and 7-day activity features (count +
    BIGINT-cents value sum) over each user's own history — the
    leakage-free feature construction. RANGE frames make equal
    timestamps unambiguous, so the oracle must match bit-for-bit."""
    from ..operators.features import DAY_MS, rolling_features

    e = load_events(spark, sf_dir)
    return rolling_features(
        e, {"1d": DAY_MS, "7d": 7 * DAY_MS}
    )


SQL_ROLLING_FEATURES = """
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
       CAST(count(*) OVER w1 AS BIGINT) AS n_1d,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w1 AS BIGINT)
         AS cents_1d,
       CAST(count(*) OVER w7 AS BIGINT) AS n_7d,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w7 AS BIGINT)
         AS cents_7d
FROM events
WINDOW
  w1 AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
         RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW),
  w7 AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
         RANGE BETWEEN 604799999 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# A/B experiment analysis (deterministic hash assignment + lift)
# --------------------------------------------------------------------------


def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic experiment readout: users hash into control/
    treatment (md5 — the assignment any engine can replay for audit),
    then ONE conditional aggregation produces per-arm reach,
    converters (a high-value purchase, value > 150 — every user has
    SOME purchase in this data, so the plain definition would saturate
    at rate 1.0 in both arms), purchase revenue (BIGINT cents) and the
    relative conversion lift. The whole analysis is a single hash aggregate
    over (arm, user) distincts plus a 1-row reduce — scale-flat."""
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
                    & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("converted"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("cents"),
        )
    )
    def side(a: int, name: str):
        return [
            F.sum(F.when(F.col("arm") == a, 1).otherwise(0))
             .cast("long").alias(f"users_{name}"),
            F.sum(F.when(F.col("arm") == a, F.col("converted"))
                  .otherwise(0)).cast("long").alias(f"conv_{name}"),
            F.sum(F.when(F.col("arm") == a, F.col("cents"))
                  .otherwise(0)).cast("long").alias(f"cents_{name}"),
        ]

    wide = per_user.agg(*side(0, "control"), *side(1, "treatment"))
    rate_c = F.col("conv_control").cast("double") / F.col("users_control")
    rate_t = F.col("conv_treatment").cast("double") / F.col("users_treatment")
    return wide.select(
        "users_control", "conv_control", "cents_control",
        "users_treatment", "conv_treatment", "cents_treatment",
        F.round(rate_c, 6).alias("rate_control"),
        F.round(rate_t, 6).alias("rate_treatment"),
        F.round((rate_t - rate_c) / rate_c, 6).alias("rel_lift"),
    )


SQL_AB_LIFT = """
WITH per_user AS (
  SELECT ('0x' || substr(md5('exp1#' || CAST(user_id AS VARCHAR)),
                         1, 14))::BIGINT % 2 AS arm,
         user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS converted,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100) AS BIGINT)
                  ELSE 0 END) AS cents
  FROM events GROUP BY 1, 2
),
wide AS (
  SELECT
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS users_control,
    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_control,
    CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT)
      AS cents_control,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS users_treatment,
    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_treatment,
    CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT)
      AS cents_treatment
  FROM per_user
)
SELECT users_control, conv_control, cents_control,
       users_treatment, conv_treatment, cents_treatment,
       round(CAST(conv_control AS DOUBLE) / users_control, 6)
         AS rate_control,
       round(CAST(conv_treatment AS DOUBLE) / users_treatment, 6)
         AS rate_treatment,
       round((CAST(conv_treatment AS DOUBLE) / users_treatment
              - CAST(conv_control AS DOUBLE) / users_control)
             / (CAST(conv_control AS DOUBLE) / users_control), 6)
         AS rel_lift
FROM wide
"""


# --------------------------------------------------------------------------
# Data-quality constraint report (operators/dq.py)
# --------------------------------------------------------------------------


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-gate constraint report over three tables. The events
    side gets deterministic planted corruption (md5-chosen NULL users
    and a bogus event type — mirrored literally in the oracle, like
    plant_pii) so the checker proves nonzero counting, not just
    all-green; orders/lineitem run clean uniqueness / nullability /
    range / referential checks. One scan per table + one anti-join."""
    from ..operators.dq import (
        accepted_values,
        check_table,
        in_range,
        not_null,
        ref_integrity,
        unique,
    )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hv = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 14),
               16, 10).cast("long") % 50
    )
    e = (
        load_events(spark, sf_dir)
        .withColumn(
            "user_id", F.when(hv == 0, F.lit(None)).otherwise(F.col("user_id"))
        )
        .withColumn(
            "event_type",
            F.when(hv == 1, F.lit("bogus")).otherwise(F.col("event_type")),
        )
    )
    report = (
        check_table(o, "orders", [
            unique("o_orderkey"),
            not_null("o_custkey"),
            in_range("o_totalprice", 0.0, 1e9),
        ])
        .unionByName(check_table(li, "lineitem", [
            not_null("l_orderkey"),
            in_range("l_discount", 0.0, 1.0),
        ]))
        .unionByName(check_table(e, "events", [
            not_null("user_id"),
            accepted_values(
                "event_type",
                ["click", "view", "purchase", "signup", "error"],
            ),
        ]))
        .unionByName(ref_integrity(li, o, "l_orderkey", "o_orderkey",
                                   "lineitem"))
    )
    return report


SQL_DQ_REPORT = """
WITH ev AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 14))
                     ::BIGINT % 50 = 0
              THEN NULL ELSE user_id END AS user_id,
         CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 14))
                     ::BIGINT % 50 = 1
              THEN 'bogus' ELSE event_type END AS event_type
  FROM events
),
rows0 AS (
  SELECT 'orders' AS "table", 'unique(o_orderkey)' AS "constraint",
         CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
           AS violations
  FROM orders
  UNION ALL
  SELECT 'orders', 'not_null(o_custkey)',
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders', 'in_range(o_totalprice,0.0,1000000000.0)',
         CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                        AND (o_totalprice < 0.0 OR o_totalprice > 1e9)
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem', 'not_null(l_orderkey)',
         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'in_range(l_discount,0.0,1.0)',
         CAST(sum(CASE WHEN l_discount IS NOT NULL
                        AND (l_discount < 0.0 OR l_discount > 1.0)
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'events', 'not_null(user_id)',
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM ev
  UNION ALL
  SELECT 'events', 'accepted_values(event_type)',
         CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                        ('click', 'view', 'purchase', 'signup', 'error')
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM ev
  UNION ALL
  SELECT 'lineitem', 'ref_integrity(l_orderkey->o_orderkey)',
         CAST((SELECT count(*) FROM lineitem l
               WHERE l.l_orderkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT)
)
SELECT "table", "constraint", violations, violations = 0 AS passed
FROM rows0
"""


# --------------------------------------------------------------------------
# Sliding-window distinct users (exact + linear-count sketch, side by side)
# --------------------------------------------------------------------------

_HD_M = 4096  # linear-counting bucket count per (window, type)


def q_hopping_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per event type, daily — the
    windowed-distinct rollup that is cheap to say and expensive to run
    at scale. Each event fans out to its 7 covering windows (map-side
    explode); then BOTH answers come from one grouped aggregation: the
    exact countDistinct (the expensive path — per-window user sets
    shuffle) and the linear-counting estimate over md5 buckets (the
    bounded path: ≤ m buckets per window no matter how many users).
    Shipping them side by side makes the sketch's error visible —
    and the oracle replays both, so the estimate must match to the
    last rounded digit."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 14),
               16, 10).cast("long") % _HD_M
    )
    # r13: the md5 bucket depends only on user_id — compute it ONCE per
    # event BEFORE the 7× window fan-out (7× fewer md5+conv evals,
    # identical values), and spread the narrow event rows across cores
    # first: the testdata scan is one unsplittable row group, so the
    # fan-out + hashing would otherwise run single-threaded (guide
    # §2.5 input skew, §2.3 compute-then-expand).
    e = load_events(spark, sf_dir).select(
        "event_type",
        F.col("user_id"),
        F.expr("ts_ms div 86400000").alias("day"),
    )
    e = spread_if_narrow(
        e, F.col("user_id"), F.col("day")
    ).withColumn("b", bucket)
    fan = e.select(
        "event_type", "user_id", "day", "b",
        F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("_i"),
    ).select(
        "event_type", "user_id", "b",
        (F.col("day") - F.col("_i")).alias("win_day"),
    )
    m = float(_HD_M)
    agg = (
        fan.groupBy("win_day", "event_type")
        .agg(
            F.countDistinct("user_id").cast("long").alias("exact_users"),
            F.countDistinct("b").cast("long").alias("occupied"),
        )
    )
    est = F.round(
        -F.lit(m) * F.log(
            (F.lit(m) - F.col("occupied").cast("double")) / F.lit(m)
        ), 6,
    )
    return agg.select(
        "win_day", "event_type", "exact_users", "occupied",
        est.alias("est_users"),
    )


SQL_HOPPING_DISTINCT = f"""
WITH fan AS (
  SELECT event_type, user_id,
         epoch_ms(ts) // 86400000 - i.i AS win_day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT
           % {_HD_M} AS b
  FROM events
  CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i
),
agg AS (
  SELECT win_day, event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
         CAST(count(DISTINCT b) AS BIGINT) AS occupied
  FROM fan GROUP BY 1, 2
)
SELECT win_day, event_type, exact_users, occupied,
       round(-{_HD_M}.0 * ln(({_HD_M}.0 - CAST(occupied AS DOUBLE))
                             / {_HD_M}.0), 6) AS est_users
FROM agg
"""


QUERIES_EXTRA: dict = {
    "hopping_distinct": q_hopping_distinct,
    "dq_report": q_dq_report,
    "ab_lift": q_ab_lift,
    "rolling_features": q_rolling_features,
    "snapshot_diff": q_snapshot_diff,
    "zorder_keys": q_zorder_keys,
    "global_index": q_global_index,
    "shuffle_shards": q_shuffle_shards,
    "kmv_overlap": q_kmv_overlap,
    "weighted_sample": q_weighted_sample,
    "embedding_project": q_embedding_project,
    "bloom_probe": q_bloom_probe,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "cms_counts": q_cms_counts,
    "k_core": q_k_core,
    "graph_triangles": q_graph_triangles,
    "merge_upsert": q_merge_upsert,
    "quantile_sketch": q_quantile_sketch,
    "fuzzy_match": q_fuzzy_match,
    "interval_join": q_interval_join,
    "knn_components": q_knn_components,
    "knn_components_star": q_knn_components_star,
    "gap_fill_ffill": q_gap_fill_ffill,
    "order_rank_stats": q_order_rank_stats,
    "salted_event_totals": q_salted_event_totals,
    "embedding_lsh_pairs": q_embedding_lsh_pairs,
    "dedup_keep_best": q_dedup_keep_best,
    "events_grouping_sets": q_events_grouping_sets,
    "hopping_window": q_hopping_window,
}

ORACLES_EXTRA: dict[str, str] = {
    "hopping_distinct": SQL_HOPPING_DISTINCT,
    "dq_report": SQL_DQ_REPORT,
    "ab_lift": SQL_AB_LIFT,
    "rolling_features": SQL_ROLLING_FEATURES,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "zorder_keys": SQL_ZORDER_KEYS,
    "global_index": SQL_GLOBAL_INDEX,
    "shuffle_shards": SQL_SHUFFLE_SHARDS,
    "kmv_overlap": SQL_KMV_OVERLAP,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "embedding_project": SQL_EMBEDDING_PROJECT,
    "bloom_probe": SQL_BLOOM_PROBE,
    "bpe_merges": SQL_BPE_MERGES,
    "bpe_encode": SQL_BPE_ENCODE,
    "cms_counts": SQL_CMS_COUNTS,
    "k_core": SQL_K_CORE,
    "graph_triangles": SQL_GRAPH_TRIANGLES,
    "merge_upsert": SQL_MERGE_UPSERT,
    "quantile_sketch": SQL_QUANTILE_SKETCH,
    "fuzzy_match": SQL_FUZZY_MATCH,
    "interval_join": SQL_INTERVAL_JOIN,
    "knn_components": SQL_KNN_COMPONENTS,
    "knn_components_star": SQL_KNN_COMPONENTS,
    "gap_fill_ffill": SQL_GAP_FILL_FFILL,
    "order_rank_stats": SQL_ORDER_RANK_STATS,
    "salted_event_totals": SQL_SALTED_EVENT_TOTALS,
    "embedding_lsh_pairs": SQL_EMBEDDING_LSH_PAIRS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "events_grouping_sets": SQL_EVENTS_GROUPING_SETS,
    "hopping_window": SQL_HOPPING_WINDOW,
}


_H_BITS = 8


def q_hilbert_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering keys over (user_id, epoch-second) —
    the locality upgrade of zorder_keys (consecutive keys are always
    grid-adjacent cells). Mins/maxs from one 1-row aggregate (the
    zorder_keys contract); the oracle replays all 8 quadrant-walk
    rounds as chained CTEs, so every key must match bit-for-bit."""
    from ..sources.maintenance import with_hilbert_key

    e = load_events(spark, sf_dir).select(
        "event_id", "user_id", F.expr("ts_ms div 1000").alias("ts_s")
    )
    row = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_s"), F.max("ts_s")
    ).first()
    return with_hilbert_key(
        e, "user_id", "ts_s",
        [row[0], row[2]], [row[1], row[3]], bits=_H_BITS,
    ).select("event_id", "hkey")


def _hilbert_oracle_sql() -> str:
    top = (1 << _H_BITS) - 1
    n = 1 << _H_BITS
    ctes = []
    prev = "l0"
    for i, b in enumerate(range(_H_BITS - 1, -1, -1)):
        s = 1 << b
        cur = f"l{i + 1}"
        ctes.append(f"""{cur} AS (
  SELECT event_id,
         d + {s * s} * CAST(xor(3 * rx, ry) AS BIGINT) AS d,
         CASE WHEN ry = 0
              THEN CASE WHEN rx = 1 THEN {n - 1} - y ELSE y END
              ELSE x END AS x,
         CASE WHEN ry = 0
              THEN CASE WHEN rx = 1 THEN {n - 1} - x ELSE x END
              ELSE y END AS y
  FROM (SELECT event_id, d, x, y,
               CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM {prev})
)""")
        prev = cur
    body = ",\n".join(ctes)
    return f"""
WITH stats AS (
  SELECT min(user_id) AS mnu, max(user_id) AS mxu,
         min(epoch_ms(ts) // 1000) AS mnt, max(epoch_ms(ts) // 1000) AS mxt
  FROM events
),
l0 AS (
  SELECT event_id,
         CAST(0 AS BIGINT) AS d,
         (user_id - s.mnu) * {top}
           // greatest(s.mxu - s.mnu, 1) AS x,
         (epoch_ms(ts) // 1000 - s.mnt) * {top}
           // greatest(s.mxt - s.mnt, 1) AS y
  FROM events, stats s
),
{body}
SELECT event_id, d AS hkey FROM {prev}
"""


SQL_HILBERT_KEYS = _hilbert_oracle_sql()
QUERIES_EXTRA["hilbert_keys"] = q_hilbert_keys
ORACLES_EXTRA["hilbert_keys"] = SQL_HILBERT_KEYS
