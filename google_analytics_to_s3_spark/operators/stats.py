"""Histogram quantile sketch — approximate percentiles without a global
sort. Beyond-reference capability complementing the exact
``order_percentiles`` driver query (percentile() materializes every
value per group; at 100 TB that is a sort-shaped memory hog), this is
the fixed-size alternative: O(n_bins) state per group regardless of
data volume, mergeable under partial aggregation, deterministic.

Plan shape:
1. one 1-row (min, max) aggregate per group key domain, broadcast;
2. map-side bin assignment, groupBy (group, bin) hash aggregation —
   the ONLY data-sized shuffle, emitting ≤ groups × n_bins rows;
3. cumulative window + quantile pick over the tiny bin table.

Accuracy: the estimate is the lower edge of the bin containing the
target rank — error ≤ one bin width of the value domain. Every
arithmetic step is either integer or the same IEEE-double expression
any SQL engine evaluates bit-identically, so the result carries a full
value oracle (unlike t-digest/KLL whose merge order is engine-owned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 256,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """(group..., p, bin, est_lo, n_rows) — per group, for each integer
    percentile p, the histogram bin holding rank ceil(p*n/100) and that
    bin's lower edge as the estimate.

    (min, max) span the WHOLE column (not per group): a shared binning
    grid keeps the broadcast stats row 1-row and makes sketches from
    different groups/partitions mergeable. Degenerate span (min == max)
    puts everything in bin 0 — the guard mirrors value_histograms.
    """
    v = F.col(value_col).cast("double")
    # NULL values must be dropped BEFORE binning: F.least() skips
    # NULL operands, so least(floor(NULL * ...), n_bins - 1) would
    # silently assign every NULL row to the top bin, corrupting both
    # the counts and the quantile estimates (ADVICE r7).
    df = df.filter(v.isNotNull())
    stats = df.agg(
        F.min(v).alias("_mn"), F.max(v).alias("_mx")
    )
    binned = (
        df.crossJoin(F.broadcast(stats))
        .select(
            *group_cols,
            F.when(
                F.col("_mx") > F.col("_mn"),
                F.least(
                    F.floor(
                        (v - F.col("_mn"))
                        * F.lit(float(n_bins))
                        / (F.col("_mx") - F.col("_mn"))
                    ),
                    F.lit(n_bins - 1),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = binned.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*group_cols)
        ).alias("n_rows"),
    )
    ps = F.explode(
        F.array(*[F.lit(p) for p in percentiles])
    ).alias("p")
    hit = (
        cum.select(*group_cols, "bin", "cum", "n_rows", ps)
        # integer target rank: ceil(p*n/100) on the bigint grid
        .filter(
            F.col("cum")
            >= F.expr("(p * n_rows + 99) div 100")
        )
        .groupBy(*group_cols, "p")
        .agg(
            F.min("bin").alias("bin"),
            F.first("n_rows").alias("n_rows"),
        )
    )
    return hit.crossJoin(F.broadcast(stats)).select(
        *group_cols,
        "p",
        "bin",
        (
            F.col("_mn")
            + F.col("bin").cast("double")
            * (F.col("_mx") - F.col("_mn"))
            / F.lit(float(n_bins))
        ).alias("est_lo"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — the
# frequency member of the repo's sketch quartet (Bloom: membership,
# HLL: distinct, histogram: quantiles, CMS: point frequency). State is
# d×w integer counters REGARDLESS of key cardinality; estimates
# overcount only (min over d rows), with error <= 2N/w at probability
# 1-2^-d. md5-derived positions make every counter — and every
# overcount — bit-identical in any SQL engine, so the sketch carries a
# full value oracle (unlike engine-native CMS whose hash seeds are
# implementation-owned).
# ---------------------------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH = 1024


def cms_pos(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Deterministic counter position of ``key`` in sketch row ``row``
    (same md5-prefix construction as the Bloom/HLL queries)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"c{row}-"), key.cast("string"))),
                1,
                14,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def count_min_build(
    items: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, pos, cnt) counter table — ≤ depth×width rows at ANY input
    size. One explode (depth rows per item) + one hash aggregation;
    mergeable across shards/batches by summing matching counters."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    keyed = items.select(
        F.col(key_col).alias("_k"), w.alias("_w")
    ).select(
        "_w",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_pos(F.col("_k"), r, width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_rp"),
    )
    return keyed.groupBy(
        F.col("_rp.row").alias("row"), F.col("_rp.pos").alias("pos")
    ).agg(F.sum("_w").alias("cnt"))


def count_min_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    est_col: str = "est",
) -> DataFrame:
    """Point-frequency estimates: min over the ``depth`` counters each
    probe key hashes to. The sketch (≤ depth×width rows) broadcasts;
    the probe side never shuffles beyond its own (key, row) fan-out."""
    fan = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_pos(F.col(key_col), r, width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_rp"),
    ).select(key_col, "_rp.row", "_rp.pos")
    hit = fan.join(F.broadcast(sketch), ["row", "pos"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("_c")
    )
    return hit.groupBy(key_col).agg(
        F.min("_c").cast("long").alias(est_col)
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with SET OPERATIONS — the
# Theta-sketch member of the quartet's missing axis: HLL/linear-count
# answer "how many distinct", but only a value-keeping sketch answers
# "how many distinct IN COMMON" (audience overlap, cross-segment
# reach). Beyer et al., SIGMOD 2007; Dasgupta et al.'s Theta sketches
# generalize the same estimator. State is k 56-bit hashes per group;
# union of sketches = k smallest of the merged hash sets, so sketches
# from shards/days merge losslessly; intersection is estimated from
# the union sketch by inclusion sampling (the Theta-sketch rule).
# md5-derived hashes make every sketch row — and thus every estimate —
# bit-identical in any SQL engine: full value oracle.
# ---------------------------------------------------------------------------

# 56-bit md5-prefix hash domain (matches the repo-wide
# ('0x' || substr(md5(x), 1, 14))::BIGINT convention).
KMV_SPACE = float(1 << 56)


def _h56(col: Column) -> Column:
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 14), 16, 10
    ).cast("long")


def kmv_sketches(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 128,
    prune_factor: int | None = None,
) -> DataFrame:
    """(group, h, r): the k smallest DISTINCT key hashes per group.

    Plan: one distinct on (group, hash) — the only data-sized shuffle —
    then a per-group window rank. The rank's local sort is over each
    group's distinct set; at extreme per-group cardinality pass
    ``prune_factor`` (e.g. 8): a per-group ``approx_count_distinct``
    sets a hash threshold ``SPACE * prune_factor * k / n_est`` and only
    hashes below it reach the sort. Pruning cannot change the result
    while >= k distinct hashes survive (the k smallest are all below
    any threshold that admits k rows); a group that ends up truncated
    (< k survivors with an active threshold) raises rather than
    returning a silently biased sketch — with factor 8 over HLL's ±5%
    error that is a Chernoff-tail event.
    """
    g = F.col(group_col)
    pairs = df.select(
        g.alias("grp"), _h56(F.col(key_col)).alias("h")
    ).distinct()

    est = None
    if prune_factor is not None:
        est = df.groupBy(g.alias("grp")).agg(
            F.approx_count_distinct(key_col).alias("_n_est")
        ).withColumn(
            "_thr",
            F.least(
                F.lit(KMV_SPACE),
                F.lit(KMV_SPACE * prune_factor * k)
                / F.greatest(F.col("_n_est"), F.lit(1)).cast("double"),
            ),
        )
        pairs = pairs.join(F.broadcast(est), "grp").filter(
            F.col("h").cast("double") < F.col("_thr")
        )

    w = Window.partitionBy("grp").orderBy("h")
    sk = pairs.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    if est is not None:
        # a pruned group may lose rows it needed — or vanish entirely —
        # so audit against the pre-filter group list, not the survivors
        survivors = sk.groupBy("grp").agg(F.count("*").alias("_n_sk"))
        bad = (
            est.join(survivors, "grp", "left")
            .filter(
                (F.col("_thr") < F.lit(KMV_SPACE))
                & (F.coalesce("_n_sk", F.lit(0)) < k)
            )
        )
        if bad.limit(1).count():
            raise ValueError(
                "kmv prune truncated a sketch; raise prune_factor"
            )
    return sk.select("grp", "h", "r")


def _kmv_est(n_col: Column, hk_col: Column, k: int) -> Column:
    """Distinct estimate from a sketch: exact count while the sketch is
    unsaturated (n < k rows hold EVERY distinct hash), else the KMV
    estimator (k-1) * SPACE / h_k. Double mult+div is IEEE-exact and
    engine-identical."""
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_SPACE) / hk_col.cast("double")
    )


def kmv_overlap(
    sketches: DataFrame,
    k: int = 128,
) -> DataFrame:
    """Pairwise audience overlap from per-group KMV sketches.

    For every unordered group pair (a < b): the union sketch is the k
    smallest hashes of the two sketches merged (exactly the sketch the
    union stream would have produced — the KMV merge theorem), and the
    intersection estimate is the Theta-sketch inclusion rule:
    ``matches / |union sketch|`` of the union estimate, where matches
    counts union-sketch hashes present in BOTH input sketches.

    Everything here is sketch-sized (groups × k rows): the pair table
    and the per-side hash sets broadcast; no data-sized work. Returns
    (type_a, type_b, est_a, est_b, n_union, matches, est_union,
    est_jaccard, est_intersection).
    """
    # the sketch table is consumed SIX times below (per-side stats,
    # both membership probes, the union merge twice); without a
    # checkpoint the entire upstream sketch construction — the one
    # data-sized distinct + window — replays per consumer (the r13
    # before-plan held 90 Exchanges / 104 Windows). Sketches are
    # groups × k rows, so the cache is trivially bounded.
    sk = sketches.select("grp", "h").localCheckpoint(eager=False)
    singles = sk.groupBy("grp").agg(
        F.count("*").alias("n"), F.max("h").alias("hk")
    )
    gs = singles.select("grp", _kmv_est(F.col("n"), F.col("hk"), k).alias("est"))

    # group-domain × group-domain — bounded by the (tiny) group
    # cardinality, same contract as the repo's 1-row stats crossJoins
    pairs = (
        gs.select(F.col("grp").alias("ta"), F.col("est").alias("est_a"))
        .crossJoin(
            F.broadcast(
                gs.select(F.col("grp").alias("tb"), F.col("est").alias("est_b"))
            )
        )
        .filter(F.col("ta") < F.col("tb"))
    )

    mem_a = pairs.select("ta", "tb").join(
        F.broadcast(sk.withColumnRenamed("grp", "ta")), "ta"
    )
    mem_b = pairs.select("ta", "tb").join(
        F.broadcast(sk.withColumnRenamed("grp", "tb")), "tb"
    )
    merged = mem_a.select("ta", "tb", "h").union(
        mem_b.select("ta", "tb", "h")
    ).distinct()
    wu = Window.partitionBy("ta", "tb").orderBy("h")
    # pairs × k rows, consumed by the membership chain AND the union
    # stats — checkpoint for the same replay reason as sk above
    uni = merged.withColumn("r", F.row_number().over(wu)).filter(
        F.col("r") <= k
    ).localCheckpoint(eager=False)

    in_a = uni.join(
        F.broadcast(sk.select(F.col("grp").alias("ta"), "h")), ["ta", "h"],
        "left_semi",
    )
    both = in_a.join(
        F.broadcast(sk.select(F.col("grp").alias("tb"), "h")), ["tb", "h"],
        "left_semi",
    )
    m = both.groupBy("ta", "tb").agg(F.count("*").alias("matches"))

    ustats = uni.groupBy("ta", "tb").agg(
        F.count("*").alias("n_union"), F.max("h").alias("hk")
    )
    out = (
        ustats.join(F.broadcast(m), ["ta", "tb"], "left")
        .join(F.broadcast(pairs), ["ta", "tb"])
        .withColumn("matches", F.coalesce("matches", F.lit(0)))
        .withColumn("est_union", _kmv_est(F.col("n_union"), F.col("hk"), k))
    )
    jac = F.col("matches").cast("double") / F.col("n_union").cast("double")
    return out.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.col("n_union").cast("long").alias("n_union"),
        F.col("matches").cast("long").alias("matches"),
        F.round("est_union", 4).alias("est_union"),
        F.round(jac, 6).alias("est_jaccard"),
        F.round(jac * F.col("est_union"), 4).alias("est_intersection"),
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 128) -> DataFrame:
    """Lossless union of two KMV sketch tables: per group, the k
    smallest hashes of the merged sets — by the KMV merge theorem,
    byte-identical to the sketch built over the concatenated streams.
    This is the incremental-ingest primitive: keep a standing sketch
    per day/shard and fold new batches in without re-scanning history;
    work is sketch-sized (≤ 2k rows per group enter the rank)."""
    u = (
        a.select("grp", "h").union(b.select("grp", "h")).distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return (
        u.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("grp", "h", "r")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence intervals.
#
# The scale-correct bootstrap: classical resampling draws n rows WITH
# replacement — impossible to coordinate across executors — but for
# large n the multinomial row-counts converge to independent
# Poisson(1), so each row can decide its own per-replicate multiplicity
# from a hash, with NO coordination and NO shuffle beyond the final
# B-row aggregation (Chamandy et al., "Estimating Uncertainty for
# Massive Data Streams", Google 2012). Deterministic here: the
# multiplicity is the inverse-CDF of Poisson(1) evaluated on a 40-bit
# md5 grid, so every replicate is bit-identical in any engine.
# ---------------------------------------------------------------------------

# P(X<=k)*2^40 for X~Poisson(1), k=0..5 (multiplicity capped at 6)
POISSON1_CDF_GRID = [
    404487723187, 808975446375, 1011219307969,
    1078633928500, 1095487583633, 1098858314660,
]
_BOOT_SPACE = 1 << 40


def bootstrap_multiplicity(key: Column, rep: Column) -> Column:
    """Deterministic Poisson(1) draw for (row key, replicate index)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("-", F.lit("boot"), key, rep)), 1, 10
            ),
            16, 10,
        ).cast("long")
        % _BOOT_SPACE
    )
    out = F.lit(len(POISSON1_CDF_GRID))
    for k in range(len(POISSON1_CDF_GRID) - 1, -1, -1):
        out = F.when(u < POISSON1_CDF_GRID[k], F.lit(k)).otherwise(out)
    return out


BOOT_VALUE_GRID = 1 << 20


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_reps: int = 64,
    lo_rank: int = 2,
    hi_rank: int = 63,
) -> DataFrame:
    """Percentile-bootstrap CI for ``mean(value_col)``: one row with the
    point estimate and the [lo_rank, hi_rank] order statistics of the
    ``n_reps`` replicate means (ranks are 1-based over the ascending
    replicate list; the 64-rep default brackets ~95%).

    Shape: rows fan out ×n_reps map-side (explode of a literal array),
    weighted sums aggregate straight down to n_reps rows, and the final
    percentile step sorts a n_reps-length array — driver-scale work
    bounded by B, never by the data.

    Exactness: values are quantized to the binary ``BOOT_VALUE_GRID``
    (``floor(v * 2^20)`` — a power-of-two scale, so the quantization
    itself is float-exact), all sums are BIGINT (order-independent),
    and each mean is ONE double division — bit-identical in any engine,
    unlike DECIMAL division whose result-scale rules are engine-local.
    """
    reps = F.explode(
        F.array(*[F.lit(b) for b in range(n_reps)])
    ).alias("rep")
    vg = F.floor(
        F.col(value_col).cast("double") * F.lit(BOOT_VALUE_GRID)
    ).cast("long")
    fan = df.select(F.col(key_col).alias("_k"), vg.alias("_v"), reps)
    w = bootstrap_multiplicity(F.col("_k"), F.col("rep"))
    # A replicate whose drawn weights are all zero has no resample and
    # no defined mean; it is dropped BEFORE the division (HAVING
    # sum(w) > 0) on both engines — without the guard the 0/0 result is
    # engine-local (NULL vs inf) and silently shifts the rank order
    # statistics. Only plausible on tiny inputs, but tiny inputs are
    # exactly what the oracle runs on.
    per_rep = (
        fan.withColumn("_w", w)
        .groupBy("rep")
        .agg(
            F.sum(F.col("_v") * F.col("_w")).alias("_sv"),
            F.sum("_w").alias("_sw"),
        )
        .filter(F.col("_sw") > 0)
        .select(
            (
                F.col("_sv").cast("double")
                / (F.col("_sw") * F.lit(BOOT_VALUE_GRID)).cast("double")
            ).alias("mean_b")
        )
    )
    point = df.select(vg.alias("_v")).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("_v").cast("double")
            / (F.count(F.lit(1)) * F.lit(BOOT_VALUE_GRID)).cast("double")
        ).alias("point_est"),
    )
    # Ranks clamped to the surviving replicate count (and >= 1) so a
    # thinned replicate list degrades to wider-but-defined bounds
    # instead of an out-of-range error / NULL.
    lo_idx = F.greatest(F.lit(1), F.least(F.lit(lo_rank), F.size("_ms")))
    hi_idx = F.greatest(F.lit(1), F.least(F.lit(hi_rank), F.size("_ms")))
    boots = per_rep.agg(
        F.array_sort(F.collect_list("mean_b")).alias("_ms")
    ).select(
        F.round(F.try_element_at("_ms", lo_idx), 6).alias("boot_lo"),
        F.round(F.try_element_at("_ms", hi_idx), 6).alias("boot_hi"),
    )
    return point.crossJoin(boots).select(
        "n", F.round("point_est", 6).alias("point_est"),
        "boot_lo", "boot_hi",
    )


CHI2_CRIT_95 = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729}


def srm_check(
    assignments: DataFrame,
    arm_col: str,
    expected_weights: dict[str, float],
) -> DataFrame:
    """Sample-ratio-mismatch check for an A/B assignment table: the
    chi-square goodness-of-fit of observed arm counts against the
    configured split, the guardrail every experimentation platform
    runs BEFORE reading a lift number (a biased assignment invalidates
    q_ab_lift's readout entirely).

    ``assignments`` is one row per unit (deduplication is the caller's
    contract); ``expected_weights`` maps every arm to its design
    weight (normalized here). Output: one row per arm with observed /
    expected counts and the chi2 contribution, plus the global
    ``chi2`` and ``srm_alarm`` (95% critical value for k-1 dof)
    replicated on each row.

    Shape: one data-sized hash aggregation down to k arm counts;
    everything after runs on the k-row table (windows over k rows, a
    broadcast-sized literal join). Integer counts, one double division
    per term, round(6) — engine-exact.
    """
    counts = assignments.groupBy(
        F.col(arm_col).alias("arm")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    return srm_from_counts(counts, expected_weights)


def srm_from_counts(
    counts: DataFrame,
    expected_weights: dict[str, float],
) -> DataFrame:
    """:func:`srm_check` finalization over a PRE-AGGREGATED
    ``(arm, n_obs)`` table — the entry point a streaming guardrail
    uses: arm counts accumulate natively under complete-mode streaming
    aggregation (or a foreachBatch fold), and this k-row chi-square
    finalization runs against the standing counts each trigger.
    Everything here moves k rows.
    """
    arms = sorted(expected_weights)
    wsum = float(sum(expected_weights.values()))
    k = len(arms)
    if k < 2:
        raise ValueError("srm_check needs >= 2 arms")
    crit = CHI2_CRIT_95.get(k - 1)
    if crit is None:
        raise ValueError(f"no tabulated 95% critical value for dof {k - 1}")
    spark = counts.sparkSession
    # FULL-OUTER semantics with ZERO joins: the design is a driver-side
    # dict, so the weight lookup is a literal when-chain over the
    # observed counts — arms OBSERVED but absent from the design (a
    # config bug, exactly what an SRM guardrail must surface) get
    # expected weight 0 instead of being silently dropped — and arms
    # in the design with zero observations enter via a k-row literal
    # union (n_obs -> 0). The follow-up k-row merge aggregation is the
    # only extra node; a full outer join here would be un-broadcastable
    # and cost a SortMergeJoin.
    w_expr = F.lit(0.0)
    for a in arms:
        w_expr = F.when(
            F.col("arm") == a, F.lit(expected_weights[a] / wsum)
        ).otherwise(w_expr)
    design = spark.createDataFrame(
        [(a, 0, expected_weights[a] / wsum) for a in arms],
        "arm string, n_obs long, w double",
    )
    j = (
        counts.select(
            "arm", F.col("n_obs").cast("long").alias("n_obs"),
            w_expr.alias("w"),
        )
        .unionByName(design)
        .groupBy("arm")
        .agg(
            F.sum("n_obs").cast("long").alias("n_obs"),
            F.max("w").alias("w"),
        )
    )
    wall = Window.partitionBy()
    scored = j.select(
        "arm", "n_obs",
        (F.sum("n_obs").over(wall).cast("double") * F.col("w"))
        .alias("n_exp"),
    ).select(
        "arm", "n_obs", F.round("n_exp", 6).alias("n_exp"),
        # chi-square term; an observed arm with expected count 0 has a
        # mathematically infinite contribution, so the alarm fires
        F.when(
            F.col("n_exp") > 0,
            (F.col("n_obs").cast("double") - F.col("n_exp"))
            * (F.col("n_obs").cast("double") - F.col("n_exp"))
            / F.col("n_exp"),
        ).when(
            F.col("n_obs") > 0, F.lit(float("inf"))
        ).otherwise(F.lit(0.0)).alias("_term"),
    )
    return scored.select(
        "arm", "n_obs", "n_exp",
        F.round("_term", 6).alias("chi2_term"),
        F.round(F.sum("_term").over(wall), 6).alias("chi2"),
        (F.sum("_term").over(wall) > F.lit(crit)).alias("srm_alarm"),
    )


def cuped_lift(
    per_user: DataFrame,
    arm_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM
    2013): adjust each unit's post-period metric by its own pre-period
    covariate, Y' = Y - theta*(X - E[X]) with theta = cov(X, Y)/var(X),
    and report per-arm adjusted means plus the pooled theta and
    variance-reduction factor (the squared X-Y correlation).

    ``per_user`` is one row per unit with integral (cents/count)
    ``pre_col`` / ``post_col`` — integral inputs make every sufficient
    statistic (n, Sx, Sy, Sxy, Sxx, Syy per arm) an exact BIGINT, so
    theta and the adjusted means are the same one-shot double
    expressions in any engine (the bootstrap/histogram parity recipe).
    Since the adjustment is linear, adjusted arm means need only
    arm-level sums: mean(Y'_a) = mean(Y_a) - theta*(mean(X_a) - E[X]).

    Shape: ONE hash aggregation down to k arm rows carrying the
    sufficient statistics; all CUPED algebra runs on that k-row table
    (a window over k rows). Degenerate var(X) == 0 or var(Y) == 0
    yields theta = 0 / var_reduction = 0 (no adjustment) instead of a
    0/0.
    """
    x = F.col(pre_col).cast("long")
    y = F.col(post_col).cast("long")
    per_arm = per_user.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
    )
    wall = Window.partitionBy()
    d = F.col
    pooled = per_arm.select(
        "arm", "n", "sx", "sy",
        F.sum("n").over(wall).cast("double").alias("gn"),
        F.sum("sx").over(wall).cast("double").alias("gsx"),
        F.sum("sy").over(wall).cast("double").alias("gsy"),
        F.sum("sxy").over(wall).cast("double").alias("gsxy"),
        F.sum("sxx").over(wall).cast("double").alias("gsxx"),
        F.sum("syy").over(wall).cast("double").alias("gsyy"),
    )
    mean_x = d("gsx") / d("gn")
    mean_y = d("gsy") / d("gn")
    cov = d("gsxy") / d("gn") - mean_x * mean_y
    var_x = d("gsxx") / d("gn") - mean_x * mean_x
    var_y = d("gsyy") / d("gn") - mean_y * mean_y
    theta = F.when(var_x > 0, cov / var_x).otherwise(F.lit(0.0))
    vr = F.when(
        (var_x > 0) & (var_y > 0), cov * cov / (var_x * var_y)
    ).otherwise(F.lit(0.0))
    arm_mean_y = d("sy").cast("double") / d("n").cast("double")
    arm_mean_x = d("sx").cast("double") / d("n").cast("double")
    return pooled.select(
        "arm", "n",
        F.round(arm_mean_x, 6).alias("mean_pre"),
        F.round(arm_mean_y, 6).alias("mean_post"),
        F.round(
            arm_mean_y - theta * (arm_mean_x - mean_x), 6
        ).alias("mean_post_adj"),
        F.round(theta, 6).alias("theta"),
        F.round(vr, 6).alias("var_reduction"),
    )


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Kaplan-Meier survival estimator with right censoring — the
    standard time-to-event curve (time-to-churn, time-to-conversion)
    no GA-style mart computes correctly by naive means: censored
    subjects (still active at observation end) must stay in the
    risk set until their censoring time, not be dropped or counted
    as events.

    Input: ONE ROW PER SUBJECT with an integral ``duration_col``
    (periods observed, >= 1) and ``event_col`` 1 = event occurred
    (churned/converted) at that duration, 0 = censored there.

    Per group, for each duration t that has >= 1 event:
        n_at_risk(t) = #subjects with duration >= t
        d(t)         = #events at exactly t
        S(t)         = prod_{t' <= t, d>0} (1 - d(t')/n(t'))
    computed as ``exp(sum(ln(1 - d/n)))`` over the ascending-duration
    window (the repo's documented ln-parity convention, rounded to 6);
    a timepoint where the whole risk set dies (d == n) pins S at 0.0
    exactly in both engines (Spark ln(0) is NULL, DuckDB -inf — the
    case must not reach ln).

    Scale shape: one hash aggregation compacts subjects to
    (group, duration) grain — the window then runs over |durations|
    rows per group, never subject rows, so the per-group single
    reducer touches a domain-sized table (bounded by the observation
    span, e.g. days).  No collect, no global sort.
    """
    group_cols = list(group_cols)
    ev = F.col(event_col).cast("long")
    g = subjects.groupBy(
        *group_cols, F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.sum(ev).alias("d"),
        F.count(F.lit(1)).alias("m"),
    )
    w_desc = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = g.withColumn("n_at_risk", F.sum("m").over(w_desc))
    w_asc = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ln terms only for event timepoints that leave survivors; a
    # d == n timepoint zeroes the curve from there on
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk")),
        F.log(
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    wiped = F.max(
        (F.col("d") == F.col("n_at_risk")).cast("int")
    ).over(w_asc)
    surv = F.when(wiped == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(w_asc))
    )
    return (
        at_risk.withColumn("survival", F.round(surv, 6))
        .withColumn(
            "hazard",
            F.round(
                F.col("d").cast("double")
                / F.col("n_at_risk").cast("double"),
                6,
            ),
        )
        .filter(F.col("d") > 0)
        .select(
            *group_cols,
            F.col("t"),
            F.col("n_at_risk"),
            F.col("d").alias("d_events"),
            "hazard", "survival",
        )
    )


def msprt_monitor(
    obs: DataFrame,
    period_col: str,
    arm_col: str,
    conv_col: str,
    treatment: str,
    control: str,
    tau2: float = 0.01,
) -> DataFrame:
    """Always-valid sequential A/B monitoring via the mixture
    Sequential Probability Ratio Test (mSPRT, Johari et al., "Peeking
    at A/B Tests", KDD'17 — public literature): the anytime-valid
    companion to the fixed-horizon ab_lift / ab_srm / ab_cuped suite.
    Peeking at a classic t-test every day inflates false positives;
    the mSPRT p-value is valid at EVERY look by construction.

    Input: one row per observation with an integral ``period_col``
    (day), an arm label, and a 0/1 ``conv_col``. Per period, over the
    CUMULATIVE two-sample stats (normal approximation, pooled
    binomial variance, N(0, tau2) mixture prior):

        V_n      = p(1-p) (1/n_t + 1/n_c)     (pooled p, cumulative)
        Lambda_n = sqrt(V_n/(V_n+tau2))
                   * exp(theta^2 tau2 / (2 V_n (V_n+tau2)))
        p_n      = min(1, 1 / max_{m<=n} Lambda_m)   (monotone)

    Degenerate periods (an arm still empty, or a pooled rate of 0/1
    making V_n = 0) pin Lambda at 1 — no evidence — instead of
    dividing by zero.

    Scale shape: ONE hash aggregation compacts observations to
    (period, arm) grain; every window after that runs over the
    period-grain table (bounded by the observation span — the repo's
    moving_revenue convention for day-grain global-order windows).
    Output per period: n_t, n_c, conv_t, conv_c, lift (round 6),
    lambda_sprt (round 6), p_always_valid (round 6).
    """
    per = (
        obs.filter(F.col(arm_col).isin([treatment, control]))
        .groupBy(
            F.col(period_col).cast("long").alias("period"),
            F.col(arm_col).alias("_arm"),
        )
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(conv_col).cast("long")).alias("_s"),
        )
    )
    t = F.when(F.col("_arm") == treatment, F.col("_n"))
    c = F.when(F.col("_arm") == control, F.col("_n"))
    ts = F.when(F.col("_arm") == treatment, F.col("_s"))
    cs = F.when(F.col("_arm") == control, F.col("_s"))
    byp = per.groupBy("period").agg(
        F.coalesce(F.sum(t), F.lit(0)).alias("dn_t"),
        F.coalesce(F.sum(c), F.lit(0)).alias("dn_c"),
        F.coalesce(F.sum(ts), F.lit(0)).alias("ds_t"),
        F.coalesce(F.sum(cs), F.lit(0)).alias("ds_c"),
    )
    w = (
        Window.orderBy("period")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = byp.select(
        "period",
        F.sum("dn_t").over(w).alias("n_t"),
        F.sum("dn_c").over(w).alias("n_c"),
        F.sum("ds_t").over(w).alias("s_t"),
        F.sum("ds_c").over(w).alias("s_c"),
    )
    n_t = F.col("n_t").cast("double")
    n_c = F.col("n_c").cast("double")
    p_t = F.col("s_t").cast("double") / n_t
    p_c = F.col("s_c").cast("double") / n_c
    pool = (F.col("s_t") + F.col("s_c")).cast("double") / (n_t + n_c)
    v = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / n_t + F.lit(1.0) / n_c)
    theta = p_t - p_c
    lam = F.when(
        (F.col("n_t") > 0) & (F.col("n_c") > 0) & (v > 0),
        F.sqrt(v / (v + F.lit(tau2)))
        * F.exp(
            theta * theta * F.lit(tau2)
            / (F.lit(2.0) * v * (v + F.lit(tau2)))
        ),
    ).otherwise(F.lit(1.0))
    scored = cum.withColumn("_lam", lam)
    run_max = F.max("_lam").over(w)
    return scored.select(
        "period", "n_t", "n_c",
        F.col("s_t").alias("conv_t"),
        F.col("s_c").alias("conv_c"),
        F.round(
            F.when((F.col("n_t") > 0) & (F.col("n_c") > 0), theta)
            .otherwise(F.lit(0.0)), 6,
        ).alias("lift"),
        F.round(F.col("_lam"), 6).alias("lambda_sprt"),
        F.round(F.least(F.lit(1.0), F.lit(1.0) / run_max), 6)
          .alias("p_always_valid"),
    )


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """EXACT ROC-AUC (equivalently the Mann-Whitney U statistic) per
    group, with correct tie handling — the model-eval primitive a
    training pipeline needs to score its quality/uplift classifiers
    (the distributed logreg in operators/curation.py emits scores;
    this grades them) without sampling or sklearn.

    Tie-aware rank algebra at SCORE grain, never row grain: aggregate
    to (group, score) -> (n, n_pos); ascending-score cumulative counts
    give each tie block's average rank as the exact integer
    ``2*avg_rank = 2*cum_before + n + 1``; then

        AUC = (2*S - P*(P+1)) / (2*P*N),   2S = sum(p * 2*avg_rank)

    — all BIGINT until the single final division (round 6), so any
    engine reproduces it bit-for-bit. Groups with no positives or no
    negatives yield NULL auc (undefined), not a crash.

    Scale shape: one hash aggregation compacts rows to the score
    domain; the window and final rollup run over (group, |distinct
    scores|) rows. Precondition: 2*S must stay below 2^63 —
    n_rows * (n_pos + ...) ~ n^2 per group; for n per group beyond
    ~2^31 aggregate scores to a coarser grid first.
    """
    group_cols = list(group_cols)
    lab = F.col(label_col).cast("long")
    g1 = df.groupBy(
        *group_cols, F.col(score_col).alias("_score")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(lab).alias("_p"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_score").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = g1.withColumn(
        "_r2",  # p * (2 * cum_before + n + 1)
        F.col("_p") * (
            2 * (F.sum("_n").over(w) - F.col("_n"))
            + F.col("_n") + F.lit(1)
        ),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum("_r2").alias("_s2"),
        F.sum("_p").alias("_pos"),
        (F.sum("_n") - F.sum("_p")).alias("_neg"),
    )
    auc = F.when(
        (F.col("_pos") > 0) & (F.col("_neg") > 0),
        F.round(
            (
                F.col("_s2") - F.col("_pos") * (F.col("_pos") + 1)
            ).cast("double")
            / (F.lit(2.0) * F.col("_pos").cast("double")
               * F.col("_neg").cast("double")),
            6,
        ),
    )
    return agg.select(
        *group_cols,
        F.col("_pos").alias("n_pos"),
        F.col("_neg").alias("n_neg"),
        auc.alias("auc"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error — the other
    half of the model-eval pair with :func:`binary_auc` (AUC ranks;
    calibration asks whether score 0.8 MEANS 80%). Scores must lie in
    [0, 1]; out-of-range rows fail loudly at execution.

    Equal-width bins: ``bin = least(floor(score * n_bins), n_bins-1)``
    (the 1.0 edge folds into the last bin). Per bin: count, mean
    score (confidence), positive rate (accuracy); plus every row
    carries the overall ``ece = sum_b (n_b / N) * |acc_b - conf_b|``
    — one extra 1-row broadcast, so the report stays a single frame.

    Determinism: scores enter the sums on the repo's integer
    micro-grid (``round(score * 10^6)`` as BIGINT — quantization
    <= 5e-7, invisible at round-6 output), which makes every
    aggregate an order-independent integer sum; even the ECE
    numerator stays integral (``|pos*10^6 - ssum|`` per bin), so the
    whole report is exact integer algebra until three final round-6
    divisions — bit-identical on any engine and any partitioning.

    Scale shape: one hash aggregation to <= n_bins rows; everything
    after is literal-sized.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    GRID = 1_000_000
    s = F.col(score_col).cast("double")
    guarded = F.when(
        (s >= 0.0) & (s <= 1.0), s
    ).otherwise(
        F.raise_error(F.concat(
            F.lit("calibration_report: score outside [0, 1]: "),
            s.cast("string"),
        ))
    )
    b = F.least(
        F.floor(guarded * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    bins = df.select(
        b.alias("bin"),
        F.round(guarded * GRID).cast("long").alias("_sq"),
        F.col(label_col).cast("long").alias("_y"),
    ).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_sq").alias("_ssum"),
        F.sum("_y").alias("_pos"),
    )
    nd = F.col("n").cast("double")
    conf = F.col("_ssum").cast("double") / F.lit(float(GRID)) / nd
    acc = F.col("_pos").cast("double") / nd
    scored = bins.select(
        "bin", "n",
        F.round(conf, 6).alias("confidence"),
        F.round(acc, 6).alias("accuracy"),
        F.abs(F.col("_pos") * GRID - F.col("_ssum")).alias("_wq"),
        F.col("n").alias("_nn"),
    )
    tot = scored.agg(
        F.round(
            F.sum("_wq").cast("double")
            / (F.lit(float(GRID)) * F.sum("_nn").cast("double")),
            6,
        ).alias("ece")
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .select("bin", "n", "confidence", "accuracy", "ece")
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    group_cols: "tuple[str, ...] | list[str]",
    top_share: float = 0.1,
    **ranking_kwargs,
) -> DataFrame:
    """Exact Gini coefficient + top-share concentration of an integer
    value column per group — the revenue-concentration mart ("10% of
    users drive X% of revenue") every LTV analysis reaches for.

    With ranks 1..n ascending by ``(value, tie)`` (a total order —
    ``tie_col`` unique within group) the Gini index is the exact
    integer algebra

        G = (2 * sum(rank * x) - (n + 1) * sum(x)) / (n * sum(x))

    and the top-share is ``sum(x where rank > n - floor(top_share*n))
    / sum(x)`` — the revenue share of the top ``top_share`` fraction
    of rows (floor'd count, so tiny groups take 0 top rows). Ranks
    come from :func:`~..operators.indexing.exact_group_ranks` — no
    per-group single-reducer sort at any scale; sums accumulate as
    DECIMAL(38,0) (rank * cents overflows int64 on real data). One
    output row per group: ``(group..., n, total, gini, top_n,
    top_value_share)``; ``gini`` NULL when the group total is 0.
    """
    from .indexing import exact_group_ranks

    gcols = list(group_cols)
    ranked = exact_group_ranks(
        df, value_col, tie_col, gcols,
        rank_col="_rank", n_col="_n", **ranking_kwargs,
    )
    dec = F.col(value_col).cast("decimal(38,0)")
    topk = F.floor(F.lit(float(top_share)) * F.col("_n")).cast("long")
    agg = ranked.groupBy(*gcols).agg(
        F.max("_n").cast("long").alias("n"),
        F.sum(dec).alias("_total"),
        F.sum(F.col("_rank").cast("decimal(38,0)") * dec).alias("_rx"),
        F.sum(
            F.when(F.col("_rank") > F.col("_n") - topk, dec).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("_top"),
        F.max(topk).alias("top_n"),
    )
    n = F.col("n").cast("decimal(38,0)")
    gini = (
        (F.lit(2).cast("decimal(38,0)") * F.col("_rx")
         - (n + 1) * F.col("_total")).cast("double")
        / (n * F.col("_total")).cast("double")
    )
    return agg.select(
        *gcols,
        "n",
        F.col("_total").cast("long").alias("total"),
        F.round(F.when(F.col("_total") > 0, gini), 6).alias("gini"),
        "top_n",
        F.round(
            F.when(
                F.col("_total") > 0,
                F.col("_top").cast("double")
                / F.col("_total").cast("double"),
            ),
            6,
        ).alias("top_value_share"),
    )


def did_lift(
    df: DataFrame,
    value_col: str,
    treat_col: str,
    post_col: str,
    group_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Difference-in-differences estimate from exact sufficient
    statistics — the quasi-experimental readout (Card & Krueger 1994)
    for launches that could not be randomized: the treatment effect is
    the post-minus-pre change in the treated group minus the same
    change in the control group, cancelling shared time trends.

    ``df`` is at analysis-unit-x-period grain with an INTEGER metric
    (cents — the caller quantizes, same contract as ``cuped_lift``),
    ``treat_col``/``post_col`` 0/1 ints. One conditional hash
    aggregation per group produces the four cell (n, sum) pairs; the
    estimate is pure arithmetic on those 8 numbers — scale-flat like
    ``ab_lift``, no second scan, no join. Cells are divided in double
    in a fixed order so a SQL oracle replays the result bit-for-bit.

    Output per group: the four cell sizes, the four cell means
    (round 6), and ``did`` = (m_t1 - m_t0) - (m_c1 - m_c0) (round 6;
    NULL when any cell is empty). At 100 TB the pre-aggregation to
    unit grain is the only data-sized shuffle.
    """
    gcols = list(group_cols)
    t, p = F.col(treat_col), F.col(post_col)
    v = F.col(value_col).cast("long")

    def cell(ti: int, pi: int, name: str):
        m = (t == ti) & (p == pi)
        return [
            F.sum(F.when(m, 1).otherwise(0)).cast("long")
             .alias(f"n_{name}"),
            F.sum(F.when(m, v).otherwise(F.lit(0).cast("long")))
             .cast("long").alias(f"_s_{name}"),
        ]

    agg = df.groupBy(*gcols).agg(
        *cell(0, 0, "c0"), *cell(0, 1, "c1"),
        *cell(1, 0, "t0"), *cell(1, 1, "t1"),
    )

    def mean(name: str) -> Column:
        return F.when(
            F.col(f"n_{name}") > 0,
            F.col(f"_s_{name}").cast("double")
            / F.col(f"n_{name}").cast("double"),
        )

    did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    return agg.select(
        *gcols,
        "n_c0", "n_c1", "n_t0", "n_t1",
        F.round(mean("c0"), 6).alias("mean_c0"),
        F.round(mean("c1"), 6).alias("mean_c1"),
        F.round(mean("t0"), 6).alias("mean_t0"),
        F.round(mean("t1"), 6).alias("mean_t1"),
        F.round(did, 6).alias("did"),
    )


# --------------------------------------------------------------------------
# deterministic-HLL register helpers (the mergeable form of the
# hll_users sketch — registers are a mart, re-aggregation is max-merge)
# --------------------------------------------------------------------------

HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
HLL_WBITS = 56 - HLL_P  # 46 value bits -> rho in [1, 47]
HLL_RMAX = HLL_WBITS + 1
# alpha_m * m^2 * 2^47 folded into ONE python double, embedded
# identically in both engines (single division at the end stays exact)
HLL_NUM = 0.7213 / (1.0 + 1.079 / HLL_M) * float(HLL_M * HLL_M) * float(
    1 << HLL_RMAX
)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: "list[str] | tuple[str, ...]",
) -> DataFrame:
    """Deterministic-HLL register table per group: ``(group...,
    bucket, mj)`` with ``mj`` the max leading-zero rank of the 56-bit
    md5 hash of ``key_col`` in that bucket (the ``hll_users``
    construction, factored out so registers can be PERSISTED as a
    mart). Registers are mergeable by ``max(mj)`` over any grouping —
    the COUNT DISTINCT analogue of ``merge_rollup``'s algebraic
    partials. One partial-aggregated shuffle; raw keys never travel
    past the map side; output ≤ groups x 1024 rows.
    """
    gcols = list(group_cols)
    return (
        df.select(
            *gcols,
            F.conv(
                F.substring(F.md5(F.col(key_col).cast("string")), 1, 14),
                16, 10,
            ).cast("long").alias("_h"),
        )
        .select(
            *gcols,
            (F.col("_h") % HLL_M).alias("bucket"),
            F.expr(f"_h div {HLL_M}").alias("_w"),
        )
        .select(
            *gcols, "bucket",
            F.when(
                F.col("_w") > 0,
                F.lit(HLL_RMAX) - F.length(F.expr("bin(_w)")),
            ).otherwise(F.lit(HLL_RMAX)).cast("int").alias("rho"),
        )
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: "list[str] | tuple[str, ...]",
    out_col: str = "hll_estimate",
) -> DataFrame:
    """Fold a (possibly re-grouped) register table to the closed-form
    HLL estimate per group — ``registers`` has columns ``(group...,
    bucket, mj)`` where the same bucket may appear many times (e.g.
    day-grain registers being rolled up to week grain): the merge is
    ``max(mj)`` per (group, bucket), exactly the union semantics of
    the sketch. Small-range linear-counting correction as in
    ``hll_users``. All arithmetic replayable in SQL (integer register
    sums, one double division, one fixed-order ln).
    """
    gcols = list(group_cols)
    merged = registers.groupBy(*gcols, "bucket").agg(
        F.max("mj").alias("mj")
    )
    agg = merged.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("occupied"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - mj)")
        ).alias("_s_occ"),
    )
    s = (
        F.col("_s_occ")
        + (F.lit(HLL_M) - F.col("occupied")) * F.lit(1 << HLL_RMAX)
    ).cast("double")
    raw = F.lit(HLL_NUM) / s
    v = F.lit(HLL_M) - F.col("occupied")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *gcols, "occupied", F.round(est, 6).alias(out_col)
    )


NDCG_GRID = 1 << 40


def ndcg_weights(k: int) -> list[int]:
    """Integer position weights ``round(2^40 / log2(pos + 1))`` for
    pos 1..k — Python-computed literals embedded identically in both
    engines, so DCG sums are EXACT BIGINT arithmetic (the repo's
    integer-grid convention: a distributed double sum is
    order-nondeterministic, an integer sum is not)."""
    import math

    return [round(NDCG_GRID / math.log2(p + 1)) for p in range(1, k + 1)]


def ndcg_at_k(
    df: DataFrame,
    query_cols: "list[str] | tuple[str, ...]",
    score_col: str,
    rel_col: str,
    tie_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact NDCG@k per query — the graded ranking-quality metric
    (Järvelin & Kekäläinen TOIS'02) completing the model-eval family
    (``binary_auc`` ranks binary labels; NDCG scores a retrieval
    ranking against graded relevance).

    ``df`` has one row per (query, candidate): the model's
    ``score_col``, the judged integer ``rel_col`` (0..5), and a unique
    ``tie_col`` making both orderings total. Gains are ``2^rel - 1``
    (BIGINT); position discounts are the :func:`ndcg_weights` integer
    literals, so DCG@k and ideal-DCG@k accumulate as exact integer
    sums on the 2^40 grid — one double division at the end.

    Plan: both row_numbers (model order, ideal order) share ONE
    exchange on the query key (two sorts, no second shuffle), then a
    hash aggregation to query grain. Output: ``(query..., n_candidates,
    dcg, idcg, ndcg)`` (dcg/idcg on the value scale, round 6; ndcg
    NULL when all judgments are 0).
    """
    gcols = list(query_cols)
    ws = ndcg_weights(k)
    warr = F.array(*[F.lit(w).cast("long") for w in ws])
    w_model = Window.partitionBy(*gcols).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    w_ideal = Window.partitionBy(*gcols).orderBy(
        F.col(rel_col).desc(), F.col(tie_col).asc()
    )
    gain = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({rel_col} AS INT))"
        " - CAST(1 AS BIGINT)"
    )
    ranked = df.select(
        *gcols,
        gain.alias("_gain"),
        F.row_number().over(w_model).alias("_pos"),
        F.row_number().over(w_ideal).alias("_ipos"),
    )
    zero = F.lit(0).cast("long")
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(
            F.when(
                F.col("_pos") <= k,
                F.col("_gain") * F.element_at(warr, F.col("_pos")),
            ).otherwise(zero)
        ).alias("_dcg_s"),
        F.sum(
            F.when(
                F.col("_ipos") <= k,
                F.col("_gain") * F.element_at(warr, F.col("_ipos")),
            ).otherwise(zero)
        ).alias("_idcg_s"),
    )
    grid = F.lit(float(NDCG_GRID))
    return agg.select(
        *gcols,
        "n_candidates",
        F.round(F.col("_dcg_s").cast("double") / grid, 6).alias("dcg"),
        F.round(F.col("_idcg_s").cast("double") / grid, 6).alias("idcg"),
        F.round(
            F.when(
                F.col("_idcg_s") > 0,
                F.col("_dcg_s").cast("double")
                / F.col("_idcg_s").cast("double"),
            ),
            6,
        ).alias("ndcg"),
    )


def ips_policy_value(
    df: DataFrame,
    logged_action_col: str,
    target_action_col: str,
    reward_col: str,
    propensity: float,
    group_cols: "list[str] | tuple[str, ...]" = (),
) -> DataFrame:
    """Offline (off-policy) evaluation of a TARGET decision policy on
    logged randomized traffic — inverse-propensity scoring (Horvitz-
    Thompson; Li et al. WSDM'11 for the bandit form): every logged
    row where the target policy would have chosen the SAME action as
    the logging policy contributes its reward weighted by
    ``1/propensity``; rows where the policies disagree contribute 0.

        IPS   = sum(match * r) / (propensity * n)
        SNIPS = sum(match * r) / sum(match)     (self-normalized)

    ``propensity`` is the (uniform) logging probability of each
    action — the md5-arm assignment convention makes it a known
    constant, which keeps the estimator exact: integer reward sums,
    two divisions at the end. One conditional hash aggregation per
    group; scale-flat like ``ab_lift``. Output per group: n, n_match,
    ips_value, snips_value (round 6; SNIPS NULL when no rows match).
    """
    if not (0.0 < propensity <= 1.0):
        raise ValueError(f"propensity must be in (0, 1], got {propensity}")
    gcols = list(group_cols)
    match = (
        F.col(logged_action_col) == F.col(target_action_col)
    ).cast("long")
    r = F.col(reward_col).cast("long")
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(match).cast("long").alias("n_match"),
        F.sum(match * r).cast("long").alias("_mr"),
    )
    return agg.select(
        *gcols, "n", "n_match",
        F.round(
            F.col("_mr").cast("double")
            / (F.lit(float(propensity)) * F.col("n").cast("double")),
            6,
        ).alias("ips_value"),
        F.round(
            F.when(
                F.col("n_match") > 0,
                F.col("_mr").cast("double")
                / F.col("n_match").cast("double"),
            ),
            6,
        ).alias("snips_value"),
    )


def split_conformal_intervals(
    df: DataFrame,
    group_cols: "list[str] | tuple[str, ...]",
    pred_col: str,
    actual_col: str,
    split_col: str,
    tie_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split conformal prediction (Vovk et al.; Lei et al. JASA'18):
    distribution-free prediction intervals with finite-sample
    coverage. On the CALIBRATION split (``split_col`` = 0) the
    nonconformity scores ``|actual - pred|`` are ranked per group and
    ``q_hat`` is the score at rank ``ceil((n_cal + 1) * (1 - alpha))``
    (the finite-sample-corrected order statistic; q_hat = +inf -> NULL
    when the rank exceeds n_cal, i.e. the calibration set is too small
    for the requested coverage). ``pred +/- q_hat`` then covers a
    fresh point with probability >= 1 - alpha — no distributional
    assumption on the model or the noise.

    The TEST split (= 1) rides along for an honest empirical coverage
    readout. One exchange on the group key feeds the per-group score
    ranking (groups process in parallel — the touchpoints window
    contract); everything else is conditional aggregation. ``tie_col``
    totalizes the score order so both engines rank identically.
    Output per group: ``(group..., n_cal, n_test, q_hat, coverage)``
    (round 6; coverage NULL when the test split is empty).
    """
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    gcols = list(group_cols)
    score = F.abs(
        F.col(actual_col).cast("double") - F.col(pred_col).cast("double")
    )
    # the base (typically a mean-predictor join plus per-row md5 split
    # arithmetic) feeds the calibration chain TWICE (rank + group
    # count) and the test chain once — checkpoint the minimal
    # projection so the upstream plan runs once (the r13 before-plan
    # replayed it into 40 Exchanges)
    df = df.select(
        *dict.fromkeys(
            [*gcols, pred_col, actual_col, split_col, tie_col]
        )
    ).localCheckpoint(eager=False)
    cal = df.filter(F.col(split_col) == 0).select(
        *gcols, score.alias("_s"), F.col(tie_col).alias("_tie")
    )
    w = Window.partitionBy(*gcols).orderBy("_s", "_tie")
    ranked = cal.select(
        *gcols, "_s",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*gcols)
        ).alias("_ncal"),
    )
    # target rank: ceil((n+1)(1-alpha)) in exact integer arithmetic on
    # a 10^9 grid (no float ceil disagreements); (a + b - 1) div b is
    # ceil for positive operands in both engines (n_cal < ~9e9 keeps
    # the product inside int64)
    one_m_a = round((1.0 - alpha) * 10**9)
    target = F.expr(
        f"((_ncal + 1) * {one_m_a} + 999999999) div 1000000000"
    )
    qhat = ranked.filter(F.col("_rk") == target).groupBy(*gcols).agg(
        F.max("_s").alias("_qhat"),
        F.max("_ncal").cast("long").alias("n_cal"),
    )
    ncal_only = cal.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_cal")
    )
    # groups whose calibration set is too small never match the rank
    # filter; recover them with NULL q_hat via a left join from the
    # full group list
    # group-sized; consumed by the coverage join AND the final select
    qhat_full = ncal_only.join(
        qhat.drop("n_cal"), gcols, "left"
    ).localCheckpoint(eager=False)
    test = df.filter(F.col(split_col) == 1).select(
        *gcols, score.alias("_s")
    )
    cov = (
        test.join(F.broadcast(qhat_full), gcols, "inner")
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("_s") <= F.col("_qhat"), 1).otherwise(0)
            ).cast("long").alias("_cov"),
        )
    )
    return (
        qhat_full.join(cov, gcols, "left")
        .select(
            *gcols,
            "n_cal",
            F.coalesce("n_test", F.lit(0).cast("long")).alias("n_test"),
            F.round(F.col("_qhat"), 6).alias("q_hat"),
            F.round(
                F.when(
                    (F.col("n_test") > 0) & F.col("_qhat").isNotNull(),
                    F.col("_cov").cast("double")
                    / F.col("n_test").cast("double"),
                ),
                6,
            ).alias("coverage"),
        )
    )


_Z_95 = 1.959964  # two-sided 5%
_Z_99 = 2.575829  # two-sided 1%
_Z_POW80 = 0.841621  # one-sided 20% (80% power)


def two_proportion_ztest(
    df: DataFrame,
    arm_col: str,
    converted_col: str,
    group_cols: "list[str] | tuple[str, ...]" = (),
) -> DataFrame:
    """Two-proportion z-test + minimum-detectable-effect readout — the
    decision layer on top of ``ab_lift`` (which reports rates) and
    ``srm_check`` (which validates the split): is the observed rate
    delta significant, and what delta COULD this sample have detected?

    ``df`` is unit grain with ``arm_col`` 0/1 and ``converted_col``
    0/1. One conditional aggregation produces the four integer
    sufficient statistics; z uses the pooled-variance form, flags
    compare |z| against the tabulated 1.96/2.58 critical literals
    (the srm_check convention — no inverse CDFs), and ``mde_80`` is
    the absolute rate delta detectable at 80% power / 5% alpha with
    the CURRENT arm sizes (``(z_a + z_b) * sqrt(p(1-p)(1/n0+1/n1))``).
    sqrt is IEEE-correctly-rounded, so the doubles replay in any
    engine. Output per group: counts, rates, z, significance flags,
    mde_80 (round 6; NULL z when either arm is empty or the pooled
    rate is degenerate).
    """
    gcols = list(group_cols)
    arm = F.col(arm_col)
    conv = F.col(converted_col).cast("long")
    agg = df.groupBy(*gcols).agg(
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(arm == 0, conv).otherwise(F.lit(0).cast("long")))
        .cast("long").alias("conv_c"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(arm == 1, conv).otherwise(F.lit(0).cast("long")))
        .cast("long").alias("conv_t"),
    )
    n_c, n_t = F.col("n_c").cast("double"), F.col("n_t").cast("double")
    p_c = F.col("conv_c").cast("double") / n_c
    p_t = F.col("conv_t").cast("double") / n_t
    pp = (
        (F.col("conv_c") + F.col("conv_t")).cast("double")
        / (F.col("n_c") + F.col("n_t")).cast("double")
    )
    se = F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n_c + F.lit(1.0) / n_t)
    )
    ok = (
        (F.col("n_c") > 0) & (F.col("n_t") > 0)
        & (pp > 0) & (pp < 1)
    )
    z = (p_t - p_c) / se
    mde = F.lit(_Z_95 + _Z_POW80) * se
    return agg.select(
        *gcols, "n_c", "conv_c", "n_t", "conv_t",
        F.round(F.when(F.col("n_c") > 0, p_c), 6).alias("rate_c"),
        F.round(F.when(F.col("n_t") > 0, p_t), 6).alias("rate_t"),
        F.round(F.when(ok, z), 6).alias("z"),
        F.when(ok, F.abs(z) > _Z_95).alias("sig_95"),
        F.when(ok, F.abs(z) > _Z_99).alias("sig_99"),
        F.round(F.when(ok, mde), 6).alias("mde_80"),
    )


_CHI2_1DOF_95 = 3.841459
_CHI2_1DOF_99 = 6.634897
_LR_GRID = 10**9


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    arm_col: str,
    group_cols: "list[str] | tuple[str, ...]" = (),
) -> DataFrame:
    """Two-sample log-rank test (Mantel-Haenszel) — does arm 1's
    survival curve differ from arm 0's? The hypothesis-test companion
    of :func:`kaplan_meier`, with right censoring handled the same
    way (censored subjects leave the risk set without counting as
    events).

    At every distinct event time t: d_j events out of n_j at risk,
    d_1j/n_1j in arm 1; O1 = sum d_1j (exact integer), E1 = sum
    d_j * n_1j / n_j, V = sum d_j (n_1j/n_j)(1 - n_1j/n_j)(n_j - d_j)
    / (n_j - 1); chi2 = (O1 - E1)^2 / V. The per-time double terms
    are quantized to a 10^9 integer grid BEFORE summation (the Neyman
    convention: a cross-row double sum is addition-order-dependent;
    integer sums are not), so the statistic replays bit-for-bit in
    SQL at 1e-9 resolution per event time.

    Plan: one aggregation to (group, arm, duration) grain, risk sets
    via a descending cumulative window over that BOUNDED table (the
    kaplan_meier contract: durations are period-grain), one reduce.
    Output per group: subjects/events per arm, o1, e1, v, chi2
    (round 6), sig_95/sig_99 vs the tabulated 1-dof chi-square
    critical values (NULL when V = 0).
    """
    gcols = list(group_cols)
    arm = F.col(arm_col).cast("int")
    ev = F.col(event_col).cast("long")
    at = df.groupBy(
        *gcols, F.col(duration_col).alias("_t")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_n_all"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long")
        .alias("_n_1"),
        F.sum(ev).cast("long").alias("_d_all"),
        F.sum(F.when(arm == 1, ev).otherwise(F.lit(0).cast("long")))
        .cast("long").alias("_d_1"),
    )
    w = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy(
            F.lit(1)
        )
    ).orderBy(F.col("_t").desc())
    risk = at.select(
        *gcols, "_t", "_d_all", "_d_1",
        F.sum("_n_all").over(w).alias("_nj"),
        F.sum("_n_1").over(w).alias("_n1j"),
    ).filter(F.col("_d_all") > 0)
    n1 = F.col("_n1j").cast("double")
    nj = F.col("_nj").cast("double")
    dj = F.col("_d_all").cast("double")
    term_e = dj * n1 / nj
    term_v = F.when(
        F.col("_nj") > 1,
        dj * (n1 / nj) * (F.lit(1.0) - n1 / nj)
        * (nj - dj) / (nj - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    g = F.lit(float(_LR_GRID))
    agg = risk.groupBy(*gcols).agg(
        F.sum("_d_1").cast("long").alias("o1"),
        F.sum(F.round(term_e * g).cast("long")).alias("_e1q"),
        F.sum(F.round(term_v * g).cast("long")).alias("_vq"),
    )
    counts = df.groupBy(*gcols).agg(
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long")
        .alias("n_arm0"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long")
        .alias("n_arm1"),
        F.sum(F.when(arm == 0, ev).otherwise(F.lit(0).cast("long")))
        .cast("long").alias("events_arm0"),
        F.sum(F.when(arm == 1, ev).otherwise(F.lit(0).cast("long")))
        .cast("long").alias("events_arm1"),
    )
    # LEFT join: groups with zero event times still report their
    # counts, with o1 = 0 and NULL statistics (the global agg always
    # returns exactly one row — NULL sums when no event time exists —
    # so the 1-row broadcast cross is safe there)
    joined = (
        counts.join(agg, gcols, "left") if gcols
        else counts.crossJoin(F.broadcast(agg))
    )
    e1 = F.col("_e1q").cast("double") / g
    v = F.col("_vq").cast("double") / g
    chi2 = (F.col("o1").cast("double") - e1) * (
        F.col("o1").cast("double") - e1
    ) / v
    ok = F.col("_vq") > 0
    return joined.select(
        *gcols, "n_arm0", "n_arm1", "events_arm0", "events_arm1",
        F.coalesce("o1", F.lit(0).cast("long")).alias("o1"),
        F.round(e1, 6).alias("e1"),
        F.round(v, 6).alias("v"),
        F.round(F.when(ok, chi2), 6).alias("chi2"),
        F.when(ok, chi2 > _CHI2_1DOF_95).alias("sig_95"),
        F.when(ok, chi2 > _CHI2_1DOF_99).alias("sig_99"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    arm_col: str,
    buckets: int = 64,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test on an INTEGER value
    column between arms 0/1 — the nonparametric A/B readout for the
    heavy-tailed metrics (revenue) where the t/z tests' mean focus
    misleads. Tie-corrected normal approximation.

    Exactness at scale: everything reduces to the DISTINCT-value
    histogram (one hash shuffle). Rank sums use average ranks —
    ``avg_rank(v) = cum_lt(v) + (c(v)+1)/2`` — kept on the x2 integer
    grid (``2*cum_lt + c + 1``), so R1, U1, and the tie term
    ``sum(c^3 - c)`` are EXACT DECIMAL(38) sums; variance and z are
    one fixed-order double expression from those integers.

    ONE fully-lazy plan, ZERO driver jobs at build (r13 opt — the old
    shape ran an eager bounds pull plus a subtotal collect with a
    persisted histogram). The bounds row and the per-bucket
    prefix-offset table ride broadcast joins; the cumulative window
    stays partitioned BY BUCKET; the only globally-ordered window is
    over the (<= buckets)-row subtotal table. Empty input / an empty
    arm raises from inside the plan at execution time (same messages,
    now via ``raise_error``).

    Output: ONE row ``(n_0, n_1, u1, z, sig_95, sig_99)`` (u1 on the
    half-integer grid, z round 6; NULL z when an arm is empty or all
    values tie).
    """
    v = F.col(value_col).cast("long")
    arm = F.col(arm_col).cast("int")
    per_value = (
        df.filter(v.isNotNull() & arm.isin(0, 1))
        .groupBy(v.alias("_v"))
        .agg(
            F.sum(F.when(arm == 0, 1).otherwise(0)).alias("_c0"),
            F.sum(F.when(arm == 1, 1).otherwise(0)).alias("_c1"),
        )
    )

    def guarded(col: str) -> Column:
        return F.when(
            F.col("_lo_raw").isNull(),
            F.raise_error(F.lit("mann_whitney_u: no rows"))
            .cast("long"),
        ).when(
            (F.col("_n0_raw") == 0) | (F.col("_n1_raw") == 0),
            F.raise_error(F.format_string(
                "mann_whitney_u: empty arm (n0=%d, n1=%d)",
                "_n0_raw", "_n1_raw",
            )).cast("long"),
        ).otherwise(F.col(col))

    stats = per_value.agg(
        F.min("_v").alias("_lo_raw"),
        F.max("_v").alias("_hi"),
        F.sum("_c0").alias("_n0_raw"),
        F.sum("_c1").alias("_n1_raw"),
    ).select(
        guarded("_lo_raw").alias("_lo"),
        guarded("_n0_raw").alias("_n0"),
        guarded("_n1_raw").alias("_n1"),
        F.expr(
            f"greatest(CAST(1 AS BIGINT),"
            f" ((_hi - _lo_raw) div {buckets}) + CAST(1 AS BIGINT))"
        ).alias("_width"),
    )
    pv = per_value.crossJoin(F.broadcast(stats)).withColumn(
        "_bucket",
        ((F.col("_v") - F.col("_lo")) / F.col("_width")).cast("long"),
    )
    sub = pv.groupBy("_bucket").agg(
        F.sum(F.col("_c0") + F.col("_c1")).alias("st")
    )
    woff = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = sub.select(
        "_bucket",
        F.coalesce(F.sum("st").over(woff), F.lit(0)).alias("_off"),
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ct = (F.col("_c0") + F.col("_c1")).cast("decimal(38,0)")
    terms = (
        pv.join(F.broadcast(offs), "_bucket")
        .select(
            "_c1",
            (
                F.col("_off")
                + F.sum(F.col("_c0") + F.col("_c1")).over(w)
                - (F.col("_c0") + F.col("_c1"))
            ).alias("_cum_lt"),
            ct.alias("_ct"),
        )
    )
    agg = terms.agg(
        F.sum(
            F.col("_c1").cast("decimal(38,0)")
            * (F.lit(2).cast("decimal(38,0)")
               * F.col("_cum_lt").cast("decimal(38,0)")
               + F.col("_ct") + 1)
        ).alias("_r1x2"),
        F.sum(F.col("_ct") * F.col("_ct") * F.col("_ct") - F.col("_ct"))
        .alias("_tie"),
    )
    # the double expressions below replicate the old driver-side
    # Python arithmetic operation-for-operation (every cast is exact
    # for any realistic n, and the evaluation order is unchanged)
    n0d = F.col("_n0").cast("double")
    n1d = F.col("_n1").cast("double")
    nd = (F.col("_n0") + F.col("_n1")).cast("double")
    u1_x2 = F.col("_r1x2").cast("double") - n1d * (n1d + F.lit(1.0))
    u1 = u1_x2 / F.lit(2.0)
    mu = n0d * n1d / F.lit(2.0)
    var = (
        n0d * n1d / F.lit(12.0)
        * (
            (F.col("_n0") + F.col("_n1") + F.lit(1)).cast("double")
            - F.col("_tie").cast("double")
            / (nd * (F.col("_n0") + F.col("_n1") - F.lit(1))
               .cast("double"))
        )
    )
    ok = var > 0
    z = (u1 - mu) / F.sqrt(var)
    return agg.crossJoin(F.broadcast(stats)).select(
        F.col("_n0").cast("long").alias("n_0"),
        F.col("_n1").cast("long").alias("n_1"),
        F.round(u1, 6).alias("u1"),
        F.round(F.when(ok, z), 6).alias("z"),
        F.when(ok, F.abs(z) > _Z_95).alias("sig_95"),
        F.when(ok, F.abs(z) > _Z_99).alias("sig_99"),
    )


def dr_policy_value(
    df: DataFrame,
    logged_action_col: str,
    target_action_col: str,
    reward_col: str,
    baseline_col: str,
    propensity: float,
    group_cols: "list[str] | tuple[str, ...]" = (),
) -> DataFrame:
    """Doubly-robust off-policy value (Dudík et al. ICML'11) — the
    variance-reduced upgrade of :func:`ips_policy_value`: a reward
    MODEL's prediction under the target action anchors the estimate,
    and the IPS term corrects only the model's residual on matched
    rows::

        DR = mean(baseline) + sum(match * (r - baseline)) / (p * n)

    Unbiased when EITHER the propensity or the model is right.
    ``baseline_col`` must be an INTEGER prediction (the caller
    quantizes — cents grain like the reward), which keeps both sums
    exact BIGINT; one conditional aggregation, two divisions at the
    end. Output per group: n, n_match, dr_value, ips_value (round 6,
    the IPS companion for the variance comparison).
    """
    if not (0.0 < propensity <= 1.0):
        raise ValueError(f"propensity must be in (0, 1], got {propensity}")
    gcols = list(group_cols)
    match = (
        F.col(logged_action_col) == F.col(target_action_col)
    ).cast("long")
    r = F.col(reward_col).cast("long")
    b = F.col(baseline_col).cast("long")
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(match).cast("long").alias("n_match"),
        F.sum(b).cast("long").alias("_bsum"),
        F.sum(match * (r - b)).cast("long").alias("_corr"),
        F.sum(match * r).cast("long").alias("_mr"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        *gcols, "n", "n_match",
        F.round(
            F.col("_bsum").cast("double") / nd
            + F.col("_corr").cast("double")
            / (F.lit(float(propensity)) * nd),
            6,
        ).alias("dr_value"),
        F.round(
            F.col("_mr").cast("double")
            / (F.lit(float(propensity)) * nd),
            6,
        ).alias("ips_value"),
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: int = 0,
    hi: int = 1_000_000,
) -> DataFrame:
    """Isotonic calibration of a scoring model (pool-adjacent-
    violators fit) over score bins — the step beyond
    ``calibration_report``: not just MEASURING miscalibration but
    producing the monotone mapping that fixes it.

    Scores are integer-valued in ``[lo, hi)`` (the md5-grid
    convention) and bin equal-width; per-bin (n, positives) come from
    one hash aggregation. The isotonic fit uses the exact MINIMAX
    closed form instead of the sequential PAV loop::

        iso_i = max_{j <= i} min_{k >= i} avg(positives_j..k / n_j..k)

    which over ``n_bins`` bins is a bounded triple enumeration
    (n_bins^2 range averages from prefix sums, then min/max
    reductions) — trivially distributable AND exactly replayable in
    SQL, where a PAV pooling loop would not be. Range averages are
    one double division of exact BIGINT prefix sums. Output per
    occupied bin: ``(bin, n, rate, iso_rate)`` (round 6), with
    ``iso_rate`` non-decreasing in ``bin`` by construction.
    """
    if n_bins < 1 or hi <= lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    width = (hi - lo + n_bins - 1) // n_bins
    b = df.select(
        F.least(
            F.lit(n_bins - 1),
            ((F.col(score_col).cast("long") - lo) / width).cast("long"),
        ).alias("bin"),
        F.col(label_col).cast("long").alias("_y"),
    ).groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = b.select(
        "bin", "n", "_pos",
        F.sum("n").over(wcum).alias("_cn"),
        F.sum("_pos").over(wcum).alias("_cp"),
    ).localCheckpoint(eager=False)
    j = pre.select(
        F.col("bin").alias("j"),
        (F.col("_cn") - F.col("n")).alias("_cn_jm1"),
        (F.col("_cp") - F.col("_pos")).alias("_cp_jm1"),
    )
    k = pre.select(
        F.col("bin").alias("k"),
        F.col("_cn").alias("_cn_k"),
        F.col("_cp").alias("_cp_k"),
    )
    # non-equi joins over <= n_bins-row tables: the broadcast nested
    # loop is the honest plan at this (bounded) size
    ranges = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .select(
            "j", "k",
            (
                (F.col("_cp_k") - F.col("_cp_jm1")).cast("double")
                / (F.col("_cn_k") - F.col("_cn_jm1")).cast("double")
            ).alias("avg_jk"),
        )
    )
    i_tab = pre.select(F.col("bin").alias("i"))
    # min over k >= i of each (j <= i) range, then max over j
    inner = (
        i_tab.join(F.broadcast(ranges), (F.col("j") <= F.col("i"))
                   & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("_mn"))
        .groupBy("i")
        .agg(F.max("_mn").alias("_iso"))
    )
    return (
        pre.join(inner, pre.bin == F.col("i"))
        .select(
            "bin", "n",
            F.round(
                F.col("_pos").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("rate"),
            F.round("_iso", 6).alias("iso_rate"),
        )
    )


def eb_beta_binomial_smooth(
    df: DataFrame,
    group_cols: "list[str] | tuple[str, ...]",
    n_col: str,
    pos_col: str,
) -> DataFrame:
    """Empirical-Bayes beta-binomial smoothing of per-group rates —
    the CTR/conversion shrinkage every ranking-by-rate mart needs
    (small groups get pulled to the prior instead of winning on
    3-of-3 luck). Method-of-moments prior from the group rates::

        m  = mean(rate),  v = var(rate)
        c  = m(1-m)/v - 1          (prior strength alpha+beta)
        alpha = m*c, beta = (1-m)*c
        smoothed = (pos + alpha) / (n + alpha + beta)

    The prior moments are ONE 1-row aggregate over group-grain rates;
    exactness: rates quantized to the 10^9 grid before the cross-group
    mean/var sums (the addition-order-free convention), prior scalars
    broadcast back, one fixed-order double expression per group.
    Degenerate variance (all rates equal) yields c = NULL and
    ``smoothed = rate`` (no shrinkage). Output per group: ``(group...,
    n, pos, rate, smoothed)``, round 6.
    """
    gcols = list(group_cols)
    g = 10**9
    base = df.select(
        *gcols,
        F.col(n_col).cast("long").alias("n"),
        F.col(pos_col).cast("long").alias("pos"),
    ).withColumn(
        "_rq",
        F.round(
            F.col("pos").cast("double") / F.col("n").cast("double")
            * F.lit(float(g))
        ).cast("long"),
    )
    pri = base.agg(
        F.count(F.lit(1)).cast("long").alias("_k"),
        F.sum("_rq").cast("decimal(38,0)").alias("_s"),
        F.sum(
            F.col("_rq").cast("decimal(38,0)")
            * F.col("_rq").cast("decimal(38,0)")
        ).alias("_s2"),
    ).select(
        "_k",
        (F.col("_s").cast("double") / F.col("_k").cast("double")
         / F.lit(float(g))).alias("_m"),
        F.when(
            F.col("_k") > 1,
            (
                F.col("_k").cast("double") * F.col("_s2").cast("double")
                - F.col("_s").cast("double") * F.col("_s").cast("double")
            )
            / (F.col("_k").cast("double")
               * (F.col("_k").cast("double") - F.lit(1.0)))
            / F.lit(float(g) * float(g)),
        ).alias("_v"),
    )
    m, v = F.col("_m"), F.col("_v")
    c = F.when(
        v > 0, m * (F.lit(1.0) - m) / v - F.lit(1.0)
    )
    pri = pri.select(
        "_m", "_v",
        F.when(c > 0, c).alias("_c"),
    )
    out = base.crossJoin(F.broadcast(pri))
    alpha = F.col("_m") * F.col("_c")
    beta = (F.lit(1.0) - F.col("_m")) * F.col("_c")
    rate = F.col("pos").cast("double") / F.col("n").cast("double")
    smoothed = F.when(
        F.col("_c").isNotNull(),
        (F.col("pos").cast("double") + alpha)
        / (F.col("n").cast("double") + alpha + beta),
    ).otherwise(rate)
    return out.select(
        *gcols, "n", "pos",
        F.round(rate, 6).alias("rate"),
        F.round(smoothed, 6).alias("smoothed"),
    )


def did_event_study(
    df: DataFrame,
    value_col: str,
    treat_col: str,
    period_col: str,
    cutoff: int,
) -> DataFrame:
    """Event-study expansion of :func:`did_lift`: instead of one
    pooled post-minus-pre estimate, the per-PERIOD treatment-control
    gap relative to the average pre-period gap — the plot that shows
    pre-trends (the DiD identifying assumption) and effect dynamics
    after launch.

    ``df`` is unit-x-period grain with an INTEGER metric; one
    conditional aggregation to (period, arm) cells, per-period gap
    ``mean_t - mean_c``, baseline = average PRE-period gap with the
    per-period gaps quantized to a 10^6 grid before the cross-period
    mean (addition-order-free). Output per period: ``(period,
    is_post, n_c, n_t, gap, effect)`` where ``effect = gap -
    pre_baseline`` (round 6; periods missing an arm get NULL gap and
    are excluded from the baseline).
    """
    t = F.col(treat_col)
    v = F.col(value_col).cast("long")
    cells = df.groupBy(F.col(period_col).alias("period")).agg(
        F.sum(F.when(t == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(t == 0, v).otherwise(F.lit(0).cast("long")))
        .cast("long").alias("_sc"),
        F.sum(F.when(t == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(t == 1, v).otherwise(F.lit(0).cast("long")))
        .cast("long").alias("_st"),
    )
    gap = F.when(
        (F.col("n_c") > 0) & (F.col("n_t") > 0),
        F.col("_st").cast("double") / F.col("n_t").cast("double")
        - F.col("_sc").cast("double") / F.col("n_c").cast("double"),
    )
    g = cells.select(
        "period", "n_c", "n_t",
        gap.alias("_gap"),
        (F.col("period") >= cutoff).alias("is_post"),
        F.round(gap * 1e6).cast("long").alias("_gapq"),
    ).localCheckpoint(eager=False)
    base = g.filter(
        (~F.col("is_post")) & F.col("_gapq").isNotNull()
    ).agg(
        (
            F.sum("_gapq").cast("double")
            / F.count(F.lit(1)).cast("double") / F.lit(1e6)
        ).alias("_base")
    )
    return (
        g.crossJoin(F.broadcast(base))
        .select(
            "period", "is_post", "n_c", "n_t",
            F.round("_gap", 6).alias("gap"),
            F.round(F.col("_gap") - F.col("_base"), 6).alias("effect"),
        )
        .orderBy("period")
    )


# Abramowitz & Stegun 26.2.17 normal-CDF tail series — the published
# 5-term rational approximation (|error| < 7.5e-8), elementary ops
# only (exp/sqrt), so a DuckDB oracle replays it with the SAME
# expression and round(..., 6) parity holds cross-engine. Used where
# a test needs an actual p-value (BH FDR ordering thresholds);
# plain z-threshold tests keep the pinned-constant convention of
# two_proportion_ztest.
_AS_B = (0.319381530, -0.356563782, 1.781477937,
         -1.821255978, 1.330274429)
_AS_P = 0.2316419
_SQRT_2PI = 2.5066282746310002


def normal_sf(z: Column) -> Column:
    """Upper-tail P(Z > z) for z >= 0 via A&S 26.2.17."""
    k = 1.0 / (1.0 + _AS_P * z)
    poly = (
        _AS_B[0] * k + _AS_B[1] * k ** 2 + _AS_B[2] * k ** 3
        + _AS_B[3] * k ** 4 + _AS_B[4] * k ** 5
    )
    return F.exp(-z * z / 2.0) / _SQRT_2PI * poly


def as_sql_normal_sf(z_expr: str) -> str:
    """The SAME A&S series as ANSI SQL over an expression string —
    the single oracle twin of :func:`normal_sf` (driver queries must
    import this, never re-render the series, so the two SQL and one
    Spark rendering cannot drift). power() is used rather than ``^``
    so the rendering matches Spark's ``**``-free float arithmetic
    exactly (fdr_screen is driver-green against this form)."""
    k = f"(1.0 / (1.0 + {_AS_P} * ({z_expr})))"
    poly = (
        f"({_AS_B[0]} * {k} + {_AS_B[1]} * power({k}, 2)"
        f" + {_AS_B[2]} * power({k}, 3) + {_AS_B[3]} * power({k}, 4)"
        f" + {_AS_B[4]} * power({k}, 5))"
    )
    return (
        f"(exp(-(({z_expr}) * ({z_expr})) / 2.0) / {_SQRT_2PI} * {poly})"
    )


def bh_fdr(
    hypotheses: DataFrame,
    p_col: str = "p_value",
    alpha: float = 0.1,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a HYPOTHESIS table
    (one row per hypothesis — domain-bounded: the caller aggregates
    raw data to hypothesis grain first, so the window below sorts
    |hypotheses| rows, never input rows). Emits per-hypothesis rank,
    the BH critical value ``alpha * rank / m``, the monotone adjusted
    p-value ``min_{j>=i}(p_(j) * m / j)`` (capped at 1), and the
    step-up rejection flag (reject all ranks <= the largest rank with
    p <= crit, NOT just rows individually below their threshold)."""
    m = Window.partitionBy()
    asc = Window.partitionBy().orderBy(
        F.col(p_col).asc(), *[F.col(c) for c in hypotheses.columns
                              if c != p_col]
    )
    ranked = hypotheses.select(
        "*",
        F.row_number().over(asc).alias("p_rank"),
        F.count(F.lit(1)).over(m).alias("m"),
    )
    # adjusted p: running min of p*m/rank from the LARGEST p down
    desc = Window.partitionBy().orderBy(F.col("p_rank").desc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = ranked.withColumn(
        "p_adj",
        F.least(
            F.lit(1.0),
            F.min(
                F.col(p_col) * F.col("m") / F.col("p_rank")
            ).over(desc),
        ),
    )
    # step-up: reject ranks <= max{rank : p <= alpha*rank/m}
    crit = F.col("p_rank").cast("double") * alpha / F.col("m")
    ranked = ranked.withColumn("bh_crit", crit)
    kmax = Window.partitionBy()
    ranked = ranked.withColumn(
        "_kmax",
        F.max(
            F.when(F.col(p_col) <= F.col("bh_crit"), F.col("p_rank"))
        ).over(kmax),
    )
    return ranked.select(
        *[c for c in hypotheses.columns],
        "p_rank",
        F.round("bh_crit", 6).alias("bh_crit"),
        F.round("p_adj", 6).alias("p_adj"),
        F.coalesce(
            F.col("p_rank") <= F.col("_kmax"), F.lit(False)
        ).alias("rejected"),
    )


def chi2_uniformity(
    df: DataFrame,
    group_cols: list[str],
    bin_col: str,
    n_bins: int,
) -> DataFrame:
    """Chi-square goodness-of-fit against the UNIFORM distribution
    over ``n_bins`` known bins, per group (seasonality screen: does
    activity concentrate in particular hours?). One hash aggregation
    to (group, bin) grain, then a bounded per-group rollup — no
    per-row state, partitioning-invariant at any input scale. Bins
    absent from the data still contribute (0 - E)^2/E, handled in
    closed form without generating rows: chi2 = sum((O-E)^2/E over
    observed) + (n_bins - observed_bins) * E."""
    counts = df.groupBy(*group_cols, bin_col).agg(
        F.count(F.lit(1)).alias("o")
    )
    g = counts.groupBy(*group_cols).agg(
        F.sum("o").alias("n"),
        F.count(F.lit(1)).alias("bins_seen"),
        F.sum(F.col("o") * F.col("o")).alias("sum_o2"),
    )
    e = F.col("n").cast("double") / float(n_bins)
    # sum((o-e)^2/e) over ALL bins = sum_o2/e - 2*n + n_bins*e
    #   (observed part) + missing bins contribute e each, which the
    #   n_bins*e term already covers after expanding the square.
    chi2 = (
        F.col("sum_o2").cast("double") / e
        - 2.0 * F.col("n").cast("double")
        + float(n_bins) * e
    )
    return g.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.col("bins_seen").cast("long").alias("bins_seen"),
        F.round(chi2, 6).alias("chi2"),
        F.lit(n_bins - 1).cast("long").alias("dof"),
        # 99th percentile of chi2_23 = 41.638 (pinned constant, the
        # two_proportion_ztest convention) — callers with a different
        # n_bins compare against their own pinned quantile
        F.round(chi2 / float(n_bins - 1), 6).alias("chi2_per_dof"),
    )


def behavior_entropy(
    df: DataFrame,
    entity_col: str,
    action_col: str,
) -> DataFrame:
    """Per-entity Shannon entropy (nats) of the action distribution —
    the predictability screen for bot/script detection and curation
    (a user who only ever fires one event type carries 0 entropy).
    Two hash aggregations: (entity, action) grain then entity grain;
    entropy via sum(c*ln(c)) rearrangement so each group needs one
    pass and no per-action state: H = ln(n) - sum(c*ln(c))/n."""
    counts = df.groupBy(entity_col, action_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    per_entity = counts.groupBy(entity_col).agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_actions"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("clogc"),
    )
    n = F.col("n").cast("double")
    h = F.log(n) - F.col("clogc") / n
    return per_entity.select(
        entity_col,
        F.col("n").cast("long").alias("n_events"),
        F.col("n_actions").cast("long").alias("n_distinct_actions"),
        F.round(F.greatest(h, F.lit(0.0)), 6).alias("entropy_nats"),
    )
