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
