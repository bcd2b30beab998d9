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

from pyspark.sql import DataFrame, Window
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
