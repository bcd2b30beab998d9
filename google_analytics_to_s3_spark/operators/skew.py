"""Skew mitigation for hot keys (SURVEY.md §7.3 risk 5).

The reference keeps bot traffic in the dataset (only the geo lookup is
skipped for bots, reference enrichment/filters/ip.py:5-6), so a single
hot ``body_cid`` (a crawler) lands every one of its hits in one window
partition — AQE's skew-join splitting does not help window/groupBy
execution. Two remedies, both pure DataFrame ops:

- :func:`salt_hot_keys` + :func:`unsalt_aggregate` — two-phase
  aggregation: salt the key to spread a hot group over N partitions,
  partially aggregate, then aggregate the partials on the unsalted key.
  Works for any algebraic aggregate; this is the generic pattern for
  hot-key ``groupBy`` at 100 TB.
- :func:`hot_keys` — find keys above a frequency threshold (e.g. bot
  visitors) so callers can route them to a separate plan (filter out,
  process coarse, or cap) — the sessionization-specific remedy, since
  gap sessionization of one visitor is inherently sequential.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame, key_col: str, min_count: int
) -> DataFrame:
    """Keys whose row count is ≥ ``min_count`` — candidates for salting
    or separate handling. One shuffle of (key, partial count)."""
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
    )


def salt_hot_keys(
    df: DataFrame,
    key_col: str,
    n_salts: int = 16,
    salt_col: str = "_salt",
    salt_source_cols: list[str] | None = None,
) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from a hash of
    stable row attributes — spreads each key's rows over ``n_salts``
    shuffle partitions for phase-1 aggregation.

    The salt MUST be a pure function of row content, never of
    ``monotonically_increasing_id``/``rand``: those are recomputed with
    different values when a stage is retried after a fetch failure, so a
    row could land in a different phase-1 group on retry and be double-
    counted or dropped (the SPARK-23207 class of bug). Defaults to
    hashing every column; pass ``salt_source_cols`` to hash a subset
    (e.g. a unique id). Identical rows share a salt — harmless for
    aggregation, they just stay grouped.
    """
    cols = salt_source_cols if salt_source_cols is not None else df.columns
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in cols]), n_salts)
    )


def salted_sum(
    df: DataFrame,
    key_col: str,
    value_col: str | Column,
    n_salts: int = 16,
    out_col: str = "total",
    salt_source_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase hot-key-safe sum: groupBy (key, salt) → partials,
    then groupBy key → final. The first shuffle spreads a hot key over
    ``n_salts`` reducers; the second shuffles only one partial row per
    (key, salt).

    Note: for *algebraic* aggregates Spark's own partial aggregation
    (map-side combine) already bounds reducer input to one row per
    (key, map-partition), so explicit salting matters when the
    aggregate is holistic (collect_list, percentile) or when the
    per-key combine result itself is large.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    salted = salt_hot_keys(
        df, key_col, n_salts, salt_source_cols=salt_source_cols
    )
    partial = salted.groupBy(key_col, "_salt").agg(v.alias("_pv"))
    # caller passes an aggregate expression, e.g. F.sum("x"); the final
    # combine must re-aggregate the partials the same way
    return partial.groupBy(key_col).agg(F.sum("_pv").alias(out_col))


def split_hot_cold(
    df: DataFrame,
    key_col: str,
    min_count: int,
) -> tuple[DataFrame, DataFrame]:
    """(cold, hot) split by key frequency — the sessionization remedy:
    run the window chain on cold keys, handle hot keys (bots) with a
    coarser plan (drop, cap, or per-key repartitioned processing).

    The hot-key set is tiny (it is a skew set by definition) and is
    broadcast for the anti/semi joins, so the split adds no shuffle of
    the fact table.
    """
    hot = F.broadcast(hot_keys(df, key_col, min_count).select(key_col))
    cold_df = df.join(hot, key_col, "left_anti")
    hot_df = df.join(hot, key_col, "left_semi")
    return cold_df, hot_df


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Key-distribution skew diagnostics — the measurement that decides
    WHETHER :func:`salt_hot_keys` / AQE skew handling is worth wiring:
    the ``top_k`` heaviest keys with their row share, the total row and
    distinct-key counts, and the share a perfectly uniform key would
    have (1/n_keys) for comparison.

    One data-sized hash aggregation to key grain; the top-k is a
    distributed TakeOrderedAndProject heap (orderBy+limit — never a
    global sort of the key-count table), ordered by (count desc, key
    asc) so ties are deterministic; ranks are then a window over the
    k surviving rows. The
    hot-key share vs uniform share ratio IS the salting decision: a
    top key at 100× uniform makes its window/groupBy partition the
    straggler at any cluster size.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = counts.agg(
        F.sum("n").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nkeys"),
    )
    # TakeOrderedAndProject top-k (orderBy+limit), never a global sort
    # of the key-count table; the rank window then runs on k rows.
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(
        top_k
    )
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "key", "n",
            F.round(
                F.col("n").cast("double") / F.col("_total").cast("double"),
                6,
            ).alias("share"),
            F.round(
                F.lit(1.0) / F.col("_nkeys").cast("double"), 6
            ).alias("uniform_share"),
            F.col("_total").alias("total_rows"),
            F.col("_nkeys").alias("n_keys"),
        )
    )


def misra_gries_candidates(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``key_col`` — the
    bounded-state candidate generator for :func:`exact_heavy_hitters`.

    Each input partition is folded into at most ``k`` (key, weight)
    counters with one Arrow pass (batch-level ``value_counts`` merged
    into the running summary, then pruned by subtracting the (k+1)-th
    largest weight — the mergeable-summaries form of MG, Agarwal et
    al. PODS'12, so the per-batch work is C-speed pandas, never a
    Python per-row loop). Guarantee used downstream: an item whose
    count in the partition exceeds ``n_p / (k + 1)`` always survives
    that partition's summary.

    Output: ``(key, _rows)`` — candidate keys carry ``_rows = 0``; one
    sentinel row per partition (NULL key) carries the exact partition
    row count, so the caller recovers total n without a second scan.
    Output size is bounded by ``partitions * (k + 1)`` rows no matter
    how large the input.
    """
    from collections.abc import Iterator

    import pandas as pd

    ktype = df.schema[key_col].dataType.simpleString()

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            vc = pdf[key_col].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > k:
                kth = acc.nlargest(k + 1).iloc[-1]
                acc = acc[acc > kth]
        keys = [] if acc is None else list(acc.index)
        yield pd.DataFrame(
            {key_col: keys + [None], "_rows": [0] * len(keys) + [rows]}
        )

    return df.select(key_col).mapInPandas(
        fold, schema=f"{key_col} {ktype}, _rows long"
    )


def exact_heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: float,
    k: int | None = None,
) -> DataFrame:
    """EXACT phi-heavy hitters (every key with ``count > phi * n`` and
    nothing else) without ever shuffling the full key domain — the
    sketch-then-verify pattern (the ranking machinery's sibling): at
    100 TB with ~user-cardinality keys, ``groupBy(key)`` shuffles n
    rows to count mostly-cold keys; here the shuffle carries only
    ``partitions * k`` candidate rows plus the candidates' own hits.

    Pass 1: :func:`misra_gries_candidates` with ``k = ceil(1/phi)``
    (pigeonhole: a key with global count > phi*n has count
    > phi * n_p > n_p/(k+1) in at least one partition, so the union of
    per-partition summaries is a SUPERSET of the true heavy hitters —
    no false negatives by construction). Pass 2: broadcast-semi-join
    the tiny candidate set back and count ONLY those keys exactly,
    then filter ``count > phi * n`` — false positives die here, so the
    output is exact and independent of MG internals. The summary is
    persisted: both the candidate set and the exact total n come from
    the same single scan.
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    import math

    k = k if k is not None else max(8, math.ceil(1.0 / phi))
    summary = misra_gries_candidates(df, key_col, k).persist()
    candidates = (
        summary.filter(F.col(key_col).isNotNull())
        .select(key_col).distinct()
    )
    total = summary.agg(F.sum("_rows").cast("long").alias("_total"))
    counts = (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_rows").cast("double")
            > F.lit(float(phi)) * F.col("_total").cast("double")
        )
        .select(
            key_col,
            "n_rows",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("_total").cast("double"),
                6,
            ).alias("share"),
            F.col("_total").alias("total_rows"),
        )
    )


def merge_mg_summaries(
    standing: DataFrame,
    batch_summary: DataFrame,
    key_col: str,
    k: int,
) -> DataFrame:
    """Merge two Misra-Gries summary TABLES ``(key, weight)`` into one
    bounded to ``k`` counters — the mergeable-summaries rule (Agarwal
    et al. PODS'12): add weights per key, then subtract the (k+1)-th
    largest weight from everyone and drop the non-positive. Error adds
    across merges but stays <= total/(k+1), so the union of a standing
    summary and per-batch summaries keeps the heavy-hitter superset
    guarantee — this is what lets :func:`exact_heavy_hitters`'s
    candidate pass run INCREMENTALLY over a stream (merge per
    micro-batch, exact-verify on demand).

    Both inputs are already bounded (<= k and <= partitions x k rows),
    so every step here is small-table work: one union + hash agg, one
    TakeOrdered (k+1) for the pruning threshold, one broadcast.
    """
    merged = (
        standing.select(F.col(key_col), F.col("weight"))
        .unionByName(batch_summary.select(F.col(key_col), "weight"))
        .groupBy(key_col)
        .agg(F.sum("weight").cast("long").alias("weight"))
    )
    kth = (
        merged.orderBy(F.col("weight").desc(), F.col(key_col).asc())
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) > k, F.min("weight"))
            .otherwise(F.lit(0)).cast("long").alias("_kth")
        )
    )
    return (
        merged.crossJoin(F.broadcast(kth))
        .select(
            key_col,
            (F.col("weight") - F.col("_kth")).cast("long").alias("weight"),
        )
        .filter(F.col("weight") > 0)
    )


def mg_batch_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """One batch's MG summary as a ``(key, weight)`` table — the
    per-partition :func:`misra_gries_candidates` summaries merged down
    to <= k rows via :func:`merge_mg_summaries` against an empty
    standing table."""
    cands = (
        misra_gries_candidates(df, key_col, k)
        .filter(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
    )
    # recount the batch's candidate keys exactly (cheap — the batch is
    # small by definition), then prune to k; exact candidate weights
    # are a valid MG summary (zero error for kept keys, dropped keys
    # bounded by the per-partition guarantee)
    counts = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    return merge_mg_summaries(counts.limit(0), counts, key_col, k)
