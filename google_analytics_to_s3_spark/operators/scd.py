"""Slowly-changing-dimension (type 2) versioning from a change stream.

The warehouse pattern the reference's mart users eventually need: turn
an append-only stream of (key, attribute, effective_date) observations
into versioned dimension rows with validity intervals — change
detection (drop consecutive duplicates), interval construction
(valid_from / valid_to via lead), and a current-row flag.

Scale shape: two windows over the SAME key partitioning — one exchange
total; no joins, no state. Determinism: observations are ordered by
(effective date, tiebreak id), so re-runs and backfills rebuild
byte-identical history — the property that makes SCD2 rebuilds safe to
run incrementally per partition at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    eff_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Versioned dimension rows from observations.

    Emits one row per (key, run-of-equal-attribute): valid_from = first
    effective date of the run, valid_to = next version's valid_from
    (NULL for the current row), is_current flag, version_n sequence.
    """
    # null-safe change detection: `_prev != attr` is NULL when either
    # side is NULL, silently folding runs that touch a NULL attribute —
    # use an explicit first-row marker + eqNullSafe so NULL is an
    # ordinary attribute value (NULL->'a', 'a'->NULL, NULL-runs all
    # version correctly)
    w = Window.partitionBy(key_col).orderBy(eff_col, tiebreak_col)
    changed = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            | ~F.col("_prev").eqNullSafe(F.col(attr_col))
        )
    )
    wv = Window.partitionBy(key_col).orderBy(eff_col, tiebreak_col)
    return (
        changed.select(
            F.col(key_col),
            F.col(attr_col),
            F.col(eff_col).alias("valid_from"),
            F.lead(eff_col).over(wv).alias("valid_to"),
            F.row_number().over(wv).alias("version_n"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_asof_join(
    facts: DataFrame,
    versions: DataFrame,
    key_col: str,
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Enrich a fact stream with the dimension version valid at fact
    time: join on the dimension key, keep the version whose
    ``[valid_from, valid_to)`` interval contains ``ts_col`` (open-ended
    current rows match everything from valid_from on).

    Scale shape: a plain equi-join on the dimension key — the interval
    test is a post-join filter, never a range/BNLJ join — with per-key
    fan-out bounded by that key's version count (small by SCD2
    construction: one row per attribute CHANGE). At most one version
    matches per fact row (intervals partition the timeline), so no
    post-join dedup is needed.
    """
    v = versions.select(
        F.col(key_col).alias("_vk"),
        *[c for c in versions.columns if c != key_col],
    )
    cond = (facts[key_col] == v["_vk"]) & (
        facts[ts_col] >= v["valid_from"]
    ) & (v["valid_to"].isNull() | (facts[ts_col] < v["valid_to"]))
    return facts.join(v, cond, how).drop("_vk")
