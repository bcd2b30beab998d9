"""Sequential pattern mining over per-user ordered event streams.

The sequence companion to the order-grain association rules
(operators/recsys.py, q_basket_rules): instead of co-occurrence inside
an unordered basket, patterns here are CONSECUTIVE length-n
subsequences of each user's time-ordered stream (the GSP/PrefixSpan
"contiguous pattern" special case that joins/windows express exactly),
and support is the number of DISTINCT users whose stream contains the
pattern — the standard sequential-pattern support, not an occurrence
count (one hyperactive user repeating a loop contributes 1).

Scale shape: one user-hash exchange feeds the lead window (the same
exchange every sessionization query already pays), the n-gram
projection is map-side, and the support aggregation groups on at most
|vocab|^n pattern keys — vocabulary-sized, not data-sized. No
self-joins: candidate generation a la GSP is unnecessary because
contiguous patterns enumerate directly from the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequential_patterns(
    events: DataFrame,
    user_col: str,
    item_col: str,
    order_cols: list[str],
    n: int = 3,
    min_support: int = 1,
) -> DataFrame:
    """Support counts for consecutive length-``n`` item patterns.

    Returns one row per pattern (columns ``p1..pn``) with
    ``n_users`` (distinct-user support) and ``n_occurrences``
    (total contiguous matches), filtered to ``n_users >= min_support``.
    ``order_cols`` must make the per-user order total (include a
    tiebreak id) or the lead chain is nondeterministic.
    """
    if n < 2:
        raise ValueError("pattern length n must be >= 2")
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    out = events.select(
        F.col(user_col).alias("_u"), F.col(item_col).alias("p1"),
        *[
            F.lead(item_col, i).over(w).alias(f"p{i + 1}")
            for i in range(1, n)
        ],
    ).filter(F.col(f"p{n}").isNotNull())
    pats = [f"p{i + 1}" for i in range(n)]
    return (
        out.groupBy(*pats)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct(F.col("_u")).cast("long").alias("n_users"),
        )
        .filter(F.col("n_users") >= min_support)
    )
