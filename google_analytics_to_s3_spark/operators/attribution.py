"""Multi-touch touchpoint accumulation over visitor history (W8-W11).

Reference (functions/sessionization/main.py:995-1010) relies on a
*global* ``orderBy("timestamp")`` ×3 to induce the ordering of an
unordered ``collect_list`` window — three full range-partition sorts.
Here the ordering is explicit in the window frame, so the plan needs
exactly one hash exchange on the visitor and zero global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_touchpoints(
    df: DataFrame,
    visitor_col: str = "fullVisitorId",
    ts_col: str = "timestamp",
    source_col: str = "trafficSource_source",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """W8-W11: ordered touchpoints array, its direct-free variant,
    first touchpoint, last non-direct touchpoint (else ``(direct)``).

    ``tiebreak_cols`` make the accumulation order total when timestamps
    can collide (the reference orders by timestamp alone)."""
    w_full = (
        Window.partitionBy(visitor_col)
        .orderBy(F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    touch = F.collect_list(source_col).over(w_full)
    out = (
        df.withColumn("touchpoints", touch)
        .withColumn(
            "touchpoints_wo_direct",
            F.filter(F.col("touchpoints"), lambda x: x != "(direct)"),
        )
        .withColumn("first_touchpoint", F.get(F.col("touchpoints"), 0))
        .withColumn(
            "last_touchpoint",
            F.coalesce(
                F.get(F.reverse(F.col("touchpoints_wo_direct")), 0),
                F.lit("(direct)"),
            ),
        )
    )
    return out


def recompute_touchpoints(
    history: DataFrame,
    today: DataFrame,
    visitor_col: str = "fullVisitorId",
    ts_col: str = "timestamp",
    source_col: str = "trafficSource_source",
) -> DataFrame:
    """EP3 step k (main.py:1265-1273): history ∪ today (by name — the
    reference's positional ``union`` is a silent-misalignment hazard),
    drop stale touchpoint columns, recompute over the full visitor
    history.

    Scale note: this is the reference's recompute-the-world design; at
    100 TB keep an incremental per-visitor summary instead (see
    plans/pipeline.py docstring)."""
    drop_cols = [
        "touchpoints", "touchpoints_wo_direct",
        "first_touchpoint", "last_touchpoint",
    ]
    h = history.drop(*drop_cols)
    t = today.drop(*drop_cols)
    return with_touchpoints(
        h.unionByName(t), visitor_col=visitor_col,
        ts_col=ts_col, source_col=source_col,
    )
