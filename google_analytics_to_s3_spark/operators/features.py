"""Point-in-time-correct rolling feature generation — the ML
feature-engineering stage between the event log and a training set.

For every event, aggregate that user's OWN history over multiple
trailing horizons (1 d / 7 d / ...) *as of that event*: the
leakage-free construction every churn/LTV/abuse model needs (a feature
computed over [t-h, t] can be served online by replaying the same
window — no train/serve skew, no future leakage).

Spark-first shape: one hash exchange on the user + one in-partition
sort feeds EVERY horizon — all windows share
``partitionBy(user).orderBy(ts)`` so Catalyst plans a single
Window node over a single Exchange (plan-asserted in tests). The
trailing window is a RANGE frame over epoch-ms, so ties (equal
timestamps) are handled by value, not row order — the result is
partition- and order-invariant.

Determinism contract: monetary sums accumulate as BIGINT cents
(``floor(value * 100)`` — an IEEE-exact double product + floor any
engine reproduces), counts as BIGINT. At 100 TB the per-user history
sort is the only super-linear cost; horizon count adds projections,
not exchanges.

Cf. reference nightly job (mydatastack/google-analytics-to-s3
sql/session_agg.sql) which computes per-session aggregates only at
session grain — this generalizes to arbitrary trailing horizons at
event grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_MS = 86_400_000


def rolling_features(
    events: DataFrame,
    horizons_ms: dict[str, int],
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per event: (id, user, ts) + per-horizon trailing
    ``n_<name>`` event count and ``cents_<name>`` value sum over
    ``[ts - h + 1, ts]`` (exactly ``h`` ms, inclusive of the event).

    ``horizons_ms`` maps a feature suffix to its window length, e.g.
    ``{"1d": DAY_MS, "7d": 7 * DAY_MS}``.
    """
    if not horizons_ms:
        raise ValueError("horizons_ms must name at least one horizon")
    for name, h in horizons_ms.items():
        if h <= 0:
            raise ValueError(f"horizon {name!r} must be positive, got {h}")
    cents = F.floor(F.col(value_col).cast("double") * 100).cast("long")
    base = events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col).cast("long").alias(ts_col),
        cents.alias("_cents"),
    )
    cols = [F.col(id_col), F.col(user_col), F.col(ts_col)]
    for name, h in horizons_ms.items():
        w = (
            Window.partitionBy(user_col)
            .orderBy(ts_col)
            .rangeBetween(-(h - 1), 0)
        )
        cols.append(F.count("*").over(w).cast("long").alias(f"n_{name}"))
        cols.append(
            F.sum("_cents").over(w).cast("long").alias(f"cents_{name}")
        )
    return base.select(*cols)


def rfm_segments(
    per_user: DataFrame,
    user_col: str,
    recency_col: str,
    frequency_col: str,
    monetary_col: str,
    tiles: int = 5,
) -> DataFrame:
    """RFM quintile segmentation over a per-user metric table: each
    dimension gets an ``ntile(tiles)`` score (higher = better customer
    — more recent, more frequent, higher spend), plus the combined
    ``segment`` label "R-F-M".

    Determinism: every ntile orders by (metric ASC, user ASC) — the
    user tiebreak makes tile boundaries reproducible across engines
    and partitionings (ntile's n-mod-k front-loading rule is standard
    SQL, identical in Spark and DuckDB once the order is total).

    Scale shape: the input is already per-user (the caller's one
    data-sized aggregation); three ntile windows each need a global
    order over the USER-sized table. At billions of users swap ntile
    for a percentile-bucket join (quantile_sketch cutpoints +
    broadcast range lookup) — documented escape hatch, same output
    contract.
    """
    wr = Window.orderBy(F.col(recency_col).asc(), F.col(user_col).asc())
    wf = Window.orderBy(F.col(frequency_col).asc(), F.col(user_col).asc())
    wm = Window.orderBy(F.col(monetary_col).asc(), F.col(user_col).asc())
    return per_user.select(
        user_col, recency_col, frequency_col, monetary_col,
        F.ntile(tiles).over(wr).cast("int").alias("r_score"),
        F.ntile(tiles).over(wf).cast("int").alias("f_score"),
        F.ntile(tiles).over(wm).cast("int").alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )
