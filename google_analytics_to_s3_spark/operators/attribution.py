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


def touchpoint_summary(
    df: DataFrame,
    visitor_col: str = "fullVisitorId",
    ts_col: str = "timestamp",
    source_col: str = "trafficSource_source",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Collapse hits to one state row per visitor: (visitor, ordered
    touchpoints, max_ts).

    This is the 100 TB replacement for the reference's
    recompute-over-all-history design (main.py:1265-1273): attribution
    state becomes an incrementally maintainable summary of size
    O(touches per visitor), not a re-scan of every historical hit.
    Single shuffle of (visitor, (ts, source)) pairs; ordering is made
    explicit via ``array_sort`` over (ts, tiebreaks) structs, so the
    result does not depend on shuffle arrival order.
    """
    key = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tiebreak_cols)],
        F.col(source_col).alias("_src"),
    )
    return df.groupBy(visitor_col).agg(
        F.transform(
            F.array_sort(F.collect_list(key)), lambda s: s["_src"]
        ).alias("touchpoints"),
        F.max(ts_col).alias("max_ts"),
    )


def merge_touchpoint_summaries(
    prev: DataFrame,
    new: DataFrame,
    visitor_col: str = "fullVisitorId",
) -> DataFrame:
    """Incremental state merge: previous per-visitor summary ∪ a newer
    batch's summary (all of ``new``'s events at-or-after ``prev``'s —
    the daily-batch invariant). Full-outer join on the visitor key
    shuffles only summary rows — the historical hit table is never
    re-read, unlike the reference's daily history re-scan."""
    p = prev.select(
        visitor_col,
        F.col("touchpoints").alias("_tp_a"),
        F.col("max_ts").alias("_ts_a"),
    )
    n = new.select(
        visitor_col,
        F.col("touchpoints").alias("_tp_b"),
        F.col("max_ts").alias("_ts_b"),
    )
    empty = F.array().cast("array<string>")
    return (
        p.join(n, visitor_col, "full_outer")
        .select(
            visitor_col,
            F.concat(
                F.coalesce("_tp_a", empty), F.coalesce("_tp_b", empty)
            ).alias("touchpoints"),
            F.greatest("_ts_a", "_ts_b").alias("max_ts"),
        )
    )


def summary_attribution(summary: DataFrame) -> DataFrame:
    """Derive the W9-W11 outputs (direct-free variant, first, last
    non-direct) from a touchpoint summary — same columns as
    :func:`with_touchpoints` but one row per visitor."""
    return (
        summary.withColumn(
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


def attribution_credits(
    touches: DataFrame,
    conversions: DataFrame,
    visitor_col: str = "fullVisitorId",
    ts_col: str = "timestamp",
    source_col: str = "trafficSource_source",
    value_col: str = "conv_value",
    tiebreak_cols: tuple[str, ...] = (),
    halflife_ms: int = 86_400_000,
    decay_cap: int = 20,
    direct_token: str = "(direct)",
) -> DataFrame:
    """Multi-touch attribution credit assignment — distribute each
    visitor's conversion value over their ordered touchpoints under the
    six standard GA attribution models (first touch, last touch, last
    non-direct, linear, position-based/U-shaped, time decay).

    Beyond-reference capability: the reference stops at the touchpoint
    arrays themselves (functions/sessionization/main.py:995-1010); the
    models here are the analyses those arrays exist to feed.

    Model semantics (per visitor with ``n`` touches and conversion
    value ``v``):

    - ``credit_first``        — all of ``v`` to touch 1.
    - ``credit_last``         — all of ``v`` to touch ``n``.
    - ``credit_last_nd``      — all of ``v`` to the last touch whose
      source is not ``direct_token``; if every touch is direct, the
      final touch keeps it (GA's last-non-direct-click fallback).
    - ``credit_linear``       — ``v / n`` to every touch.
    - ``credit_position``     — U-shaped: 40% to the first touch, 40%
      to the last, the remaining 20% split evenly over the middle;
      degenerate cases n=1 → 100%, n=2 → 50/50.
    - ``credit_decay``        — time decay with half-life
      ``halflife_ms``: touch ``i`` weighs ``2^(cap - k_i)`` where
      ``k_i = min((t_last - t_i) // halflife_ms, cap)``. Weights are
      exact BIGINTs (integer div + shiftleft — never a float pow), so
      the per-visitor weight total is an order-independent integer sum
      and the credit ratio is bit-reproducible in any engine.

    Every credit is rounded to 6 decimals and cast DECIMAL(38,6) at
    the TOUCH grain — downstream sums over these decimals are exact
    and shuffle-order-independent (the repo-wide determinism
    convention; see PERF.md).

    Scale: one hash exchange on the visitor key feeds all window
    computations; ``conversions`` (one row per converting visitor)
    joins on that same key. No global sorts, no data-sized state —
    per-visitor windows are bounded by touches-per-visitor.

    ``touches``: (visitor, ts, source [, tiebreaks]) — one row per
    touch. ``conversions``: (visitor, value) — one row per visitor.
    Returns the touch grain with ``touch_idx``, ``n_touches`` and the
    six ``credit_*`` DECIMAL(38,6) columns.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in tiebreak_cols
    ]
    w_ord = Window.partitionBy(visitor_col).orderBy(*order)
    w_all = (
        Window.partitionBy(visitor_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # join first: non-converting visitors drop before any window work,
    # and the join's visitor-hash exchange is the same partitioning the
    # windows need — one shuffle total for the touch side
    d = (
        touches.join(conversions, visitor_col)
        .withColumn("touch_idx", F.row_number().over(w_ord))
        .withColumn("n_touches", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_k",
            F.least(
                F.expr(
                    f"(max({ts_col}) OVER (PARTITION BY {visitor_col}) "
                    f"- {ts_col}) div {halflife_ms}"
                ),
                F.lit(decay_cap).cast("long"),
            ),
        )
        .withColumn(
            "_w", F.expr(f"shiftleft(1L, int({decay_cap} - _k))")
        )
        .withColumn("_w_total", F.sum("_w").over(w_all))
        .withColumn(
            "_last_nd_idx",
            F.max(
                F.when(
                    F.col(source_col) != direct_token, F.col("touch_idx")
                )
            ).over(w_all),
        )
    )
    v = F.col(value_col)
    n = F.col("n_touches")
    idx = F.col("touch_idx")
    first = F.when(idx == 1, v).otherwise(F.lit(0.0))
    last = F.when(idx == n, v).otherwise(F.lit(0.0))
    last_nd = F.when(
        F.coalesce(F.col("_last_nd_idx"), n) == idx, v
    ).otherwise(F.lit(0.0))
    linear = v / n
    position = (
        F.when(n == 1, v)
        .when(n == 2, v * 0.5)
        .when((idx == 1) | (idx == n), v * 0.4)
        .otherwise(v * 0.2 / (n - 2))
    )
    decay = v * F.col("_w") / F.col("_w_total")
    dec = lambda c: F.round(c, 6).cast("decimal(38,6)")  # noqa: E731
    return (
        d.select(
            visitor_col,
            ts_col,
            source_col,
            "touch_idx",
            "n_touches",
            dec(first).alias("credit_first"),
            dec(last).alias("credit_last"),
            dec(last_nd).alias("credit_last_nd"),
            dec(linear).alias("credit_linear"),
            dec(position).alias("credit_position"),
            dec(decay).alias("credit_decay"),
        )
    )


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
    plans/pipeline.py docstring).

    ``history`` must share ``today``'s column TYPES: unionByName
    coerces mismatched columns to a common type, and under ANSI a
    string-vs-numeric mismatch turns ``''`` defaults into runtime cast
    errors. History written by this engine round-trips correctly via
    ``sources/ga.load_own_session_history`` (self-describing parquet);
    the reference-schema loader is only for histories that really
    follow ``session_schema``."""
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


def shapley_attribution(
    journeys: DataFrame,
    channel_col: str,
    user_col: str,
    conv_col: str,
    channels: list[str],
) -> DataFrame:
    """Shapley-value channel attribution — the coalition-game model
    completing the repo's attribution suite (six heuristic models in
    :func:`attribution_credits`, the data-driven removal-effect model
    in operators/markov.py; cf. the reference's last-interaction-only
    attribution, functions/sessionization/main.py:553-561).

    The characteristic function is the industry-standard conversion
    rate per OBSERVED channel coalition: a user's coalition is the SET
    of distinct channels they touched (order-free, encoded as a
    bitmask over the fixed ``channels`` list), and
    ``v(S) = conversions(S) / journeys(S)`` with unobserved coalitions
    contributing ``v = 0`` (documented plug-in; with it the exact
    Shapley sum is computable without any model fitting — at the cost
    that a channel can carry a NEGATIVE value when coalitions
    containing it are unobserved while their complements convert;
    tests pin that artifact explicitly). Then

        phi_i = sum over S not containing i of
                |S|! (n-|S|-1)! / n! * (v(S + i) - v(S))

    evaluated RELATIONALLY: the 2^n subset lattice is a
    ``spark.range`` frame, popcount is an explicit bit-sum (engine-
    portable, no bit_count dependency), the factorial weights enter as
    exact integer literals over the common denominator n!, and the
    only division is v's rate plus the final /n! — one double product
    per (channel, subset) pair, rounded 6 as per the repo's parity
    convention.

    Scale shape: the ONLY data-sized operations are the per-user
    bitmask aggregation (one hash agg via bit_or) and the coalition
    rollup (2^n <= tiny rows out). The lattice math is O(n * 2^n)
    rows — n is bounded by the channel taxonomy (document: n <= 16),
    never by data. No collect anywhere.

    Output: one row per channel — ``channel``, ``n_journeys``
    (journeys touching it), ``shap`` (round 6).
    """
    n = len(channels)
    if not 1 <= n <= 16:
        raise ValueError("channels list must have 1..16 entries")
    if len(set(channels)) != n:
        raise ValueError("channels must be distinct")
    spark = journeys.sparkSession
    import math

    idx = F.array(*[F.lit(c) for c in channels])
    powers = F.array(*[F.lit(1 << i) for i in range(n)])
    # channel -> bit via the fixed list order; an unknown channel
    # (array_position = 0) fails LAZILY at execution — no eager
    # validation scan at plan-construction time
    pos = F.array_position(idx, F.col(channel_col)).cast("int")
    bit = F.when(pos > 0, F.element_at(powers, pos)).otherwise(
        F.raise_error(F.concat(
            F.lit("shapley_attribution: channel '"),
            F.col(channel_col),
            F.lit("' is outside the channels list"),
        ))
    )
    masked = journeys.select(
        F.col(user_col).alias("_u"),
        bit.alias("_b"),
        F.col(conv_col).cast("int").alias("_c"),
    )
    per_user = masked.groupBy("_u").agg(
        F.expr("bit_or(_b)").alias("mask"),
        F.max("_c").alias("conv"),
    )
    coal = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("conv").alias("n_c"),
    )

    lattice = spark.range(2 ** n).select(F.col("id").alias("s"))
    v = (
        lattice.join(F.broadcast(coal), F.col("s") == F.col("mask"), "left")
        .select(
            "s",
            F.coalesce(
                F.col("n_c").cast("double") / F.col("n_j").cast("double"),
                F.lit(0.0),
            ).alias("v"),
        )
    )

    # weights w(s_size) * n! as exact integers
    wnum = [
        math.factorial(k) * math.factorial(n - 1 - k) for k in range(n)
    ]
    nfact = math.factorial(n)
    wnum_arr = F.array(*[F.lit(x) for x in wnum])
    popcnt = sum(
        (F.shiftright(F.col("s"), j) % 2).cast("int") for j in range(n)
    )

    chans = spark.range(n).select(
        F.col("id").cast("int").alias("ci"),
        F.element_at(idx, F.col("id").cast("int") + 1).alias("channel"),
    )
    pairs = (
        chans.crossJoin(F.broadcast(v.withColumnRenamed("v", "v_s")))
        .filter(F.expr("shiftright(s, ci)") % 2 == 0)
        .withColumn(
            "s_with", F.col("s") + F.element_at(powers, F.col("ci") + 1)
        )
    )
    v2 = v.select(
        F.col("s").alias("s_with"), F.col("v").alias("v_sw")
    )
    contrib = pairs.join(F.broadcast(v2), "s_with").select(
        "channel", "ci",
        (
            (F.col("v_sw") - F.col("v_s"))
            * F.element_at(wnum_arr, popcnt + 1).cast("double")
        ).alias("term"),
    )
    phi = contrib.groupBy("channel", "ci").agg(
        F.round(F.sum("term") / F.lit(float(nfact)), 6).alias("shap")
    )

    # journeys-per-channel from the <=2^n-row coalition table — never
    # a second pass over the user-sized frame
    touched = (
        coal.crossJoin(F.broadcast(chans.select("ci")))
        .filter(F.expr("shiftright(mask, ci)") % 2 == 1)
        .groupBy("ci")
        .agg(F.sum("n_j").alias("n_journeys"))
    )
    return (
        phi.join(F.broadcast(touched), "ci", "left")
        .select(
            "channel",
            F.coalesce(F.col("n_journeys"), F.lit(0)).alias("n_journeys"),
            "shap",
        )
    )
