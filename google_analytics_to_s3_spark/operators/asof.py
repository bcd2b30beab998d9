"""As-of (point-in-time) join — an operator Spark lacks natively,
built as a union + carry-forward window (brief: custom operators as
compositions of existing DataFrame ops).

For each left row, attach the latest right row with
``right_ts <= left_ts`` per key (backward as-of) — the
training-pipeline staple for joining events to the most recent
dimension snapshot / feature value without leakage.

Scale design: instead of a range join (quadratic per key) or a per-key
driver loop, both sides are tagged and unioned, then a single
``last(..., ignoreNulls)`` carry-forward window over
(key, ts) attaches the right payload. One hash exchange on the key,
one in-partition sort — the same plan shape as sessionization, and
the right side never fans out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    granularity: int,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Interval (range-containment) join: every event row paired with
    every interval row whose half-open window ``[start, end)`` contains
    the event's timestamp — the other range operator Spark lacks
    natively (as-of is "latest before"; this is "all containing").

    Scale design: a raw ``ON ts BETWEEN start AND end`` theta-join is a
    BroadcastNestedLoopJoin — O(|events| × |intervals|) compares and a
    non-shuffleable plan. Instead both sides are mapped onto a time
    GRID of ``granularity`` units: each interval explodes into the
    buckets it covers (fan-out = ceil(length / granularity), bounded by
    choosing granularity near the typical interval length), each event
    lands in exactly one bucket, and the join becomes an EQUI-join on
    (bucket, *key_cols) + an exact residual range predicate. Every
    (event, interval) pair meets in exactly one bucket — the event's —
    so no post-join dedup is needed. Catalyst gets a hashable key:
    shuffle or broadcast hash join, AQE-skew-splittable, never a BNLJ.

    ``granularity`` trades interval fan-out against bucket selectivity;
    at 100 TB pick it so the exploded interval side stays ≪ the event
    side (e.g. daily buckets for day-scale promo windows).
    """
    ev = events.withColumn(
        "_bkt", F.expr(f"{ts_col} div {granularity}")
    )
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {granularity}"),
                F.expr(f"({end_col} - 1) div {granularity}"),
            )
        ),
    )
    for k in key_cols:
        iv = iv.withColumnRenamed(k, f"_iv_{k}")
    cond = (
        (ev["_bkt"] == iv["_bkt"])
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    for k in key_cols:
        cond = cond & (ev[k] == iv[f"_iv_{k}"])
    return ev.join(iv, cond).drop(
        "_bkt", *[f"_iv_{k}" for k in key_cols]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    payload_col: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left columns + the ``right_value_cols`` of
    the latest right row at-or-before the left row's timestamp (null
    when no such row). Right-side ties on (key, ts) must be resolved
    upstream (dedupe to one row per key+ts) for determinism.
    """
    rv = F.struct(*[F.col(c) for c in right_value_cols])
    right_t = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        rv.alias(payload_col),
        F.lit(1).alias("_is_right"),
    )
    left_t = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(right_t.schema[payload_col].dataType).alias(
            payload_col
        ),
        F.lit(0).alias("_is_right"),
    )
    u = left_t.unionByName(right_t, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (>= semantics)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        payload_col, F.last(payload_col, ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_is_right") == 0).drop("_ts", "_is_right")
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    big_salt_col: str | None = None,
) -> DataFrame:
    """Skew-mitigating equi-join: pre-split hot join keys across
    ``salt`` reducers by replicating the SMALL side salt× and salting
    the big side deterministically, joining on (key, _salt).

    AQE's skew-join split handles most skew at the partition grain;
    this is the manual lever for the case AQE cannot fix — a single
    hot KEY whose rows exceed one reducer's memory even after
    partition splitting (a null-ish default key, a bot user, an
    'unknown' category). Result set is EXACTLY the plain equi-join's
    (inner), pinned by the oracle.

    The big side's salt must be deterministic for oracle replay —
    derived from ``big_salt_col`` (md5-mod, engine-portable) rather
    than a random number; any roughly-uniform per-row column works
    (row id, event id). Join fan-out: small side carries salt× rows
    total — keep ``salt`` ≲ 64 and the small side actually small
    (dims, stats tables), which is exactly the skew-join regime.
    """
    if big_salt_col is None:
        raise ValueError("salted_join needs big_salt_col for a "
                         "deterministic per-row salt")
    sb = big.withColumn(
        "_salt",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.col(big_salt_col).cast("string")), 1, 14
                ),
                16,
                10,
            ).cast("long"),
            F.lit(salt),
        ).cast("int"),
    )
    ss = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return sb.join(ss, [key, "_salt"]).drop("_salt")
