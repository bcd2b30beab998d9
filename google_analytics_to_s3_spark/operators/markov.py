"""Markov removal-effect ("data-driven") attribution.

The model behind GA4's data-driven attribution, on top of the same
touchpoint sequences the reference accumulates (W8-W11, reference
functions/sessionization/main.py:928-1010): journeys become a
first-order Markov chain over channels with absorbing ``conv`` /
``null`` states; a channel's credit is its *removal effect* — how much
the chain's start→conv absorption probability drops when every
transition into that channel is redirected to ``null``.

Scale shape: the only data-sized work is one window (lead) over the
visitor partitioning plus one hash aggregation down to the transition
matrix — at most ``(n_channels+1) × (n_channels+2)`` rows regardless
of corpus size. That matrix is collected to the driver (the same
bounded-pull contract as the k-means centroid pulls in
operators/similarity.py) and the absorption solve runs there on an
integer grid, so Spark and any SQL oracle replaying the same
arithmetic agree bit-for-bit:

- transition probabilities quantized to ``q = cnt*Q div total``
  (``Q = 2**30``; row totals keep the null/removed mass, so dropped
  transitions correctly leak probability);
- absorption via **matrix squaring**: ``M ← M·M div Q`` repeated
  ``MARKOV_SQUARINGS`` times computes all 2**S-step path masses in S
  rounds (vs 2**S rounds of value iteration — the difference between
  a converged absorption probability and a truncated one). Every
  entry stays a BIGINT: ``q·q ≤ 2**60`` and ≤6 middle terms sum under
  ``2**63`` (the oracle's HUGEINT accumulation is cast back per
  entry, same truncation).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MARKOV_Q = 1 << 30       # transition/absorption probability grid
MARKOV_SQUARINGS = 8     # M^(2^8): 256-step absorption mass

START, CONV, NULL = "start", "conv", "null"


def channel_transitions(
    touches: DataFrame,
    visitor_col: str,
    ts_col: str,
    source_col: str,
    tiebreak_col: str,
    converted_col: str,
) -> DataFrame:
    """(s, t, cnt) transition counts of the journey chain.

    ``touches`` must carry one row per touch with a per-visitor
    0/1 ``converted_col``. Start rows, consecutive-touch rows and
    terminal rows are emitted from ONE windowed pass (a single
    visitor-hash exchange), then reduced by a hash aggregation whose
    result is at most (channels+1)×(channels+2) rows.
    """
    w = Window.partitionBy(visitor_col).orderBy(ts_col, tiebreak_col)
    seq = touches.select(
        F.col(source_col).alias("_src"),
        F.lead(source_col).over(w).alias("_nxt"),
        F.row_number().over(w).alias("_rn"),
        F.col(converted_col).alias("_conv"),
    )
    starts = seq.filter(F.col("_rn") == 1).select(
        F.lit(START).alias("s"), F.col("_src").alias("t")
    )
    steps = seq.filter(F.col("_nxt").isNotNull()).select(
        F.col("_src").alias("s"), F.col("_nxt").alias("t")
    )
    finals = seq.filter(F.col("_nxt").isNull()).select(
        F.col("_src").alias("s"),
        F.when(F.col("_conv") == 1, F.lit(CONV))
        .otherwise(F.lit(NULL))
        .alias("t"),
    )
    return (
        starts.unionByName(steps)
        .unionByName(finals)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def absorption_grid(
    trans: list[tuple[str, str, int]],
    removed: str | None = None,
) -> int:
    """start→conv absorption mass on the ``MARKOV_Q`` grid after
    ``2**MARKOV_SQUARINGS`` steps, with transitions into ``removed``
    (if given) leaking to the null sink. Pure deterministic integer
    arithmetic — replayable in any engine."""
    totals: dict[str, int] = defaultdict(int)
    for s, _t, cnt in trans:
        totals[s] += cnt
    m: dict[tuple[str, str], int] = {
        (s, t): cnt * MARKOV_Q // totals[s]
        for s, t, cnt in trans
        if t != NULL and t != removed
    }
    m[(CONV, CONV)] = MARKOV_Q
    for _ in range(MARKOV_SQUARINGS):
        acc: dict[tuple[str, str], int] = defaultdict(int)
        for (s, t1), q1 in m.items():
            for (s2, t2), q2 in m.items():
                if t1 == s2:
                    acc[(s, t2)] += q1 * q2
        m = {k: v // MARKOV_Q for k, v in acc.items()}
    return m.get((START, CONV), 0)


def removal_effects(
    trans: list[tuple[str, str, int]],
    channels: list[str],
) -> dict[str, dict[str, int]]:
    """Per-scenario absorption grids: ``{"base": {"p": ...},
    ch: {"p": ..., "n_in": ...}}`` (scenario ``ch`` = all transitions
    into ``ch`` redirected to null)."""
    out: dict[str, dict[str, int]] = {"base": {"p": absorption_grid(trans)}}
    for ch in channels:
        out[ch] = {
            "p": absorption_grid(trans, removed=ch),
            "n_in": sum(c for _s, t, c in trans if t == ch),
        }
    return out
