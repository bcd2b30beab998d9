"""30-minute-gap sessionization — the reference engine's signature
computation (W1-W7, A2 in SURVEY.md §2.5), rebuilt as native window
transforms.

Reference semantics (functions/sessionization/main.py:408-460):

- W1  ``lag(ts) over (partition by visitor order by ts)`` → last_event
- W2  gap >= 30 min (or first hit) → ``is_new_session`` flag
- W3  running ``sum(is_new_session)`` → per-visitor session number
- W4  ``first_value(ts) over (partition by visitor, session order by
      is_new_session desc)`` → session start. The start row is the
      earliest row of the session, so this equals ``min(ts)`` — we use
      the deterministic ``min``.
- W5  ``last_value(ts)`` over the whole partition **without ORDER BY**
      (storage-order dependent, reference main.py:444-445). Deterministic
      intent is the session's max arrival time → ``max(ts)``.
- W6  ``sha1(concat(visitor, start, end))`` → visit_id
- W7  ``row_number() over (partition by visitor order by ts)`` →
      event_sequence (per *visitor*, not per session — reference quirk,
      main.py:438; kept).
- A2  windowed conditional sum of purchase revenue per session
      (reference main.py:452-460) — reference sums a *string* column;
      we type it.

Scale notes
-----------
All windows partition by ``visitor`` or ``(visitor, session)``. Since
``{visitor} ⊆ {visitor, session}``, HashPartitioning(visitor) satisfies
the ClusteredDistribution of the finer windows, so Catalyst plans ONE
exchange (hash on visitor) for the whole chain — verified via
``.explain``: a single Exchange feeds consecutive Window nodes that
differ only in sort order. At 100 TB the only skew risk is a hot visitor
(bot traffic); filter bots upstream (the reference keeps them —
enrichment/filters/ip.py:5-6) or pre-split via `split_hot_cold` in
operators/skew.py (gap sessionization of one visitor is inherently
sequential, so hot keys get a separate coarse plan, not salting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

THIRTY_MIN_MS = 30 * 60 * 1000


def _order_cols(ts_col: str, tiebreak_cols: tuple[str, ...]) -> list[Column]:
    return [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]


def with_session_flags(
    df: DataFrame,
    visitor_col: str = "body_cid",
    ts_col: str = "received_at_apig",
    gap_ms: int = THIRTY_MIN_MS,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """W1-W3: last_event, is_new_session, user_session_id.

    ``ts_col`` must be numeric (epoch millis). ``tiebreak_cols`` make
    ordering total when timestamps can collide (the reference orders by
    timestamp alone — nondeterministic on ties).
    """
    w = Window.partitionBy(visitor_col).orderBy(*_order_cols(ts_col, tiebreak_cols))
    # Running-sum frame: ROWS, explicit (reference relies on the default
    # RANGE frame, which only differs on ts ties; tiebreaks make it total).
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts = F.col(ts_col)
    last_event = F.lag(ts_col, 1).over(w)
    return (
        df.withColumn("last_event", last_event)
        .withColumn(
            "is_new_session",
            F.when(
                F.col("last_event").isNull()
                | (ts - F.col("last_event") >= F.lit(gap_ms)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("user_session_id", F.sum("is_new_session").over(w_run))
    )


def with_visit_ids(
    df: DataFrame,
    visitor_col: str = "body_cid",
    ts_col: str = "received_at_apig",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """W4-W7: visit_start/visit_end/visit_id/event_sequence.

    Requires ``user_session_id`` (from :func:`with_session_flags`).
    The (visitor, session) windows reuse the visitor-hash exchange —
    no additional shuffle, only an in-partition sort.
    """
    w_sess = Window.partitionBy(visitor_col, "user_session_id")
    w_visitor = Window.partitionBy(visitor_col).orderBy(
        *_order_cols(ts_col, tiebreak_cols)
    )
    return (
        df.withColumn("visit_start", F.min(ts_col).over(w_sess))
        .withColumn("visit_end", F.max(ts_col).over(w_sess))
        .withColumn(
            "visit_id",
            F.sha1(
                F.concat(
                    F.col(visitor_col).cast("string"),
                    F.col("visit_start").cast("string"),
                    F.col("visit_end").cast("string"),
                )
            ),
        )
        .withColumn("event_sequence", F.row_number().over(w_visitor))
    )


def with_session_revenue(
    df: DataFrame,
    visitor_col: str = "body_cid",
    revenue_col: str = "body_tr",
    is_purchase: Column | None = None,
    out_col: str = "total_revenue_per_session",
) -> DataFrame:
    """A2: per-session purchase revenue (typed, not string-summed).

    Reference (main.py:452-460) sums the *string* ``body_tr`` with ``''``
    fallback over ``partition by visit_id`` and only materializes it on
    session-start rows; we sum a double over (visitor, session) — same
    partitioning as the other windows, so still no extra shuffle — and
    expose it on every row (exports filter to session starts anyway).
    """
    if is_purchase is None:
        is_purchase = (F.col("body_t") == "event") & (F.col("body_pa") == "purchase")
    w_sess = Window.partitionBy(visitor_col, "user_session_id")
    rev = F.when(is_purchase, F.col(revenue_col).cast("double"))
    return df.withColumn(out_col, F.sum(rev).over(w_sess))


def sessionize(
    df: DataFrame,
    visitor_col: str = "body_cid",
    ts_col: str = "received_at_apig",
    gap_ms: int = THIRTY_MIN_MS,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Full W1-W7 chain. One shuffle (hash on visitor), two sorts."""
    return df.transform(
        with_session_flags,
        visitor_col=visitor_col,
        ts_col=ts_col,
        gap_ms=gap_ms,
        tiebreak_cols=tiebreak_cols,
    ).transform(
        with_visit_ids,
        visitor_col=visitor_col,
        ts_col=ts_col,
        tiebreak_cols=tiebreak_cols,
    )
