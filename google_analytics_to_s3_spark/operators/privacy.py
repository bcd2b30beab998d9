"""User-erasure (right-to-be-forgotten) propagation across a mart tree.

The operational requirement behind the reference's PII posture
(anonymize_ip, functions/sessionization/main.py:168-178; the PII scan
in operators/curation.py): when a deletion request arrives, the user's
rows must disappear from the raw table AND every derived mart, and the
run must produce an auditable per-table report.

Scale shape: the request list is tiny relative to the data (thousands
of keys vs billions of rows), so every purge is a **broadcast**
anti-join — the fact tables never shuffle — and every report line is a
single conditional-aggregation pass over one table (no second scan for
the purged-row count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def erase_users(df: DataFrame, requests: DataFrame, key: str) -> DataFrame:
    """``df`` minus every row whose ``key`` appears in ``requests``.

    ``requests`` must be a one-column DataFrame of keys (deduplication
    not required). Broadcast ``left_anti`` — no shuffle of ``df``.
    """
    req = F.broadcast(
        requests.select(F.col(requests.columns[0]).alias(key)).distinct()
    )
    return df.join(req, on=key, how="left_anti")


def erasure_report(
    tables: list[tuple[str, DataFrame, str]],
    requests: DataFrame,
) -> DataFrame:
    """Audit report for an erasure run: one row per (name, df, key) in
    ``tables`` with total / purged / kept row counts and the number of
    distinct requested users actually present.

    One conditional-aggregation pass per table: rows are flagged by a
    broadcast left join against the request list, then counted once —
    ``rows_kept`` is derived, not re-scanned.

    The internal join/flag column names are chosen per-table to never
    collide with the fact table's own columns; an empty ``tables`` list
    yields an empty (correctly-typed) report.
    """
    req_col = requests.columns[0]
    reports = []
    for name, df, key in tables:
        # Collision-proof internal names: extend a reserved prefix until
        # it is not a prefix of any existing column.
        prefix = "_erase"
        while any(c.startswith(prefix) for c in df.columns):
            prefix += "_x"
        kcol, hcol = f"{prefix}_key", f"{prefix}_hit"
        req = requests.select(F.col(req_col).alias(kcol)).distinct()
        flagged = df.join(
            F.broadcast(req.withColumn(hcol, F.lit(1))),
            df[key] == F.col(kcol),
            "left",
        )
        reports.append(
            flagged.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("rows_total"),
                F.coalesce(F.sum(hcol), F.lit(0))
                .cast("long")
                .alias("rows_purged"),
                (F.count(F.lit(1)) - F.coalesce(F.sum(hcol), F.lit(0)))
                .cast("long")
                .alias("rows_kept"),
                F.count_distinct(
                    F.when(F.col(hcol) == 1, df[key])
                ).cast("long").alias("users_purged"),
            )
        )
    if not reports:
        spark = requests.sparkSession
        return spark.createDataFrame(
            [],
            "table_name string, rows_total long, rows_purged long, "
            "rows_kept long, users_purged long",
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def k_anonymity_report(
    df: DataFrame,
    stable_cols: list[str],
    fine_col: str,
    coarse_col: str,
    coarse_expr: Column,
    k: int,
) -> DataFrame:
    """k-anonymity risk report with a one-step generalization-ladder
    check.

    The quasi-identifier is ``stable_cols + [fine_col]``;
    ``coarse_expr`` (an expression over ``df``'s columns, typically a
    coarsening of ``fine_col``) defines the next rung of the
    generalization ladder. Output: one row per fine quasi-identifier
    group with ``n_fine``/``n_coarse`` member counts, ``at_risk``
    (< k members) and ``fixed_by_generalization`` (the coarse group
    alone already clears k).

    Shape: two hash aggregations (fine + coarse grain) and one
    equi-join on the coarse key — group-sized tables only; at 100 TB
    the quasi-identifier cardinality, not the row count, bounds the
    join.
    """
    fine = (
        df.withColumn(coarse_col, coarse_expr)
        .groupBy(*stable_cols, fine_col, coarse_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_fine"))
    )
    coarse = (
        df.withColumn(coarse_col, coarse_expr)
        .groupBy(*stable_cols, coarse_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_coarse"))
    )
    return fine.join(coarse, [*stable_cols, coarse_col]).select(
        *stable_cols, fine_col, "n_fine", "n_coarse",
        (F.col("n_fine") < k).alias("at_risk"),
        ((F.col("n_fine") < k) & (F.col("n_coarse") >= k)).alias(
            "fixed_by_generalization"
        ),
    )


_DP_GRID = 1 << 20  # uniform-draw granularity (matches the bootstrap grid)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: "list[str] | tuple[str, ...]",
    epsilon: float = 0.5,
    threshold: int = 10,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private count release per group: true counts get
    Laplace(1/epsilon) noise (sensitivity 1 when each privacy unit
    contributes one row per group — the caller pre-aggregates to the
    privacy unit first, e.g. distinct users), are rounded to
    integers, and groups whose NOISY count falls below ``threshold``
    are suppressed — the stability-based release for unknown group
    domains (thresholding on the noisy value, never the true one, so
    the release decision itself is private).

    The noise is the exact inverse-CDF transform of a deterministic
    md5-grid uniform (the ``bootstrap_multiplicity`` convention):
    ``u = (h % 2^20 + 0.5) / 2^20`` from the group key, then
    ``-1/eps * sign(u - .5) * ln(1 - 2|u - .5|)``. Determinism makes
    the release auditable/replayable cross-engine (one fixed-order
    ``ln``, the psi/pmi contract); the half-step offset keeps the log
    argument >= 2^-20, bounding |noise| <= ~13.9/eps. A deterministic
    seed means ONE release per seed — re-running does not spend extra
    privacy budget, but callers must rotate ``seed`` (and account for
    it) when they genuinely re-release.

    Shape: one hash aggregation + a map-side projection. Output:
    ``(group..., released_count)`` — true counts never leave the plan.
    """
    gcols = list(group_cols)
    counts = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("_true")
    )
    key = F.concat_ws(
        "\x1f", F.lit(seed), *[F.col(c).cast("string") for c in gcols]
    )
    g = (
        F.conv(F.substring(F.md5(key), 1, 10), 16, 10).cast("long")
        % _DP_GRID
    )
    u = (g.cast("double") + F.lit(0.5)) / F.lit(float(_DP_GRID))
    c = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )
    released = F.round(F.col("_true").cast("double") + noise).cast("long")
    return (
        counts.select(*gcols, released.alias("released_count"))
        .filter(F.col("released_count") >= threshold)
    )


_LDIV_GRID = 10**9


def l_diversity_report(
    df: DataFrame,
    quasi_cols: "list[str] | tuple[str, ...]",
    sensitive_col: str,
    l_min: int = 2,
) -> DataFrame:
    """l-diversity risk report (Machanavajjhala et al. ICDE'06) — the
    k-anonymity upgrade: a group can be k-anonymous yet leak the
    sensitive attribute when everyone in it shares one value. Per
    quasi-identifier group: size, DISTINCT sensitive values
    (distinct l), and Shannon entropy of the sensitive distribution
    (entropy l-diversity), flagging groups below ``l_min``.

    Exactness: the entropy terms ``-p ln p`` are quantized to a 10^9
    integer grid per (group, sensitive-value) row BEFORE the
    cross-value sum (the repo's addition-order-free convention; one
    fixed-order ln per value — the psi/pmi contract). Two hash
    aggregations: (quasi..., sensitive) grain, then quasi grain.

    Output: ``(quasi..., n_rows, distinct_sensitive, entropy,
    is_diverse)`` with entropy round 6 and ``is_diverse = distinct >=
    l_min``.
    """
    qcols = list(quasi_cols)
    per_val = df.groupBy(
        *qcols, F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    totals = per_val.groupBy(*qcols).agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("distinct_sensitive"),
    )
    withp = per_val.join(totals.select(*qcols, "n_rows"), qcols)
    p = F.col("_c").cast("double") / F.col("n_rows").cast("double")
    term_q = F.round(
        -p * F.log(p) * F.lit(float(_LDIV_GRID))
    ).cast("long")
    ent = withp.groupBy(*qcols).agg(
        F.sum(term_q).alias("_hq")
    )
    return (
        totals.join(ent, qcols)
        .select(
            *qcols, "n_rows", "distinct_sensitive",
            F.round(
                F.col("_hq").cast("double") / F.lit(float(_LDIV_GRID)),
                6,
            ).alias("entropy"),
            (F.col("distinct_sensitive") >= l_min).alias("is_diverse"),
        )
    )
