"""Data-quality constraint checks — the Deequ-style gate a pipeline
runs before publishing a table (cf. Schelter et al., VLDB 2018,
"Automating Large-Scale Data Quality Verification").

Declarative constraints compile to ONE conditional aggregate per table
scan — not one job per check: uniqueness, null counts, range and
accepted-value violations all fold into a single `agg(...)` whose
partial aggregation is map-side. Referential integrity is the only
multi-table check and runs as a left-anti count (broadcast when the
parent's key set is small, hash join otherwise — Catalyst's choice).

Output is one row per constraint: (table, constraint, violations,
passed) — the shape a scheduler alerts on. Everything is exact
integer counting, so the report carries a full value oracle.

The reference has no equivalent (mydatastack/google-analytics-to-s3
trusts its collector payloads end-to-end; the closest thing is the
required-field normalizer, main.py's `clean_hits` loop) — this is the
missing publish gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _zero() -> Column:
    return F.lit(0).cast("long")


def not_null(col: str) -> tuple[str, Column]:
    """Violations: rows where ``col`` IS NULL."""
    return (
        f"not_null({col})",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("long"),
    )


def unique(col: str) -> tuple[str, Column]:
    """Violations: rows beyond the first per duplicated value
    (count(col) - count(distinct col); NULLs are ignored by both, so a
    NULL never counts as a duplicate — pair with not_null)."""
    return (
        f"unique({col})",
        (F.count(col) - F.countDistinct(col)).cast("long"),
    )


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    """Violations: non-NULL values outside [lo, hi]."""
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        F.sum(
            F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1).otherwise(0)
        ).cast("long"),
    )


def accepted_values(col: str, values: list[str]) -> tuple[str, Column]:
    """Violations: non-NULL values outside the accepted set."""
    c = F.col(col)
    return (
        f"accepted_values({col})",
        F.sum(
            F.when(c.isNotNull() & ~c.isin(values), 1).otherwise(0)
        ).cast("long"),
    )


def check_table(
    df: DataFrame, table: str, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Run single-table constraints in ONE scan: every check is an
    aggregate expression in the same `agg`, then the 1-row wide result
    unpivots to (table, constraint, violations, passed) rows."""
    if not checks:
        raise ValueError("checks must not be empty")
    aggs = [expr.alias(f"_c{i}") for i, (_, expr) in enumerate(checks)]
    wide = df.agg(*aggs)
    pairs = []
    for i, (name, _) in enumerate(checks):
        pairs.append(F.lit(name))
        pairs.append(F.col(f"_c{i}").cast("string"))
    long = wide.select(
        F.explode(
            F.create_map(*pairs)
        ).alias("constraint", "_v")
    )
    return long.select(
        F.lit(table).alias("table"),
        "constraint",
        F.col("_v").cast("long").alias("violations"),
        (F.col("_v").cast("long") == 0).alias("passed"),
    )


def ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    child_table: str,
) -> DataFrame:
    """Violations: non-NULL child foreign keys with no parent row
    (left-anti count). One report row, same schema as check_table."""
    orphans = (
        child.select(F.col(fk))
        .filter(F.col(fk).isNotNull())
        .join(
            parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
        )
    )
    return orphans.agg(F.count("*").cast("long").alias("violations")).select(
        F.lit(child_table).alias("table"),
        F.lit(f"ref_integrity({fk}->{pk})").alias("constraint"),
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def psi_report(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    period_col: str,
    alarm_threshold: float = 0.1,
) -> DataFrame:
    """Population-stability-index drift report — the distribution-shift
    companion to the row-count constraints above: per group, PSI
    between period 0 (reference) and period 1 (current) over a bucketed
    value distribution, PSI = Σ_b (p1_b - p0_b) · ln(p1_b / p0_b).

    ``period_col`` must be 0/1 (reference/current); buckets are the
    caller's discretization (an integer expression — deciles, integer
    div, histogram bins). Laplace-smoothed proportions
    ``(n_b + 1) / (N + B)`` keep empty buckets finite and make every
    proportion an exact rational of BIGINTs — one double division and
    one ln per bucket, the repo's proven ln-round(6) parity pairing.

    Shape: one data-sized hash aggregation to (group, bucket, period)
    grain; the PSI sum and bucket-count window run over the
    groups × buckets table. The alarm compares the UNROUNDED psi so
    both engines branch on the same double.
    """
    counts = df.groupBy(
        F.col(group_col).alias("grp"),
        F.col(bucket_col).alias("bucket"),
    ).agg(
        F.sum(F.when(F.col(period_col) == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col(period_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    wg = Window.partitionBy("grp")
    prop = counts.select(
        "grp", "bucket", "n0", "n1",
        F.sum("n0").over(wg).alias("t0"),
        F.sum("n1").over(wg).alias("t1"),
        F.count(F.lit(1)).over(wg).alias("nb"),
    ).select(
        "grp", "n0", "n1",
        (
            (F.col("n0") + 1).cast("double")
            / (F.col("t0") + F.col("nb")).cast("double")
        ).alias("p0"),
        (
            (F.col("n1") + 1).cast("double")
            / (F.col("t1") + F.col("nb")).cast("double")
        ).alias("p1"),
    )
    psi = prop.groupBy("grp").agg(
        F.sum("n0").cast("long").alias("n_ref"),
        F.sum("n1").cast("long").alias("n_cur"),
        F.sum(
            (F.col("p1") - F.col("p0")) * F.log(F.col("p1") / F.col("p0"))
        ).alias("_psi"),
    )
    return psi.select(
        F.col("grp").alias(group_col), "n_ref", "n_cur",
        F.round("_psi", 6).alias("psi"),
        (F.col("_psi") > F.lit(alarm_threshold)).alias("drift_alarm"),
    )


# first-significant-digit probabilities log10(1 + 1/d), materialized as
# double literals so Spark and any SQL oracle consume the SAME 9
# constants instead of racing libm log implementations
BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829993, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514,
}

# chi-square 95% critical value at 8 dof (9 digits - 1)
BENFORD_CRIT_95 = 15.507313

MAX_BENFORD_DIGITS = 19  # BIGINT width; first digit via power-of-10 floor


def benford_report(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive integer
    amount column vs Benford's law — the fraud/DQ screen for
    financial facts (synthetic or truncated amount feeds flunk it
    loudly).

    One conditional aggregation over the scan (zero joins, zero extra
    passes): the first digit comes from a when-chain over the 19
    possible BIGINT widths (pure integer compares — no float log10,
    whose x == 10^k edge rounding differs across engines), the nine
    observed counts pivot map-side, and chi2 against the tabulated
    ``BENFORD_P`` literals is driver-free arithmetic on the 9-row
    result. Rows with non-positive amounts are counted out loudly in
    ``n_skipped`` rather than silently dropped.

    Output: one row per digit 1..9 (absent digits appear with
    observed = 0): ``(digit, observed, n, expected_p, chi2,
    benford_alarm, n_skipped)`` — chi2/alarm constant across the nine
    rows of the report.
    """
    work = df.select(F.col(amount_col).cast("bigint").alias("_amt"))
    amt = F.col("_amt")
    cases = " ".join(
        f"WHEN _amt >= {10 ** k} THEN _amt div {10 ** k}"
        for k in range(MAX_BENFORD_DIGITS - 1, -1, -1)
    )
    first = F.expr(f"CASE {cases} END")
    agg = work.agg(
        *[
            F.sum(F.when(first == d, 1).otherwise(0)).alias(f"o_{d}")
            for d in range(1, 10)
        ],
        F.sum(F.when((amt <= 0) | amt.isNull(), 1).otherwise(0)).alias(
            "n_skipped"
        ),
    )
    n = sum(F.col(f"o_{d}") for d in range(1, 10)).alias("_n")
    agg = agg.withColumn("_n", n)
    chi2 = sum(
        (F.col(f"o_{d}").cast("double") - F.col("_n") * BENFORD_P[d])
        * (F.col(f"o_{d}").cast("double") - F.col("_n") * BENFORD_P[d])
        / (F.col("_n") * BENFORD_P[d])
        for d in range(1, 10)
    )
    agg = agg.withColumn("_chi2", F.round(chi2, 6))
    rows = F.array(*[
        F.struct(
            F.lit(d).alias("digit"),
            F.col(f"o_{d}").cast("long").alias("observed"),
            F.col("_n").cast("long").alias("n"),
            F.lit(BENFORD_P[d]).alias("expected_p"),
            F.col("_chi2").alias("chi2"),
            (F.col("_chi2") > BENFORD_CRIT_95).alias("benford_alarm"),
            F.col("n_skipped").cast("long").alias("n_skipped"),
        )
        for d in range(1, 10)
    ])
    return agg.select(F.explode(rows).alias("_r")).select("_r.*")


KS_C95 = 1.358  # Kolmogorov critical coefficient at alpha = 0.05


def _finalize_summary(df: DataFrame, pv: DataFrame, result: DataFrame) -> DataFrame:
    """Materialize a 1-row summary plan and release the per-value
    histogram cache — returning the lazy plan would leak one cached
    histogram per invocation across repeated bench passes (the pv
    persist exists so the subtotal job and the final job observe
    identical data; after the final row is collected it is dead)."""
    row = result.first()
    pv.unpersist()
    return df.sparkSession.createDataFrame([row], schema=result.schema)


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    buckets: int = 64,
) -> DataFrame:
    """One materialized row — see :func:`_ks_two_sample_lazy` for the
    algorithm and plan contract."""
    pv, result = _ks_two_sample_lazy(
        df, value_col, group_col, group_a, group_b, buckets
    )
    return _finalize_summary(df, pv, result)


def _ks_two_sample_lazy(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    buckets: int = 64,
) -> "tuple[DataFrame, DataFrame]":
    """Exact two-sample Kolmogorov-Smirnov drift test on an INTEGER
    value column — the distribution-shape companion to the binned PSI
    report (``psi_report`` sees only bucket masses; KS sees the whole
    CDF).

    D = max over observed values of |F_a(v) - F_b(v)| is computed as
    the exact integer |n_b * cum_a(v) - n_a * cum_b(v)| maximized over
    the DISTINCT-value table, with the single division at the end.
    The cumulative counts use the same two-pass bucket-offset pattern
    as ``assign_global_index``: per-value counts (one hash shuffle),
    range-bucket subtotals prefix-summed on the driver (``buckets``
    rows — bounded), then a window partitioned BY BUCKET — never a
    single global sort partition, which is what makes the statistic
    computable at corpus scale. Same deterministic-input contract as
    the indexing module (two jobs observe the input).

    Output: ONE row — ``(n_a, n_b, d_stat, d_at_value, ks_alarm)``
    with ``d_at_value`` the smallest value attaining D and the alarm
    at the classic 95% threshold ``1.358 * sqrt((n_a+n_b)/(n_a*n_b))``.
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    per_value = (
        df.filter(g.isin(group_a, group_b) & v.isNotNull())
        .groupBy(v.alias("_v"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    bounds = per_value.agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi")
    ).first()
    if bounds["lo"] is None:
        raise ValueError(
            f"ks_two_sample: no rows in groups "
            f"{group_a!r}/{group_b!r}"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // buckets + 1)
    # persisted across the subtotal job and the (lazy) final job so
    # both observe identical data — the cached table is the DISTINCT
    # value histogram, orders smaller than the input; evicted LRU
    pv = per_value.withColumn("_bucket", ((F.col("_v") - lo) / width)
                              .cast("long")).persist()
    sub = pv.groupBy("_bucket").agg(
        F.sum("_ca").alias("sa"), F.sum("_cb").alias("sb")
    ).collect()
    offs, acc_a, acc_b = [], 0, 0
    for r in sorted(sub, key=lambda r: r["_bucket"]):
        offs.append((int(r["_bucket"]), acc_a, acc_b))
        acc_a += int(r["sa"])
        acc_b += int(r["sb"])
    n_a, n_b = acc_a, acc_b
    if n_a == 0 or n_b == 0:
        pv.unpersist()
        raise ValueError(
            f"ks_two_sample: empty sample (n_a={n_a}, n_b={n_b})"
        )
    off_df = df.sparkSession.createDataFrame(
        offs, schema="_bucket LONG, _oa LONG, _ob LONG"
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        pv.join(F.broadcast(off_df), "_bucket")
        .select(
            "_v",
            (F.col("_oa") + F.sum("_ca").over(w)).alias("_cuma"),
            (F.col("_ob") + F.sum("_cb").over(w)).alias("_cumb"),
        )
        .select(
            "_v",
            F.abs(
                F.lit(n_b) * F.col("_cuma")
                - F.lit(n_a) * F.col("_cumb")
            ).alias("_dnum"),
        )
    )
    best = cum.agg(
        F.max("_dnum").alias("dnum"),
        F.min_by("_v", F.struct(-F.col("_dnum"), F.col("_v")))
        .alias("d_at_value"),
    )
    import math

    # math.sqrt, not ** 0.5: pow(x, .5) may differ from sqrt by an ulp
    # and the oracle computes sqrt()
    thresh = KS_C95 * math.sqrt((n_a + n_b) / (n_a * n_b))
    result = best.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.round(
            F.col("dnum").cast("double") / (float(n_a) * float(n_b)),
            6,
        ).alias("d_stat"),
        F.col("d_at_value").cast("long").alias("d_at_value"),
        (
            F.col("dnum").cast("double")
            / (float(n_a) * float(n_b))
            > F.lit(thresh)
        ).alias("ks_alarm"),
    )
    return pv, result


def wasserstein_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    buckets: int = 64,
) -> DataFrame:
    """One materialized row — see :func:`_wasserstein_two_sample_lazy`
    for the algorithm and plan contract."""
    pv, result = _wasserstein_two_sample_lazy(
        df, value_col, group_col, group_a, group_b, buckets
    )
    return _finalize_summary(df, pv, result)


def _wasserstein_two_sample_lazy(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    buckets: int = 64,
) -> "tuple[DataFrame, DataFrame]":
    """Exact two-sample Wasserstein-1 (earth-mover) distance on an
    INTEGER value column — the magnitude companion to ``ks_two_sample``
    (KS reports the worst CDF gap; W1 integrates ALL of it, so a
    small-but-everywhere drift that KS under-ranks shows up here).

    W1 = sum over distinct values v of |F_a(v) - F_b(v)| * gap(v),
    gap(v) = next distinct value - v (the CDFs are step functions on
    the integer grid, so this is exact, not quadrature). Computed as
    the integer |n_b*cum_a - n_a*cum_b| * gap with one division at
    the end. Same two-pass bucket-offset pattern as ks_two_sample:
    per-value counts, driver-side prefix of ``buckets`` subtotal rows
    (bounded), window partitioned BY BUCKET — no global sort
    partition at any scale. The cross-bucket gap (last value of
    bucket k to first value of bucket k+1) comes from the subtotal
    pass's per-bucket minima, so no global lead() is needed; the
    global maximum's gap is irrelevant because its CDF difference is
    identically zero.

    Output: ONE row ``(n_a, n_b, w1, w1_normalized)`` with
    ``w1_normalized = w1 / (max_v - min_v)`` (scale-free, in [0,1])."""
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    per_value = (
        df.filter(g.isin(group_a, group_b) & v.isNotNull())
        .groupBy(v.alias("_v"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("_cb"),
        )
    )
    bounds = per_value.agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi")
    ).first()
    if bounds["lo"] is None:
        raise ValueError(
            f"wasserstein_two_sample: no rows in groups "
            f"{group_a!r}/{group_b!r}"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // buckets + 1)
    pv = per_value.withColumn(
        "_bucket", ((F.col("_v") - lo) / width).cast("long")
    ).persist()
    sub = pv.groupBy("_bucket").agg(
        F.sum("_ca").alias("sa"), F.sum("_cb").alias("sb"),
        F.min("_v").alias("mn"),
    ).collect()
    offs, acc_a, acc_b = [], 0, 0
    ordered = sorted(sub, key=lambda r: r["_bucket"])
    for i, r in enumerate(ordered):
        nxt = int(ordered[i + 1]["mn"]) if i + 1 < len(ordered) else None
        offs.append((int(r["_bucket"]), acc_a, acc_b, nxt))
        acc_a += int(r["sa"])
        acc_b += int(r["sb"])
    n_a, n_b = acc_a, acc_b
    if n_a == 0 or n_b == 0:
        pv.unpersist()
        raise ValueError(
            f"wasserstein_two_sample: empty sample "
            f"(n_a={n_a}, n_b={n_b})"
        )
    off_df = df.sparkSession.createDataFrame(
        offs, schema="_bucket LONG, _oa LONG, _ob LONG, _nxt LONG"
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lead_w = Window.partitionBy("_bucket").orderBy("_v")
    contrib = (
        pv.join(F.broadcast(off_df), "_bucket")
        .select(
            "_v",
            (F.col("_oa") + F.sum("_ca").over(w)).alias("_cuma"),
            (F.col("_ob") + F.sum("_cb").over(w)).alias("_cumb"),
            # gap to the next distinct value: in-bucket lead, else the
            # next bucket's first value; the global max gets 0 (its
            # CDF difference is 0 so the term vanishes either way)
            (
                F.coalesce(
                    F.lead("_v").over(lead_w), F.col("_nxt"), F.col("_v")
                ) - F.col("_v")
            ).alias("_gap"),
        )
        .select(
            (
                F.abs(
                    F.lit(n_b) * F.col("_cuma")
                    - F.lit(n_a) * F.col("_cumb")
                ) * F.col("_gap")
            ).alias("_term")
        )
    )
    total = contrib.agg(F.sum("_term").alias("num"))
    span = float(hi - lo) if hi > lo else 1.0
    denom = float(n_a) * float(n_b)
    result = total.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.round(F.col("num").cast("double") / denom, 6).alias("w1"),
        F.round(
            F.col("num").cast("double") / denom / span, 6
        ).alias("w1_normalized"),
    )
    return pv, result
