"""Time-series monitoring operators: robust (median/MAD) anomaly
flags and exact CUSUM single-changepoint localization.

The monitoring layer the reference runs operationally as a freshness
alarm (collector-ga.yaml CloudWatch metric wiring) generalized to the
statistical checks an ingest pipeline actually needs. Both operators
work over PRE-AGGREGATED series (per-key daily counts, daily revenue)
— the data-sized shuffle is the aggregation the caller already did;
everything here moves only series-sized tables.

Scale contracts:
  - :func:`mad_anomaly_flags`: two exact sort-based percentiles per
    group plus two broadcast joins of group-sized stats tables (one
    row per group — event types × 7 at most); the series itself never
    re-shuffles beyond the two stats groupBys.
  - :func:`cusum_changepoint`: the global-order window runs over the
    aggregated series whose cardinality is the number of periods (days),
    bounded at any SF — the same single-sort-partition contract as
    forecast_revenue. The three scalar lookups (totals, max |S|,
    argmax) are 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mad_anomaly_flags(
    series: DataFrame,
    group_cols: list[str],
    value_col: str = "n",
    threshold: float = 2.0,
) -> DataFrame:
    """Median/MAD outlier flags for ``value_col`` within each group.

    Returns ``series`` plus ``med``, ``adev``, ``mad`` and
    ``is_anomaly`` (|value - med| > threshold * MAD). Percentiles are
    exact (sort-based ``F.percentile``), so integer inputs yield exact
    interpolated halves — engine-identical with DuckDB's
    ``quantile_cont`` (the repo's proven percentile-parity pairing).
    """
    med = series.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("med")
    )
    dev = series.join(F.broadcast(med), group_cols).withColumn(
        "adev", F.abs(F.col(value_col).cast("double") - F.col("med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad")
    )
    return dev.join(F.broadcast(mad), group_cols).withColumn(
        "is_anomaly", F.col("adev") > F.lit(threshold) * F.col("mad")
    )


def cusum_changepoint(
    series: DataFrame, order_col: str, value_col: str
) -> DataFrame:
    """Single-changepoint localization via the classic CUSUM statistic
    S_d = Σ_{≤d}(y - μ), kept EXACT by scaling with the period count
    (S'_d = n·cumsum(y) - d·total, all BIGINT — no float mean ever
    enters); the changepoint estimate is argmax |S'| (earliest period
    on ties).

    ``value_col`` must be integral (cents, counts). Returns the series
    plus ``cusum_scaled`` and ``is_changepoint``.
    """
    tot = series.agg(
        F.sum(value_col).cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nd"),
    )
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = series.crossJoin(F.broadcast(tot)).select(
        order_col, value_col,
        (
            F.col("_nd") * F.sum(value_col).over(w)
            - F.row_number().over(Window.orderBy(order_col))
            * F.col("_total")
        ).cast("long").alias("cusum_scaled"),
    )
    mx = cum.agg(
        F.max(F.abs(F.col("cusum_scaled"))).cast("long").alias("_mx")
    )
    cp = cum.crossJoin(F.broadcast(mx)).filter(
        F.abs(F.col("cusum_scaled")) == F.col("_mx")
    ).agg(F.min(order_col).cast("long").alias("_cp"))
    return cum.crossJoin(F.broadcast(cp)).select(
        order_col, value_col, "cusum_scaled",
        (F.col(order_col) == F.col("_cp")).alias("is_changepoint"),
    )


def acf(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_lag: int,
) -> DataFrame:
    """Exact autocorrelation function of a pre-aggregated integer
    series at lags ``1..max_lag`` — the seasonality detector that
    tells the monitoring layer WHICH period (weekly? daily?) the
    mad/CUSUM checks should condition on.

    ``series`` is one row per period with an INTEGER ``value_col``
    (cents-grain, the repo's order-independent sum contract); rows
    need not be contiguous — lag pairing is positional over the
    ``time_col`` order, the standard ACF-on-observed-points reading.

    Exactness: with S = sum x, n = rows, H_k/T_k the overlap head/
    tail sums, everything is the n^2-scaled integer algebra

        n^2 * num_k = n^2 * sum(x_t * x_{t+k})
                      - n * S * (H_k + T_k) + (n - k) * S^2
        n^2 * den   = n^2 * sum(x^2) - n * S^2
        acf_k       = num_k / den      (ONE double division, round 6)

    accumulated as DECIMAL(38,0) (HUGEINT-class — n * x^2 * n^2
    overflows int64 on real revenue series). The global-order window
    runs over the aggregated series whose cardinality is the period
    count — the same bounded single-sort-partition contract as
    :func:`cusum_changepoint`.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    w = Window.orderBy(time_col)
    dec = F.col(value_col).cast("decimal(38,0)")
    base = series.select(
        F.col(time_col).alias("_t"),
        dec.alias("_x"),
        *[
            F.lead(dec, k).over(w).alias(f"_x{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("s"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
    ]
    for k in range(1, max_lag + 1):
        xk = F.col(f"_x{k}")
        aggs += [
            F.sum(F.col("_x") * xk).alias(f"cross_{k}"),
            F.sum(F.when(xk.isNotNull(), F.col("_x"))).alias(f"head_{k}"),
            F.sum(xk).alias(f"tail_{k}"),
        ]
    g = base.agg(*aggs)
    n = F.col("n").cast("decimal(38,0)")
    s = F.col("s")
    den = (n * n * F.col("sxx") - n * s * s).cast("double")
    lags = []
    for k in range(1, max_lag + 1):
        num = (
            n * n * F.col(f"cross_{k}")
            - n * s * (F.col(f"head_{k}") + F.col(f"tail_{k}"))
            + (n - F.lit(k)) * s * s
        ).cast("double")
        lags.append(
            F.struct(
                F.lit(k).alias("lag"),
                F.round(
                    F.when(den > 0, num / den), 6
                ).alias("acf"),
                (F.col("n") - k).cast("long").alias("n_pairs"),
            )
        )
    return (
        g.select(F.explode(F.array(*lags)).alias("_l"))
        .select("_l.lag", "_l.acf", "_l.n_pairs")
        .filter(F.col("n_pairs") > 0)
    )


def holt_forecast(
    series: DataFrame,
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 7,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing over a pre-aggregated
    period series: one-step-ahead fits for every observed period plus
    an ``horizon``-step forecast — the first true forecaster in the
    monitoring stack (mad/CUSUM/seasonal flag the past; this projects
    forward).

    The recursion

        s_t = alpha * x_t + (1 - alpha) * (s_{t-1} + b_{t-1})
        b_t = beta * (s_t - s_{t-1}) + (1 - beta) * b_{t-1}

    is inherently sequential, so it runs on the DRIVER over the
    collected period series — the same bounded-pull contract as the
    Markov transition matrix (``operators/markov.py``): the input is
    period-grain (days), bounded at any data size; the distributed
    work is the aggregation that produced it. Initialization:
    ``s_1 = x_1``, ``b_1 = x_2 - x_1`` (the textbook choice).
    ``(1 - alpha)`` is computed, never a pre-folded literal, so a SQL
    replay spelling ``(1 - 0.3)`` reproduces the doubles bit-for-bit.

    Output: one row per period from the second onward
    ``(time, kind='fit', actual, predicted)`` with the one-step-ahead
    prediction ``s_{t-1} + b_{t-1}``, then ``horizon`` rows
    ``(last_time + h, kind='forecast', actual=NULL,
    s_n + h * b_n)``; ``predicted`` rounded to 6 decimals. Needs >= 2
    periods."""
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    rows = sorted(
        ((int(r[time_col]), int(r[value_col]))
         for r in series.select(time_col, value_col).collect()),
    )
    if len(rows) < 2:
        raise ValueError(
            f"holt_forecast needs >= 2 periods, got {len(rows)}"
        )
    s = float(rows[0][1])
    b = float(rows[1][1]) - float(rows[0][1])
    out = []
    for t, x in rows[1:]:
        pred = s + b
        s_new = alpha * float(x) + (1 - alpha) * (s + b)
        b = beta * (s_new - s) + (1 - beta) * b
        s = s_new
        out.append((t, "fit", x, round(pred, 6)))
    last_t = rows[-1][0]
    for h in range(1, horizon + 1):
        out.append((last_t + h, "forecast", None, round(s + h * b, 6)))
    return series.sparkSession.createDataFrame(
        out,
        schema=f"{time_col} long, kind string, actual long, "
               "predicted double",
    )


def holt_winters_forecast(
    series: DataFrame,
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    season: int = 7,
    horizon: int = 7,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) — the
    seasonal upgrade of :func:`holt_forecast` for series where a
    Monday is structurally unlike a Sunday (every traffic series).

    Textbook init over the first two seasons (needs >= 2*season
    periods): ``s = mean(season 1)``, ``b = (mean(season 2) -
    mean(season 1)) / season``, ``c_i = x_i - s``. Then for each later
    period::

        pred_t = s + b + c[t-season]
        s_t    = alpha * (x_t - c[t-season]) + (1 - alpha) * (s + b)
        b_t    = beta * (s_t - s) + (1 - beta) * b
        c_t    = gamma * (x_t - s_t) + (1 - gamma) * c[t-season]

    Seasonal alignment is POSITIONAL (row rank in time order), so the
    caller supplies a gapless period series (gap-fill first if
    needed). The recursion runs on the DRIVER over the collected
    period series — the bounded-pull contract of ``holt_forecast`` /
    the Markov matrix; smoothing factors enter as ``(1 - alpha)``
    expressions, never pre-folded, so a SQL recursive CTE carrying the
    season as a list column replays every double bit-for-bit.

    Output: ``(time, kind='fit', actual, predicted)`` for periods
    after the two init seasons, then ``horizon <= season`` forecast
    rows ``(last_time + h, 'forecast', NULL, s + h*b + c[h])``.
    """
    if not (0 < horizon <= season):
        raise ValueError(
            f"horizon must be in [1, season], got {horizon}"
        )
    rows = sorted(
        (int(r[time_col]), int(r[value_col]))
        for r in series.select(time_col, value_col).collect()
    )
    if len(rows) < 2 * season:
        raise ValueError(
            f"holt_winters needs >= {2 * season} periods, got {len(rows)}"
        )
    xs = [float(x) for _, x in rows]
    s = sum(xs[0:season]) / float(season)
    b = (sum(xs[season:2 * season]) / float(season) - s) / float(season)
    cs = [xs[i] - s for i in range(season)]
    out = []
    for i in range(season, len(rows)):
        t, x = rows[i][0], xs[i]
        c_old = cs[0]
        pred = s + b + c_old
        s_new = alpha * (x - c_old) + (1 - alpha) * (s + b)
        b = beta * (s_new - s) + (1 - beta) * b
        c_new = gamma * (x - s_new) + (1 - gamma) * c_old
        s = s_new
        cs = cs[1:] + [c_new]
        if i >= 2 * season:
            out.append((t, "fit", rows[i][1], round(pred, 6)))
        elif i >= season:
            # warm-up season: state advances, fits not reported (the
            # init seasons parameterized them)
            pass
    last_t = rows[-1][0]
    for h in range(1, horizon + 1):
        out.append(
            (last_t + h, "forecast", None,
             round(s + h * b + cs[h - 1], 6))
        )
    return series.sparkSession.createDataFrame(
        out,
        schema=f"{time_col} long, kind string, actual long, "
               "predicted double",
    )


def theil_sen_trend(
    series: DataFrame,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Theil-Sen robust trend of a pre-aggregated period series: the
    MEDIAN of all pairwise slopes ``(x_j - x_i) / (t_j - t_i)`` —
    breakdown point 29%, the estimator that shrugs off the outlier
    days that wreck OLS trend lines.

    Bounded-series contract (CUSUM/ACF): the input is period grain, so
    the pair table is ~n²/2 rows of a BOUNDED n (30 days -> 435
    pairs); the self-join is an equi-join on a constant key with the
    small side broadcast (never a BNLJ), and the median window runs
    over the pair table. Median = average of the two middle values in
    ``(slope, t_i, t_j)`` order (exact doubles, same divisions both
    engines). Intercept = median of ``x_i - slope * t_i`` over the n
    points. Output one row: ``(n_points, n_pairs, slope, intercept)``
    (round 6).
    """
    pts = series.select(
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_x"),
        F.lit(1).alias("_k"),
    )
    a, bb = pts.alias("a"), pts.alias("b")
    pairs = (
        a.join(F.broadcast(bb), "_k")
        .filter(F.col("a._t") < F.col("b._t"))
        .select(
            F.col("a._t").alias("ti"), F.col("b._t").alias("tj"),
            (
                (F.col("b._x") - F.col("a._x")).cast("double")
                / (F.col("b._t") - F.col("a._t")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.orderBy("slope", "ti", "tj")
    ranked = pairs.select(
        "slope", F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ).alias("_np"),
    )
    # odd n: the single middle rank satisfies 2rn == n+1; even n: the
    # two middles satisfy 2rn == n and 2rn == n+2; avg = sum/count
    med_slope = ranked.filter(
        (F.col("_rn") * 2 == F.col("_np"))
        | (F.col("_rn") * 2 == F.col("_np") + 1)
        | (F.col("_rn") * 2 == F.col("_np") + 2)
    ).agg(
        (F.sum("slope") / F.count(F.lit(1))).alias("slope"),
        F.max("_np").alias("n_pairs"),
    )
    resid = pts.crossJoin(F.broadcast(med_slope)).select(
        (F.col("_x").cast("double")
         - F.col("slope") * F.col("_t").cast("double")).alias("r"),
        "_t", "slope", "n_pairs",
    )
    w2 = Window.orderBy("r", "_t")
    ranked2 = resid.select(
        "r", "slope", "n_pairs",
        F.row_number().over(w2).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ).alias("_n"),
    )
    return ranked2.filter(
        (F.col("_rn") * 2 == F.col("_n"))
        | (F.col("_rn") * 2 == F.col("_n") + 1)
        | (F.col("_rn") * 2 == F.col("_n") + 2)
    ).agg(
        F.max("_n").cast("long").alias("n_points"),
        F.max("n_pairs").cast("long").alias("n_pairs"),
        F.round(F.max("slope"), 6).alias("slope"),
        F.round(
            F.sum("r") / F.count(F.lit(1)), 6
        ).alias("intercept"),
    )


def burst_windows(
    series: DataFrame,
    group_col: str,
    t_col: str,
    count_col: str,
    sigma: float = 2.0,
) -> DataFrame:
    """Burst detection over a PRE-AGGREGATED per-period count series
    (the practical two-state reading of Kleinberg's burst model: a
    period is "bursting" when its rate exceeds the group's baseline
    by ``sigma`` population standard deviations; consecutive bursting
    periods merge into one burst window). Input grain is
    (group, period) — the caller already did the event-sized
    aggregation, so every window here moves only series-sized tables
    (|groups| x |periods| rows, bounded at any SF; the same contract
    as cusum_changepoint).

    The run-merge uses the gaps-and-islands key
    ``t - row_number(t)`` over flagged periods only, partitioned by
    group — no global sort. Contract: (group, period) rows are UNIQUE
    and ``t_col`` is an integer period grid (consecutive periods
    differ by exactly 1), otherwise the island key fragments runs.
    Output: one row per burst, ``(group, burst_start, burst_end,
    n_periods, total_events, peak_t, peak_count, baseline_mean)``."""
    stats = series.groupBy(group_col).agg(
        F.avg(F.col(count_col).cast("double")).alias("_mu"),
        F.stddev_pop(F.col(count_col).cast("double")).alias("_sd"),
    )
    flagged = (
        series.join(F.broadcast(stats), group_col)
        .filter(
            # sd > 0 guard: a zero-variance series satisfies
            # cnt >= mu + sigma*0 on EVERY period, which would merge
            # the whole series into one vacuous "burst"
            (F.col("_sd") > 0.0)
            & (
                F.col(count_col).cast("double")
                >= F.col("_mu") + sigma * F.col("_sd")
            )
        )
    )
    rank_w = Window.partitionBy(group_col).orderBy(t_col)
    runs = flagged.withColumn(
        "_island", F.col(t_col) - F.row_number().over(rank_w)
    )
    return (
        runs.groupBy(group_col, "_island")
        .agg(
            F.min(t_col).alias("burst_start"),
            F.max(t_col).alias("burst_end"),
            F.count(F.lit(1)).cast("long").alias("n_periods"),
            F.sum(count_col).cast("long").alias("total_events"),
            F.max_by(t_col, F.struct(F.col(count_col), -F.col(t_col)))
            .alias("peak_t"),
            F.max(count_col).cast("long").alias("peak_count"),
            F.round(F.first("_mu"), 6).alias("baseline_mean"),
        )
        .drop("_island")
    )
