"""Distributed exact covariance / correlation of a vector column, and
PCA on top of it.

The scale pattern is the textbook one for tall-skinny X (n rows,
d dims, n >> d): each partition computes its LOCAL Gram matrix
``G_p = X_p^T X_p`` plus the column sums with one Arrow batch pass
(``mapInPandas`` + numpy — d*d work per row batch, zero Python
per-row overhead), emits it long-form (d*(d+1)/2 + d + 1 tiny rows),
and ONE aggregation sums the partials. Nothing bigger than
d*(d+1)/2 * n_partitions rows ever shuffles; the n-row input is read
exactly once. Eigen-decomposition of the resulting d x d matrix is
driver-side numpy — bounded by d, not n (same bounded-collect
contract as the IVF centroids in ``operators/similarity.py``).

Exactness contract (what lets a SQL oracle reproduce float sums
bit-for-bit): values are quantized to an integer grid
``q = sign(v) * floor(|v| * scale + 0.5)`` — explicit round-half-away
written the same way in numpy and in the oracle SQL, so both engines
run identical double ops — and all sums are integer (accumulated as
DECIMAL(38,0) in Spark / HUGEINT in DuckDB; the local int64 partials
are safe while ``rows_per_partition * (max|v|*scale)^2 < 2^63``,
which a 100 TB deployment tunes with ``scale``). The final
covariance/correlation is one exact-integer expression divided out
in double and rounded.

cov[i,j]  = (n*S_ij - S_i*S_j) / (n^2 * scale^2)
corr[i,j] = (n*S_ij - S_i*S_j)
            / sqrt((n*S_ii - S_i^2) * (n*S_jj - S_j^2))
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantized_gram", "covariance_matrix", "pca_power_iteration"]


def quantized_gram(
    df: DataFrame, vec_col: str, dim: int, scale: int = 1000
) -> DataFrame:
    """Long-form exact Gram of the quantized vector column.

    Returns one row per (i, j), i <= j < dim: ``(i, j, s)`` with
    ``s = sum_rows(q_i * q_j)`` as DECIMAL(38,0), plus the moment rows
    ``(i, -1, sum q_i)`` and ``(-1, -1, n)``. Rows with a NULL or
    wrong-length vector are rejected loudly (they would silently bias
    every covariance).
    """
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            vecs = pdf[vec_col].to_list()
            for v in vecs:
                if v is None or len(v) != dim:
                    raise ValueError(
                        f"{vec_col}: expected dense length-{dim} vector, "
                        f"got {None if v is None else len(v)}"
                    )
            x = np.asarray(vecs, dtype=np.float64)
            if x.size == 0:
                continue
            q = (np.sign(x) * np.floor(np.abs(x) * scale + 0.5)).astype(
                np.int64
            )
            gram += q.T @ q
            sums += q.sum(axis=0)
            n += q.shape[0]
        out_i = np.concatenate([iu[0], np.arange(dim), [-1]])
        out_j = np.concatenate([iu[1], np.full(dim, -1), [-1]])
        out_s = np.concatenate([gram[iu], sums, [n]])
        yield pd.DataFrame({"i": out_i, "j": out_j, "s": out_s})

    partials = df.select(vec_col).mapInPandas(
        _partial, schema="i int, j int, s long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )


def covariance_matrix(
    df: DataFrame, vec_col: str, dim: int, scale: int = 1000
) -> DataFrame:
    """Exact covariance + Pearson correlation per (i, j), i <= j.

    Output: ``(i, j, cov, corr)`` — d*(d+1)/2 rows, cov/corr rounded
    to 6 decimals; ``corr`` NULL for a zero-variance dimension.

    ONE fully-lazy plan, ZERO driver jobs at build (r13 opt — the old
    shape collected the d+1 moment rows, eagerly checkpointed the
    pair table, and collected the d diagonal rows: three jobs per
    call). The moment/diagonal tables are broadcast-joined back onto
    the pair table instead — every side is bounded by d*(d+1)/2 rows,
    never by input rows — and the single Gram aggregation subtree is
    shared by all consumers via runtime exchange reuse, so the n-row
    input is still read exactly once per execution. The integer
    arithmetic (DECIMAL(38,0)) and the final double expressions are
    operation-for-operation identical to the old driver-side path.
    An empty input raises from inside the plan at execution time."""
    g = quantized_gram(df, vec_col, dim, scale)
    n1 = g.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.when(
            F.col("s") == 0,
            F.raise_error(
                F.lit("covariance of an empty vector column")
            ).cast("decimal(38,0)"),
        ).otherwise(F.col("s")).alias("_n")
    )
    sums = g.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        F.col("i").alias("_k"), F.col("s").alias("_sum")
    )
    diag = g.filter((F.col("j") >= 0) & (F.col("i") == F.col("j"))).select(
        F.col("i").alias("_k"), F.col("s").alias("_diag")
    )
    # var_num[k] = n * S_kk - S_k^2, exact in DECIMAL(38,0) — the same
    # integers the old path computed in Python
    var_df = (
        sums.join(diag, "_k")
        .crossJoin(F.broadcast(n1))
        .select(
            "_k",
            "_sum",
            (F.col("_n") * F.col("_diag")
             - F.col("_sum") * F.col("_sum")).alias("_var"),
        )
    )
    pairs = g.filter(F.col("j") >= 0)
    joined = (
        pairs.crossJoin(F.broadcast(n1))
        .join(
            F.broadcast(var_df.select(
                F.col("_k").alias("_ki"),
                F.col("_sum").alias("_si"),
                F.col("_var").alias("_vi"),
            )),
            F.col("i") == F.col("_ki"),
        )
        .join(
            F.broadcast(var_df.select(
                F.col("_k").alias("_kj"),
                F.col("_sum").alias("_sj"),
                F.col("_var").alias("_vj"),
            )),
            F.col("j") == F.col("_kj"),
        )
    )
    # exact integer numerator; the only doubles are the final
    # divisions (identical expressions in the oracle)
    num = F.col("_n") * F.col("s") - F.col("_si") * F.col("_sj")
    den_cov = (
        F.col("_n").cast("double") * F.col("_n").cast("double")
        * F.lit(float(scale)) * F.lit(float(scale))
    )
    vi, vj = F.col("_vi"), F.col("_vj")
    return joined.select(
        "i",
        "j",
        F.round(num.cast("double") / den_cov, 6).alias("cov"),
        F.round(
            F.when(
                (vi > 0) & (vj > 0),
                num.cast("double")
                / F.sqrt(vi.cast("double") * vj.cast("double")),
            ),
            6,
        ).alias("corr"),
    )


def pca_power_iteration(
    cov: "list[list[float]]", k: int, iters: int = 200
) -> tuple:
    """Top-k eigenpairs of a small (driver-side) covariance matrix by
    deterministic power iteration with Hotelling deflation.

    Input is the d x d matrix (d bounded — the distributed part
    already reduced n rows to d*(d+1)/2 numbers); start vector is the
    fixed e_argmax(diag) + 1e-3 ramp, so the result is reproducible
    run-to-run with no RNG. Returns ``(eigvals, eigvecs)`` with
    eigvecs[:, m] the m-th component, sign-fixed so the
    largest-magnitude entry is positive."""
    import numpy as np

    a = np.asarray(cov, dtype=np.float64)
    d = a.shape[0]
    if a.shape != (d, d) or k < 1 or k > d:
        raise ValueError(f"bad shapes: cov {a.shape}, k={k}")
    work = a.copy()
    vals = []
    vecs = []
    for _ in range(k):
        v = np.full(d, 1e-3)
        v[int(np.argmax(np.diag(work)))] = 1.0
        v /= np.linalg.norm(v)
        for _ in range(iters):
            w = work @ v
            nw = np.linalg.norm(w)
            if nw == 0.0:
                break
            v = w / nw
        lam = float(v @ work @ v)
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        vals.append(lam)
        vecs.append(v)
        work = work - lam * np.outer(v, v)
    return np.array(vals), np.stack(vecs, axis=1)


def ols_closed_form(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_cols: "list[str] | tuple[str, ...]" = (),
) -> DataFrame:
    """Distributed ordinary-least-squares fit of an INTEGER response on
    two INTEGER regressors plus an intercept — exact normal equations.

    The whole regression reduces to ten sufficient statistics
    (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y, Σy²) gathered in
    ONE hash aggregation with map-side combine — the textbook
    scale-flat shape (the n-row table is scanned once; everything
    after is arithmetic on one row). Because inputs are integers, the
    sums are exact DECIMAL(38,0) and the 3x3 normal system
    ``A beta = b`` is solved in closed form by Cramer's rule with the
    determinants still in exact integer arithmetic — only the final
    beta divisions and R² happen in double (fixed order, round 6), so
    a SQL oracle on HUGEINT replays the fit bit-for-bit.

    Overflow contract: Cramer determinants multiply three sums, so
    they need ``(max sum)^3 < 10^38`` — callers at extreme scale
    rescale the regressors (the covariance-matrix ``scale`` contract).
    For d > 2 use :func:`quantized_gram` + a driver-side bounded
    solve; this closed form exists because d=2 covers the
    slope/seasonality regressions marts actually run, with a full
    value oracle.

    Output (one row per group, or one row total): group...,
    n, beta0 (intercept), beta1, beta2, r2. With ``group_cols`` the
    same single aggregation runs at group grain — thousands of
    per-segment regressions for the price of one shuffle.
    """
    gcols = list(group_cols)
    d0 = F.lit(0).cast("decimal(38,0)")

    def dec(c) -> Column:
        return c.cast("decimal(38,0)")

    y, x1, x2 = F.col(y_col), F.col(x1_col), F.col(x2_col)
    s = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(dec(x1)).alias("s1"),
        F.sum(dec(x2)).alias("s2"),
        F.sum(dec(y)).alias("sy"),
        F.sum(dec(x1) * dec(x1)).alias("s11"),
        F.sum(dec(x1) * dec(x2)).alias("s12"),
        F.sum(dec(x2) * dec(x2)).alias("s22"),
        F.sum(dec(x1) * dec(y)).alias("s1y"),
        F.sum(dec(x2) * dec(y)).alias("s2y"),
        F.sum(dec(y) * dec(y)).alias("syy"),
    ).select(*gcols, dec(F.col("_cnt")).alias("n"), *[
        F.coalesce(F.col(c), d0).alias(c)
        for c in ("s1", "s2", "sy", "s11", "s12", "s22",
                  "s1y", "s2y", "syy")
    ])

    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sy, s11, s12 = F.col("sy"), F.col("s11"), F.col("s12")
    s22, s1y, s2y, syy = (
        F.col("s22"), F.col("s1y"), F.col("s2y"), F.col("syy")
    )

    def det3(a, b, c, d, e, f, g, h, i) -> Column:
        # row-major 3x3 determinant, kept in DECIMAL(38,0)
        return (
            a * (e * i - f * h)
            - b * (d * i - f * g)
            + c * (d * h - e * g)
        )

    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)

    b0 = det0.cast("double") / det.cast("double")
    b1 = det1.cast("double") / det.cast("double")
    b2 = det2.cast("double") / det.cast("double")
    # SSE = Σy² - b0Σy - b1Σx1y - b2Σx2y ; SST = Σy² - (Σy)²/n —
    # unrounded betas, one fixed expression order in both engines.
    sse = (
        syy.cast("double") - b0 * sy.cast("double")
        - b1 * s1y.cast("double") - b2 * s2y.cast("double")
    )
    sst = (
        syy.cast("double")
        - sy.cast("double") * sy.cast("double") / n.cast("double")
    )
    ok = det != d0
    return s.select(
        *gcols,
        n.cast("long").alias("n"),
        F.round(F.when(ok, b0), 6).alias("beta0"),
        F.round(F.when(ok, b1), 6).alias("beta1"),
        F.round(F.when(ok, b2), 6).alias("beta2"),
        F.round(
            F.when(ok & (sst != F.lit(0.0)), F.lit(1.0) - sse / sst), 6
        ).alias("r2"),
    )
