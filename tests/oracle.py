"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a Spark query DataFrame and an ANSI-SQL oracle over the same
parquet tables, sorts columns by name and rows by value, and compares
cell-by-cell. Mirrors the driver contract: column names must match, so
every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # PRESERVE -0.0 vs 0.0: the grading driver hashes raw cells,
        # so Spark 0.0 vs DuckDB -0.0 is a driver red even though
        # the tuple compare treats them as equal (CORRECTNESS_r07
        # covariance_matrix). Map -0.0 to a distinct sentinel so the
        # local harness catches the class first.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v
    if isinstance(v, (list, tuple, dict, set)):
        # The grading driver's pandas canonicalizer cannot hash
        # non-scalar cells (CORRECTNESS_r06 wav_decode: "unhashable
        # type: 'numpy.ndarray'"). Reject here so local green always
        # implies driver green — queries must array_join/to_json any
        # collection column before returning it.
        raise TypeError(
            f"non-scalar cell {type(v).__name__} violates the driver "
            "canonicalizer contract; serialize it to a string column"
        )
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    """Assert the Spark result and the DuckDB oracle result match."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb_conn(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()

    s_cols2, s_tab = _table(s_cols, s_rows)
    d_cols2, d_tab = _table(d_cols, d_rows)

    assert s_cols2 == d_cols2, f"column mismatch: spark={s_cols2} duckdb={d_cols2}"
    assert len(s_tab) == len(d_tab), (
        f"row count mismatch: spark={len(s_tab)} duckdb={len(d_tab)}"
    )
    mismatches = []
    for i, (a, b) in enumerate(zip(s_tab, d_tab)):
        if a == b:
            continue
        if float_tol and _close(a, b, float_tol):
            continue
        mismatches.append((i, a, b))
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (first {len(mismatches)}): {mismatches}"


def _close(a, b, tol):
    if type(a) is not type(b) and not (
        isinstance(a, (int, float)) and isinstance(b, (int, float))
    ):
        return False
    if isinstance(a, tuple):
        return len(a) == len(b) and all(_close(x, y, tol) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b
