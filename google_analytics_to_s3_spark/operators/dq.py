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

from pyspark.sql import Column, DataFrame
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
