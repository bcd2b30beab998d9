"""GA enum mappings as native column expressions.

Replaces the reference's row-at-a-time Python UDFs F1 (``hits_type``,
functions/sessionization/main.py:379-404) and F11 (``action_type``,
main.py:722-750) with Catalyst ``when`` chains — whole-stage-codegen
friendly, no Python worker round trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference main.py:379-404.
HIT_TYPE_MAP = {
    "pageview": "PAGE",
    "screenview": "APPVIEW",
    "event": "EVENT",
    "transaction": "TRANSACTION",
    "item": "ITEM",
    "social": "SOCIAL",
    "exception": "EXCEPTION",
    "timing": "TIMING",
}

# Reference main.py:734-750 (the dict at 724-732 is dead code; the
# function hardcodes these).
ACTION_TYPE_MAP = {
    "click": "1",
    "detail": "2",
    "add": "3",
    "checkout": "5",
    "purchase": "6",
    "refund": "7",
    "checkout_option": "8",
}


def map_enum(col: Column | str, mapping: dict[str, str], default: str) -> Column:
    """Chained-when enum mapping (stays in codegen, CSE-able)."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        branch = F.when(c == k, F.lit(v))
        expr = branch if expr is None else expr.when(c == k, F.lit(v))
    assert expr is not None
    return expr.otherwise(F.lit(default))


def hits_type(col: Column | str = "body_t") -> Column:
    """F1: GA hit type → GA360 enum; unknown → UNKNOWN."""
    return map_enum(col, HIT_TYPE_MAP, "UNKNOWN")


def action_type(col: Column | str = "body_pa") -> Column:
    """F11: product action → GA ecommerce action code; unknown → '0'."""
    return map_enum(col, ACTION_TYPE_MAP, "0")


def product_revenue(
    action_col: Column | str = "action_type",
    qty_col: Column | str = "prqt",
    price_col: Column | str = "prpr",
) -> Column:
    """F12 (reference main.py:811-817): qty*price on purchase actions, typed."""
    a = F.col(action_col) if isinstance(action_col, str) else action_col
    q = F.col(qty_col) if isinstance(qty_col, str) else qty_col
    p = F.col(price_col) if isinstance(price_col, str) else price_col
    return F.when(a == "6", q.cast("double") * p.cast("double"))
