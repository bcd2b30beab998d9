"""Wide→long enhanced-ecommerce unpivot (SURVEY.md §2.8).

The reference implements this as ``flatten_pr_data`` (reference
functions/sessionization/main.py:757-806): an RDD ``flatMap`` building
one Row per (hit, product index), a null filter, ``.toDF``, and a
left-outer join back to the hit table on ``message_id`` (J1) — two
Python ser/de boundaries plus an avoidable shuffle join.

Here: one Catalyst expression — build the array of product structs,
``filter`` out all-null slots, ``explode_outer`` — which fans each hit
out to its products *in place*, carrying every other column through.
No Python workers, no join, no shuffle; at 100 TB this is pure map-side
work pipelined into the scan.

Note the reference unpivots only 7 of 8 tracked params — ``br`` (brand)
is declared in the schema but never unpivoted (main.py:769-789); we
reproduce that (param list = ECOM_UNPIVOT_PARAMS).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ECOM_UNPIVOT_PARAMS, N_PRODUCT_SLOTS


def unpivot_products(
    df: DataFrame,
    n_slots: int = N_PRODUCT_SLOTS,
    params: list[str] | None = None,
    keep_index: bool = False,
) -> DataFrame:
    """Explode ``body_pr{i}{param}`` wide columns into long ``pr{param}``
    columns, one output row per (hit, populated product slot); hits with
    no products keep a single row with null product columns (the
    left-outer-join semantics of J1, main.py:802-803).

    Missing slot columns (the reference backfills them at
    main.py:768-789) are treated as absent slots.
    """
    params = params or ECOM_UNPIVOT_PARAMS
    cols = set(df.columns)

    def slot_struct(i: int):
        fields = []
        if keep_index:
            fields.append(F.lit(i).alias("pr_index"))
        for p in params:
            name = f"body_pr{i}{p}"
            src = F.col(name) if name in cols else F.lit(None).cast("string")
            fields.append(src.alias(f"pr{p}"))
        return F.struct(*fields)

    arr = F.array(*[slot_struct(i) for i in range(n_slots)])
    populated = F.filter(
        arr,
        lambda s: reduce(or_, [s[f"pr{p}"].isNotNull() for p in params]),
    )
    wide_cols = [
        c for c in df.columns
        if not (c.startswith("body_pr") and c[7:8].isdigit())
    ]
    out = df.withColumn("_product", F.explode_outer(populated))
    return out.select(*wide_cols, "_product.*")
