"""Spark 4 Python UDTF demonstration: the wide->long product unpivot
(SURVEY 2.8) expressed as a user-defined TABLE function.

The reference implements its only table-generating operation as an RDD
``flatMap`` (reference functions/sessionization/main.py, the product
slot fan-out); SURVEY 2.11 records "No UDTF — the RDD flatMap plays
that role". Spark 4's Python UDTF is the MODERN extension point that
role maps onto — this module registers one and the test suite pins it
row-identical to the production path (operators/unpivot.py's native
explode), completing the Spark-4 extension-point inventory next to
the Python Data Source (sources/pydatasource.py), VARIANT, and the
Observation API.

The production engine still uses the NATIVE carry-through explode —
UDTFs are row-at-a-time Python (the slow path; the demo exists for
surface parity, exactly like the UDF-compatibility modules kept for
byte-level golden tests).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

N_SLOTS = 2  # demo grain; the native path handles any slot count


@udtf(returnType="slot int, sku string, name string, price string, "
                 "qty string")
class ProductSlotsUDTF:
    """Fan one hit's enhanced-ecommerce product slots out to rows —
    one row per occupied slot, empty slots skipped (the reference's
    flatMap contract)."""

    def eval(self, pr0id, pr0nm, pr0pr, pr0qt,
             pr1id, pr1nm, pr1pr, pr1qt):  # noqa: D102
        slots = (
            (pr0id, pr0nm, pr0pr, pr0qt),
            (pr1id, pr1nm, pr1pr, pr1qt),
        )
        for i, (sku, name, price, qty) in enumerate(slots):
            if sku is not None:
                yield i, sku, name, price, qty


def register_product_slots_udtf(spark) -> None:
    """Register as SQL table function ``product_slots`` for LATERAL
    use: ``SELECT h.hit_id, s.* FROM hits h,
    LATERAL product_slots(h.pr0id, ...) s``."""
    spark.udtf.register("product_slots", ProductSlotsUDTF)
