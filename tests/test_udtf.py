"""Spark 4 Python UDTF extension point: the SURVEY 2.8 flatMap role,
pinned row-identical to the native explode path."""

import pytest


ROWS = [
    (1, "SKU-1", "Shoes", "20", "1", "SKU-2", "Socks", "7.99", "2"),
    (2, "SKU-3", "Hat", "12", "1", None, None, None, None),
    (3, None, None, None, None, None, None, None, None),
]
SCHEMA = ("hit_id long, pr0id string, pr0nm string, pr0pr string, "
          "pr0qt string, pr1id string, pr1nm string, pr1pr string, "
          "pr1qt string")


def test_udtf_lateral_matches_flatmap_contract(spark):
    from google_analytics_to_s3_spark.functions.udtf_demo import (
        register_product_slots_udtf,
    )

    register_product_slots_udtf(spark)
    spark.createDataFrame(ROWS, SCHEMA).createOrReplaceTempView("hits")
    got = sorted(map(tuple, spark.sql(
        """SELECT h.hit_id, s.slot, s.sku, s.name, s.price, s.qty
           FROM hits h,
           LATERAL product_slots(h.pr0id, h.pr0nm, h.pr0pr, h.pr0qt,
                                 h.pr1id, h.pr1nm, h.pr1pr,
                                 h.pr1qt) s"""
    ).collect()))
    # the reference flatMap contract: one row per OCCUPIED slot,
    # hit 3 (no products) disappears entirely
    assert got == [
        (1, 0, "SKU-1", "Shoes", "20", "1"),
        (1, 1, "SKU-2", "Socks", "7.99", "2"),
        (2, 0, "SKU-3", "Hat", "12", "1"),
    ]


def test_udtf_matches_native_unpivot_rowset(spark):
    """Same semantics as the production native-explode unpivot on the
    shared slot columns (names differ; the (hit, slot, sku) row SET is
    the contract)."""
    from google_analytics_to_s3_spark.functions.udtf_demo import (
        register_product_slots_udtf,
    )
    from google_analytics_to_s3_spark.operators.unpivot import (
        unpivot_products,
    )

    df = spark.createDataFrame(ROWS, SCHEMA).withColumnRenamed(
        "hit_id", "message_id"
    )
    native = unpivot_products(
        df.selectExpr(
            "message_id",
            "pr0id AS body_pr0id", "pr0nm AS body_pr0nm",
            "pr0pr AS body_pr0pr", "pr0qt AS body_pr0qt",
            "pr1id AS body_pr1id", "pr1nm AS body_pr1nm",
            "pr1pr AS body_pr1pr", "pr1qt AS body_pr1qt",
        )
    )
    # native keeps a null-product row for product-less hits (the J1
    # left-outer semantics); the flatMap/UDTF contract drops them —
    # compare on the occupied-slot row set
    native_set = {
        (r["message_id"], r["prid"])
        for r in native.collect() if r["prid"] is not None
    }
    register_product_slots_udtf(spark)
    df.createOrReplaceTempView("hits2")
    udtf_set = {
        (r.message_id, r.sku)
        for r in spark.sql(
            """SELECT h.message_id, s.sku
               FROM hits2 h,
               LATERAL product_slots(h.pr0id, h.pr0nm, h.pr0pr, h.pr0qt,
                                     h.pr1id, h.pr1nm, h.pr1pr,
                                     h.pr1qt) s"""
        ).collect()
    }
    assert udtf_set == native_set == {
        (1, "SKU-1"), (1, "SKU-2"), (2, "SKU-3")
    }
