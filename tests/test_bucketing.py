"""Bucketed co-located joins: the shuffle-elimination strategy for
repeated big-big joins at 100 TB (SURVEY §4.3 / brief: 'bucketing for
co-located joins'). Both sides bucketed on the join key -> Catalyst
plans a SortMergeJoin with ZERO Exchange."""

import re

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bkt_test LOCATION '{tmp_path}/wh'"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        (
            orders.write.mode("overwrite")
            .bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bkt_test.orders_b")
        )
        (
            lineitem.write.mode("overwrite")
            .bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bkt_test.lineitem_b")
        )
        # force the sort-merge path so the bucketing (not a broadcast)
        # is what eliminates the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table("bkt_test.orders_b")
        l = spark.table("bkt_test.lineitem_b")
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
        # the join itself must be shuffle-free; the only exchange allowed
        # is the one feeding the final groupBy
        assert "SortMergeJoin" in plan
        assert n_shuffles <= 1, plan
        # and it must still be correct
        expected = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_test.orders_b")
        spark.sql("DROP TABLE IF EXISTS bkt_test.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS bkt_test")
