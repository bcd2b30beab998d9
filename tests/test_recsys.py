"""Unit coverage for item-item CF (operators/recsys.py)."""

import pytest
from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.recsys import item_cosine_topk


def _interactions(spark):
    # users 1,2 share items 10,20; item 30 only user 1; item 40 only 2
    rows = [
        (1, 10, 5), (1, 20, 4), (1, 30, 3),
        (2, 10, 5), (2, 20, 2), (2, 40, 1),
    ]
    return spark.createDataFrame(rows, "u long, i long, ts long")


class TestItemCosine:
    def test_cosine_values(self, spark):
        out = item_cosine_topk(
            _interactions(spark), "u", "i", k=5, min_co=1
        )
        got = {
            (r["item"], r["rec_item"]): (r["co_users"], r["cos"])
            for r in out.collect()
        }
        # items 10 and 20: 2 common users, |U|=2 each → cos = 1.0
        assert got[(10, 20)] == (2, 1.0)
        assert got[(20, 10)] == (2, 1.0)
        # 10 vs 30: 1 common, sqrt(2*1) → 0.707107
        assert got[(10, 30)] == (1, 0.707107)
        spark.catalog.clearCache()

    def test_min_co_filters(self, spark):
        out = item_cosine_topk(
            _interactions(spark), "u", "i", k=5, min_co=2
        )
        pairs = {(r["item"], r["rec_item"]) for r in out.collect()}
        assert pairs == {(10, 20), (20, 10)}
        spark.catalog.clearCache()

    def test_recency_truncation(self, spark):
        # keep_per_user=2: user 1 keeps {10, 20}, user 2 keeps {10, 20}
        # (ts desc) → item 30/40 never pair
        out = item_cosine_topk(
            _interactions(spark), "u", "i", k=5, min_co=1,
            recency_col="ts", keep_per_user=2,
        )
        items = {r["item"] for r in out.collect()}
        assert items == {10, 20}
        spark.catalog.clearCache()

    def test_rank_and_k(self, spark):
        out = item_cosine_topk(
            _interactions(spark), "u", "i", k=1, min_co=1
        )
        by_item = {}
        for r in out.collect():
            by_item.setdefault(r["item"], []).append(r)
        for item, rows in by_item.items():
            assert len(rows) == 1 and rows[0]["rank"] == 1
        # item 10's best neighbor is 20 (cos 1.0)
        assert by_item[10][0]["rec_item"] == 20
        spark.catalog.clearCache()

    def test_recency_requires_keep(self, spark):
        with pytest.raises(ValueError, match="keep_per_user"):
            item_cosine_topk(
                _interactions(spark), "u", "i", recency_col="ts"
            )
