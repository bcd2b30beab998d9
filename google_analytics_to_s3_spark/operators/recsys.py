"""Item-item collaborative filtering: cosine similarity over binary
user-item interaction vectors, top-k neighbors per item.

The recommender companion to the order-grain association rules
(q_basket_rules): there the grain is one order and the score is
confidence/lift; here the grain is the whole customer history and the
score is set-cosine |U_a ∩ U_b| / sqrt(|U_a|·|U_b|) — the classic
item-based CF of Sarwar et al. (WWW'01), expressed as joins/aggs.

Scale shape: candidate pairs come from the per-user self-join, so pair
work is Σ_u |items(u)|² — bounded by capping hyperactive users
(``max_items_per_user``), the standard CF pruning: a user interacting
with everything contributes no discriminative signal but quadratic
work. Item-count lookups join on the item key (same exchange the
pair aggregation already needs); the final top-k is one window over
the item partitioning, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_cosine_topk(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 5,
    min_co: int = 2,
    max_items_per_user: int = 200,
    recency_col: str | None = None,
    keep_per_user: int | None = None,
) -> DataFrame:
    """(item, rec_item, co_users, cos, rank): the ``k`` highest-cosine
    neighbors per item (ties broken by neighbor id), from distinct
    user-item interactions.

    Pair-work bounding, in order of strength: with ``recency_col`` +
    ``keep_per_user`` every user keeps only their ``keep_per_user``
    most-recent items (ties by item id) — pair work becomes
    ``users × keep²`` EXACTLY, the standard recent-history truncation
    of production CF. Otherwise users above ``max_items_per_user``
    distinct items are dropped whole (whale pruning).
    """
    if recency_col is not None:
        if keep_per_user is None:
            raise ValueError("keep_per_user required with recency_col")
        ui0 = interactions.select(
            F.col(user_col).alias("u"),
            F.col(item_col).alias("i"),
            F.col(recency_col).alias("_ts"),
        ).groupBy("u", "i").agg(F.max("_ts").alias("_ts"))
        w = Window.partitionBy("u").orderBy(
            F.col("_ts").desc(), F.col("i").asc()
        )
        ui = (
            ui0.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep_per_user)
            .select("u", "i")
        )
    else:
        ui = interactions.select(
            F.col(user_col).alias("u"), F.col(item_col).alias("i")
        ).distinct()
        sizes = ui.groupBy("u").agg(F.count(F.lit(1)).alias("_nu"))
        ui = (
            ui.join(sizes, "u")
            .filter(F.col("_nu") <= max_items_per_user)
            .select("u", "i")
        )
    # the pruned interaction set feeds BOTH pair-join sides and the
    # item-count aggregate — persist so the prune lineage runs once
    # (without this the plan re-derives it 4×; caller-owned cache,
    # released by spark.catalog.clearCache() as with rhp_dup_pairs)
    ui = ui.persist()
    a, b = ui.alias("a"), ui.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.i") < F.col("b.i")),
        )
        .groupBy(
            F.col("a.i").alias("ia"), F.col("b.i").alias("ib")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("co_users"))
        .filter(F.col("co_users") >= min_co)
    )
    cnt = ui.groupBy("i").agg(F.count(F.lit(1)).alias("n_users"))
    ca = cnt.select(F.col("i").alias("ia"), F.col("n_users").alias("_na"))
    cb = cnt.select(F.col("i").alias("ib"), F.col("n_users").alias("_nb"))
    scored = co.join(ca, "ia").join(cb, "ib").select(
        "ia", "ib", "co_users",
        # one fixed-order double expression: co / sqrt(na*nb)
        (
            F.col("co_users").cast("double")
            / F.sqrt((F.col("_na") * F.col("_nb")).cast("double"))
        ).alias("_cos"),
    )
    sym = scored.select(
        F.col("ia").alias("item"), F.col("ib").alias("rec_item"),
        "co_users", "_cos",
    ).unionByName(
        scored.select(
            F.col("ib").alias("item"), F.col("ia").alias("rec_item"),
            "co_users", "_cos",
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("_cos").desc(), F.col("rec_item").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item", "rec_item", "co_users",
            F.round("_cos", 6).alias("cos"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
