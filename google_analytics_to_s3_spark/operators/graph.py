"""Connected components over a pair graph — the clustering step that
turns near-duplicate PAIRS (minhash/simhash/cosine joins) into dedup
GROUPS, so a curation pipeline can keep one canonical document per
cluster. Beyond-reference capability (the reference has no graph ops).

Algorithm: iterative min-label propagation as pure DataFrame ops —
every node starts as its own component id and repeatedly takes the min
id over itself and its neighbors; fixpoint = component = min node id
reachable. Rounds needed = max distance from each component's min node
(≈ graph diameter), which for near-dup graphs is small (dup clusters
are near-cliques). For adversarial long-path graphs switch to the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") — same join/agg primitives, O(log n) rounds.

Scale notes:
- The bidirectional edge list is partitioned ONCE on the join key and
  persisted; every iteration's join reuses that layout, so per-round
  cost is one shuffle of the (much smaller) label table + one
  partial-aggregated groupBy min.
- Labels only ever decrease, so sum(labels) is a monotone convergence
  metric: one cheap scalar per round instead of a change-count join.
- ``localCheckpoint`` truncates the lineage each round — iterative
  joins otherwise compound the plan exponentially (analyzer time, not
  data volume, becomes the bottleneck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_out: str = "id",
    comp_out: str = "component",
    max_iters: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component
    = smallest node id in the connected component (deterministic).

    Raises if the propagation hasn't converged after ``max_iters``
    rounds — for graphs that legitimately need more, raise the cap or
    use a star-contraction variant (see module docstring).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    bidir = (
        und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition("a")
        .persist()
    )
    labels = (
        bidir.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    for _ in range(max_iters):
        msgs = bidir.join(labels, bidir.a == labels.id).select(
            F.col("b").alias("id"), "comp"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            bidir.unpersist()
            return labels.select(
                F.col("id").alias(id_out), F.col("comp").alias(comp_out)
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds "
        "(graph diameter too large — raise max_iters or use "
        "star-contraction)"
    )
