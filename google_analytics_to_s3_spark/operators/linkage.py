"""Entity resolution: blocked edit-distance fuzzy matching — the
record-linkage step a curation pipeline needs for author/source/entity
dedup where names differ by typos rather than exact or shingle-level
duplication (the gap between exact dedup and the MinHash/SimHash
families in ``operators/dedup.py``).

Method: multi-pass blocking (Hernández & Stolfo's merge/purge idea
adapted to hash blocks): every record lands in one block per pass —
pass 1 keys on the name's first ``k`` chars, pass 2 on its last ``k``
— then candidate pairs form ONLY within a block, and an exact
``levenshtein`` verify keeps pairs within the distance threshold. For
names longer than ``2 * block_chars`` a single edit
(insert/delete/substitute) cannot touch both key windows at once —
the prefix window covers positions 1..k and the suffix window the
last k characters, and an edit before the suffix window leaves those
last k characters unchanged — so any such pair within distance 1
shares at least one block. Shorter names offer no such guarantee (one
edit can corrupt both keys of a 4-char name); shrink ``block_chars``
or pre-filter short strings into an exact/enumerated path.

**Block purging** (Papadakis et al., "Blocking for Entity Resolution",
the standard defense): a block whose size exceeds ``max_block_size``
is discarded BEFORE the pair join — an oversized block is a
non-discriminative key (everyone named "john") whose candidate count
grows quadratically while its match yield stays near zero. Purging
bounds per-block pair work at max_block_size²; recall survives via the
OTHER pass (a record pair loses only if every shared block is purged).

Scale contract:
- only (id, name, block_key) rows shuffle; after purging, candidate
  pair work is ≤ n_blocks × max_block_size² — linear in blocks, never
  corpus²;
- the levenshtein verify runs native (JVM codegen) on candidates only;
- the purge itself is one hash aggregation on the block key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str = "id",
    name_col: str = "name",
    max_dist: int = 1,
    block_chars: int = 4,
    max_block_size: int = 50,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist) for all pairs with
    levenshtein(name_a, name_b) <= ``max_dist`` that share a surviving
    prefix or suffix block; id_a < id_b, each pair reported once."""
    norm = F.lower(F.col(name_col))
    base = df.select(F.col(id_col).alias("_id"), norm.alias("_nm"))
    keyed = base.select(
        "_id",
        "_nm",
        F.explode(
            F.array(
                F.concat(F.lit("p:"), F.substring("_nm", 1, block_chars)),
                F.concat(
                    F.lit("s:"),
                    F.substring("_nm", -block_chars, block_chars),
                ),
            )
        ).alias("_blk"),
    )
    ok_blocks = (
        keyed.groupBy("_blk")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= max_block_size)
        .select("_blk")
    )
    keyed = keyed.join(ok_blocks, "_blk")
    l = keyed.select(
        F.col("_id").alias("id_a"),
        F.col("_nm").alias("name_a"),
        "_blk",
    )
    r = keyed.select(
        F.col("_id").alias("id_b"),
        F.col("_nm").alias("name_b"),
        "_blk",
    )
    cand = (
        l.join(r, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("_blk")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
