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

from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Iterative-round sizing: ~64k narrow id-pair rows per task (a few MB).
# Round tables here are node/edge-grain; at test scale they are a few
# thousand rows, where a 32-map+32-reduce stage is pure task-scheduling
# overhead (measured: a 1-shuffle job costs ~450 ms at 32 shuffle
# partitions vs ~120 ms at 1 — r14). The partition count derives from
# the row counts the convergence actions already return, so it grows
# back to full parallelism with data size — a size-adaptive layout,
# not a local[32] constant (guide §2.2: fewer, larger partitions).
ROWS_PER_TASK = 65536


def _adaptive_parts(sc, rows: int) -> int:
    return max(1, min(sc.defaultParallelism, -(-int(rows) // ROWS_PER_TASK)))


@contextmanager
def _round_shuffle_parts(spark, parts: int):
    """Scope ``spark.sql.shuffle.partitions`` to the iterative round
    loop: each round's lazy localCheckpoint plans (and therefore sizes
    its exchanges) synchronously inside the loop, so the override
    applies exactly to the round plans and is restored afterwards."""
    conf = spark.conf
    old = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", old)


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Distinct ordered item pairs (src < dst) co-occurring within a
    group — the co-purchase / co-click edge builder.

    ONE exchange (hash-aggregate the group's item set) + an in-row
    array pair expansion, instead of the equivalent self-join on the
    group key (two exchanges of the full table + a join) — the
    share-one-exchange move of guide §2.4. The set of emitted pairs is
    identical to ``a JOIN b ON a.g = b.g AND a.item < b.item`` followed
    by DISTINCT: collect_set dedups within the group (order-insensitive
    — the pair set is symmetric-free by the < predicate), and the final
    distinct dedups across groups. Pair count per group is k*(k-1)/2
    either way, so the skew profile matches the self-join's.
    """
    pair_expr = (
        f"flatten(transform(_items, x -> "
        f"transform(filter(_items, y -> y > x), "
        f"y -> struct(x AS {src}, y AS {dst}))))"
    )
    return (
        df.groupBy(group_col)
        .agg(F.collect_set(item_col).alias("_items"))
        .select(F.explode(F.expr(pair_expr)).alias("_e"))
        .select(f"_e.{src}", f"_e.{dst}")
        .distinct()
    )


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
    # lazy checkpoints: the per-round convergence aggregate is the
    # action that materializes the round's label table, so each round
    # costs ONE job instead of checkpoint-job + aggregate-job (r13 opt)
    labels = (
        bidir.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )
    spark = edges.sparkSession
    sc = spark.sparkContext
    # node count folded into the first convergence aggregate (no extra
    # job) sizes the round shuffles (r14, see ROWS_PER_TASK)
    row0 = labels.agg(
        F.sum("comp").alias("_s"), F.count(F.lit(1)).alias("_n")
    ).first()
    prev_sum, n_nodes = row0["_s"], int(row0["_n"])
    parts = _adaptive_parts(sc, n_nodes)
    bidir0 = bidir
    if parts < sc.defaultParallelism:
        # small graph: re-layout the cached edge table to match, so
        # each round scans `parts` cached partitions instead of many
        bidir = bidir.repartition(parts, "a").persist()
    for _ in range(max_iters):
        with _round_shuffle_parts(spark, parts):
            # SHUFFLE_HASH: the label table is an RDD checkpoint whose
            # hidden stats made the planner re-SORT the persisted edge
            # table every round under SortMergeJoin; the hash build
            # side is the node-grain label slice, bounded per
            # partition at any scale (r14, same as label_propagation)
            msgs = bidir.join(
                labels.hint("shuffle_hash"), bidir.a == labels.id
            ).select(
                F.col("b").alias("id"), "comp"
            )
            labels = (
                labels.unionByName(msgs)
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
                .localCheckpoint(eager=False)
            )
            cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            bidir.unpersist()
            if bidir is not bidir0:
                bidir0.unpersist()
            return labels.select(
                F.col("id").alias(id_out), F.col("comp").alias(comp_out)
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds "
        "(graph diameter too large — raise max_iters or use "
        "star-contraction)"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_out: str = "id",
    comp_out: str = "component",
    max_iters: int = 20,
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    adversarial-diameter upgrade to :func:`connected_components`:
    converges in O(log n) rounds on ANY graph shape, where min-label
    propagation needs diameter rounds (a 1 000-hop chain — a crawl
    frontier, a linked-list-shaped join graph — stalls propagation but
    costs star contraction ~10 rounds).

    Per round: large-star hangs every neighbor v > u onto
    m = min(Γ(u) ∪ {u}); small-star re-hangs the smaller neighbors of
    each local maximum. Both are one groupBy-min plus one equi-join on
    the node id — the same primitives, partitioning, and skew behavior
    as the propagation variant. Fixpoint detection is an exact
    ``exceptAll`` emptiness check per round pair (at extreme scale swap
    for a (count, sum) checksum pre-filter); ``localCheckpoint``
    truncates lineage each round as usual.

    Output contract matches :func:`connected_components`: (id,
    component = min reachable node id) for every node in ``edges``.
    """
    # lazy checkpoint + one materializing agg per round (r13 opt): the
    # count AND an order-independent set checksum (bit_xor of the row
    # hash) come from the SAME job, so the exact exceptAll equality
    # check only runs on rounds where count and checksum both match —
    # the checksum is a negative filter (different checksum ⟹ sets
    # differ), never a positive proof, so convergence stays exact.
    def _cnt_sig(df: DataFrame) -> "tuple[int, int]":
        row = df.agg(
            F.count(F.lit(1)).alias("_n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("_sig"),
        ).first()
        return int(row["_n"]), (0 if row["_sig"] is None else int(row["_sig"]))

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e_cnt, e_sig = _cnt_sig(e)
    spark = edges.sparkSession
    for _ in range(max_iters):
        # size each round's exchanges from the CURRENT edge count —
        # the convergence aggregate already pays for it (r14,
        # ROWS_PER_TASK); the round plans synchronously inside the
        # scope via the lazy checkpoint's toRdd, so the override
        # covers exactly this round
        parts = _adaptive_parts(spark.sparkContext, max(1, 2 * e_cnt))
        with _round_shuffle_parts(spark, parts):
            # large-star: group the full neighborhood of u, hang
            # larger neighbors onto the local min
            bidir = e.union(
                e.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            mins = bidir.groupBy("a").agg(F.min("b").alias("mn"))
            # SHUFFLE_HASH on the node-grain min tables: the edge
            # tables are RDD checkpoints with hidden stats, so
            # SortMergeJoin re-sorted them every round; the hash build
            # side is bounded per partition at any scale (r14)
            lg = (
                bidir.join(mins.hint("shuffle_hash"), "a")
                .withColumn("m", F.least("a", "mn"))
                .filter(F.col("b") > F.col("a"))
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .distinct()
            )
            # small-star: direct every edge large→small, re-hang each
            # node's smaller neighbors (and itself) onto their min
            d = lg.select(
                F.greatest("a", "b").alias("a"),
                F.least("a", "b").alias("b"),
            )
            mins_d = d.groupBy("a").agg(F.min("b").alias("mn"))
            joined = d.join(mins_d.hint("shuffle_hash"), "a")
            sm = (
                joined.filter(F.col("b") != F.col("mn"))
                .select(F.col("b").alias("a"), F.col("mn").alias("b"))
                # no inner distinct on the (a, mn) branch: the outer
                # distinct subsumes it (identical result set), and
                # map-side partial aggregation keeps the shuffle bytes
                # comparable — dropping it removes one full exchange +
                # stage barrier per round (r13 opt: interleaved A/B
                # halved round cost)
                .unionByName(
                    joined.select(F.col("a"), F.col("mn").alias("b"))
                )
                .distinct()
                .localCheckpoint(eager=False)
            )
            # both sides are DISTINCT sets: equal counts + empty
            # one-sided except ⟺ set equality. The (count, checksum)
            # pair from the materializing agg skips the joining except
            # on every round where either differs; the except still
            # CONFIRMS equality on the final round (checksum equality
            # alone proves nothing).
            sm_cnt, sm_sig = _cnt_sig(sm)
            changed = (
                1
                if sm_cnt != e_cnt or sm_sig != e_sig
                else sm.exceptAll(e).limit(1).count()
            )
        e, e_cnt, e_sig = sm, sm_cnt, sm_sig
        if changed == 0:
            labels = (
                e.select(F.col("a").alias("id"), F.col("b").alias("comp"))
                .unionByName(
                    e.select(
                        F.col("b").alias("id"), F.col("b").alias("comp")
                    )
                )
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
            )
            return labels.select(
                F.col("id").alias(id_out), F.col("comp").alias(comp_out)
            )
    raise RuntimeError(
        f"connected_components_star: no fixpoint after {max_iters} "
        "round pairs"
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_out: str = "id",
    count_out: str = "n_triangles",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph —
    the local clustering signal a dedup/community pipeline uses to tell
    tight near-clique duplicate clusters from incidental chains (a
    triangle-free component is a path/star, not a dup cluster).

    Algorithm: degree-ordered wedge counting (the standard
    compact-forward / MapReduce scheme, cf. Suri & Vassilvitskii, WWW'11
    "Counting Triangles and the Curse of the Last Reducer"). Each
    undirected edge is oriented from its lower-(degree, id) endpoint to
    the higher one, so every triangle is generated exactly once as a
    wedge at its smallest vertex and wedge fan-out is bounded by
    O(m^{3/2}) TOTAL regardless of degree skew — a star hub of degree d
    produces 0 wedges instead of d² because all its edges point INTO it.

    Plan shape: one degree aggregation, one self-join of the oriented
    edge list on the wedge pivot, one semi-join of candidate wedges
    against the oriented edge set, one explode + hash agg for the
    per-node rollup. Only (src, dst) id pairs ever shuffle.

    Returns (id, n_triangles) for every node incident to at least one
    non-self-loop edge (0 for nodes in no triangle; self-loops are
    discarded first, so a node appearing ONLY in self-loops has no
    output row). Output rows = node count; order-insensitive.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    und = und.persist()
    deg = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    # orient each edge low→high in (deg, id) order; the rank is encoded
    # into one comparable struct so ties (equal degree) break on id and
    # the orientation is a strict total order
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    ranked = und.join(da, "a").join(db, "b")
    fwd_ab = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(fwd_ab, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd_ab, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    oriented = oriented.persist()
    # wedges at the pivot: lo→u, lo→v (u ≠ v, canonical u < v); closing
    # edge u–v may be oriented either way, so probe the undirected set
    l = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("u"))
    r = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("v"))
    wedges = l.join(r, "p").filter(F.col("u") < F.col("v"))
    tri = wedges.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "inner",
    ).select("p", "u", "v")
    per_node = (
        tri.select(
            F.explode(F.array("p", "u", "v")).alias(id_out)
        )
        .groupBy(id_out)
        .agg(F.count("*").alias(count_out))
    )
    nodes = deg.select(F.col("n").alias(id_out))
    out = nodes.join(per_node, id_out, "left").select(
        id_out,
        F.coalesce(F.col(count_out), F.lit(0)).cast("long").alias(count_out),
    )
    out = out.localCheckpoint(eager=True)
    oriented.unpersist()
    und.unpersist()
    return out


# PageRank integer grid: ranks live as floor(r * 2^40) int64 "micro
# ranks". Per-node contributions use integer division by out-degree and
# integer sums (order-independent under partial aggregation); the one
# float op per iteration — damping×sum — is an exact-rounded double
# product of values < 2^41 (far inside the 2^53 exact-integer range),
# floored back onto the grid. Any SQL engine reproduces every iteration
# bit-for-bit.
PR_SCALE = 1 << 40
PR_DAMP = 0.85


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Deterministic damped PageRank over a directed edge list.

    The plan unrolls ``n_iters`` rounds of: per-node contribution
    (rank div out-degree, map-side after one degree join), incoming-sum
    (one hash aggregation on dst), dangling-mass redistribution (one
    1-row aggregate over the rank rows flagged dangling at build time —
    a filter, not a join, so it adds no per-round exchange, broadcast
    onto the update), damp + teleport (map-side). The edge list with degree
    attached is persisted and every round's join reuses its
    partitioning — per-round cost is one shuffle of the (nodes-sized)
    rank table plus the scalar dangling aggregate; the graph itself
    never re-shuffles. The dangling share stays on the integer grid
    (``dmass div n``), so any SQL engine replays it bit-for-bit.

    The final ranks are materialized (eager local checkpoint) before
    returning, and all persisted intermediates are unpersisted — the
    returned DataFrame owns no cached blocks.

    Returns (node, rank_q) with rank_q on the PR_SCALE integer grid.
    """
    # persist the input FIRST: nodes, degrees and the degree-joined
    # edge table all derive from it, and an expression-defined edge
    # list (e.g. a co-occurrence self-join) would otherwise be
    # recomputed three times before the iterations even start. The
    # select creates a NEW plan to persist so the cleanup below never
    # unpersists a DataFrame object the caller may have cached.
    # Partitioning the cache by src up front lets the degree aggregate
    # AND the per-round contribution join reuse that layout instead of
    # re-exchanging the (often wide-partitioned) upstream self-join
    # output — measured ~25% off the cold-path cost at sf0.1, identical
    # results.
    # optional edge weights (weighted PageRank, the TextRank form):
    # a node's rank splits proportionally to outgoing weight —
    # ``rank_q * w div strength`` stays on the integer grid (the
    # unweighted path is the weight-1 special case of the same
    # expression, so one code path serves both)
    wcol = (
        F.col(weight).cast("long") if weight is not None
        else F.lit(1).cast("long")
    )
    edges = (
        edges.select(F.col(src), F.col(dst), wcol.alias("_w"))
        .repartition(F.col(src))
        .persist()
    )
    # fused node table: node list AND the dangling flag (out-degree 0 —
    # appears as dst but never as src) from ONE aggregation. The flag
    # rides the rank table, so the per-round dangling-mass aggregate is
    # a filter + 1-row reduce — no join, no extra exchange.
    nodes = (
        edges.select(F.col(src).alias("node"), F.lit(1).alias("_s"))
        .union(edges.select(F.col(dst).alias("node"), F.lit(0).alias("_s")))
        .groupBy("node")
        .agg((F.max("_s") == 0).alias("is_dang"))
    ).persist()
    deg = edges.groupBy(src).agg(F.sum("_w").alias("deg"))
    ed = edges.join(deg, src).select(
        F.col(src).alias("c_src"), F.col(dst).alias("c_dst"),
        "_w", "deg",
    ).persist()
    # node count as a broadcast 1-row stats table instead of a driver
    # count job (r13): init_q = PR_SCALE div n (integer div, both
    # positive — identical to Python's //), base_q = the same
    # double-multiply/divide/truncate as int(0.15 * PR_SCALE / n), so
    # every grid value is bit-for-bit what the literal path baked in,
    # with one less materializing action before the iterations
    nstats = (
        nodes.agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "_n",
            F.expr(f"{PR_SCALE} div _n").cast("long").alias("_init_q"),
            (
                F.lit(0.15 * PR_SCALE) / F.col("_n").cast("double")
            ).cast("long").alias("_base_q"),
        )
        .localCheckpoint(eager=False)
    )
    r = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", "is_dang", F.col("_init_q").alias("rank_q")
    )
    for i in range(n_iters):
        # SHUFFLE_HASH: r is an RDD checkpoint (hidden stats), so the
        # planner re-sorted the persisted degree-joined edge table
        # every round under SortMergeJoin; hash-building the
        # node-grain rank table is bounded per partition at any scale
        # (r14, same fix as label_propagation)
        contrib = ed.join(
            r.hint("shuffle_hash"), ed.c_src == F.col("node")
        ).select(
            F.col("c_dst").alias("node_out"),
            F.expr("(rank_q * _w) div deg").alias("c"),
        )
        summed = contrib.groupBy("node_out").agg(F.sum("c").alias("s"))
        # scalar dangling-mass aggregate: 1 row, broadcast onto the
        # update (the repo's standard broadcast-crossJoin stats shape);
        # integer div keeps the share on the grid
        share = (
            r.filter("is_dang")
            .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).alias("dmass"))
            .crossJoin(F.broadcast(nstats))
            .select(
                F.expr("dmass div _n").cast("long").alias("d_share"),
                "_base_q",
            )
        )
        r = (
            nodes.join(
                summed.hint("shuffle_hash"),
                nodes.node == summed.node_out, "left",
            )
            .crossJoin(F.broadcast(share))
            .select(
                "node",
                "is_dang",
                (
                    F.col("_base_q")
                    + F.floor(
                        F.lit(PR_DAMP)
                        * (
                            F.coalesce(F.col("s"), F.lit(0))
                            + F.col("d_share")
                        ).cast("double")
                    )
                ).cast("long").alias("rank_q"),
            )
        )
        r = r.localCheckpoint(eager=(i == n_iters - 1))
    for cached in (ed, nodes, edges):
        cached.unpersist()
    return r.select("node", "rank_q")


def k_core(
    edges: DataFrame,
    k: int = 2,
    n_rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    id_out: str = "id",
    deg_out: str = "core_degree",
) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly delete nodes of degree
    < k (and their edges). The k-core is the density filter a dedup
    pipeline runs AFTER clustering — connected components find groups,
    the core separates tight near-clique duplicate communities from
    incidental chains/trees that connect through a single bridge doc
    (a tree has NO 2-core; a dup clique survives whole).

    Contract: exactly ``n_rounds`` peeling rounds, which equals the
    true k-core whenever peeling has converged by then (each round
    strictly shrinks the node set until fixpoint; convergence on a
    given graph is pinned by comparing n_rounds and n_rounds+1 — see
    tests). Bounded rounds keep the plan — and the chained-CTE oracle —
    deterministic in shape, the same trade PageRank makes with its
    unrolled iterations.

    Per round: one degree aggregation + two semi-joins of the edge
    list against the surviving-node set; only (a, b) id pairs ever
    shuffle, and ``localCheckpoint`` truncates the growing lineage.
    Returns (id, core_degree) for nodes of the surviving subgraph.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    e = und
    for _ in range(n_rounds):
        deg = (
            e.select(F.col("a").alias("n"))
            .union(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        # SHUFFLE_HASH on the surviving-node set: e is an RDD
        # checkpoint (hidden stats → SortMergeJoin re-sorted it twice
        # per round); the build side is node-grain (r14)
        e = (
            e.join(
                keep.select(F.col("n").alias("a")).hint("shuffle_hash"),
                "a", "left_semi",
            )
            .join(
                keep.select(F.col("n").alias("b")).hint("shuffle_hash"),
                "b", "left_semi",
            )
            .localCheckpoint()
        )
    return (
        e.select(F.col("a").alias(id_out))
        .union(e.select(F.col("b").alias(id_out)))
        .groupBy(id_out)
        .agg(F.count("*").cast("long").alias(deg_out))
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    label_col: str = "label",
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
    assume_distinct: bool = False,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002 in its
    discrete majority-vote form): seed labels spread over the graph
    for a FIXED number of synchronous rounds; each round every
    non-seed node takes the majority label among its labeled
    neighbors (ties broken by smallest label — fully deterministic),
    keeps its previous label when no neighbor is labeled, and seed
    nodes never change. The classifier-free way to extend a partial
    labelling (known brands, known languages, resolved identities)
    across a relation graph.

    ``nodes`` is the full node domain ``(node, label)`` with NULL for
    unseeded rows; ``edges`` one direction of an undirected relation
    (mirrored internally, self-loops dropped).

    Scale shape: each round is one edge-sized join + one hash
    aggregation to (node, label) grain + one argmax window over that
    aggregated table — the bounded-round contract of
    :func:`pagerank`/:func:`k_core` (rounds is a small constant, never
    data-dependent). No collect anywhere; label tables are node-sized.
    Synchronous updates make the result independent of partitioning —
    what lets a SQL oracle replay every round verbatim.
    """
    und = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b")
    ).filter(F.col("_a") != F.col("_b"))
    # vote counts assume one row per undirected edge; skip the
    # (full-exchange) dedup only when the caller guarantees it — e.g.
    # cooccurrence_pairs output is distinct by construction (r13 opt)
    if not assume_distinct:
        und = und.distinct()
    # r14: partition the mirrored edge table ON THE VOTE-JOIN KEY and
    # persist (instead of an RDD checkpoint) — every round's vote join
    # then reuses the cached layout and the planner keeps real
    # statistics. The per-round label tables are lineage-truncated
    # RDD checkpoints, which hide their stats, so the vote and pick
    # joins carry SHUFFLE_HASH hints: without them the planner fell
    # back to SortMergeJoin and re-sorted the edge table EVERY round
    # (interleaved A/B: 7.0 → 4.4 s at sf0.1, byte-identical labels).
    # Build sides are node-grain slices — per-partition hash tables
    # stay bounded at any scale.
    und = (
        und.union(
            und.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
        )
        .repartition("_a")
        .persist()
    )

    # the seed rides INSIDE the label table (one less node-grain join
    # per round than re-joining the seed table each time; r14)
    labels = nodes.select(
        F.col(node_col).alias("_n"), F.col(label_col).alias("_seed")
    ).withColumn("_lbl", F.col("_seed"))
    for _ in range(rounds):
        votes = (
            und.join(
                labels.filter(F.col("_lbl").isNotNull()).select(
                    F.col("_n").alias("_a"), "_lbl"
                ).hint("shuffle_hash"),
                "_a",
            )
            .groupBy(F.col("_b").alias("_n"), "_lbl")
            .agg(F.count(F.lit(1)).alias("_votes"))
        )
        # argmax as a hash aggregation instead of a row_number window:
        # min(struct(-votes, lbl)) picks (max votes, then smallest
        # label) — the identical deterministic tie-break — with
        # map-side partial aggregation and NO sort (r13 opt: the
        # window needed an extra exchange + per-partition sort)
        picks = (
            votes.groupBy("_n")
            .agg(F.min(F.struct(
                (-F.col("_votes")).alias("_nv"),
                F.col("_lbl"),
            )).alias("_m"))
            .select("_n", F.col("_m._lbl").alias("_pick"))
        )
        labels = (
            labels.join(picks.hint("shuffle_hash"), "_n", "left")
            .select(
                "_n",
                "_seed",
                F.when(F.col("_seed").isNotNull(), F.col("_seed"))
                .otherwise(F.coalesce("_pick", "_lbl"))
                .alias("_lbl"),
            )
            # each round's labels feed BOTH the next round's vote join
            # and its previous-label reference — without a checkpoint
            # the round subtree (edge-sized vote aggregation included)
            # is evaluated once per consumer, doubling work per
            # unrolled round (r13 opt; same as connected_components)
            .localCheckpoint(eager=False)
        )
    return labels.select(
        F.col("_n").alias(node_col), F.col("_lbl").alias(label_col)
    )


def community_modularity(
    edges: DataFrame,
    assignment: DataFrame,
    node_col: str = "node",
    label_col: str = "label",
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Newman modularity of a community assignment over an undirected
    graph — the quality score that says whether a partition (label
    propagation, connected components, identity stitching) actually
    captures structure: Q = sum_c (e_in_c/m - (deg_c/2m)^2),
    Q > ~0.3 is real community structure, Q ~ 0 is a random split.

    EXACT arithmetic: multiply through by 4m^2 —
    ``Q * 4m^2 = sum_c (4*m*e_in_c - deg_c^2)`` — and every term is an
    integer (DECIMAL(38) products), so the score replays bit-for-bit
    with ONE double division at the end. Unassigned nodes (NULL label)
    form their own singleton communities implicitly by being dropped:
    their edges still count in m and their degrees in nothing — the
    caller labels every node it wants scored.

    Plan: one join per edge endpoint (labels broadcast if small, else
    shuffled equi-join), one hash agg to community grain, one 1-row
    total. Output: per-community rows ``(label, n_nodes, e_in,
    deg_sum, contribution)`` plus the partition-wide ``modularity`` on
    every row (an exact integer window total divided once).
    """
    und = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b")
    ).filter(F.col("_a") != F.col("_b"))
    # m / e_in / deg_sum count one row per undirected edge; the
    # canonicalize + dedup exchange is skipped only when the caller
    # guarantees distinct (low, high) pairs — cooccurrence_pairs
    # emits exactly that shape (r13 opt)
    if not assume_canonical:
        und = und.select(
            F.least("_a", "_b").alias("_a"),
            F.greatest("_a", "_b").alias("_b"),
        ).distinct()
    lab = assignment.select(
        F.col(node_col).alias("_n"), F.col(label_col).alias("_l")
    ).filter(F.col("_l").isNotNull())
    la = lab.select(F.col("_n").alias("_a"), F.col("_l").alias("_la"))
    lb = lab.select(F.col("_n").alias("_b"), F.col("_l").alias("_lb"))
    # SHUFFLE_HASH on the node-grain label sides: edge list and
    # assignment typically arrive as RDD checkpoints (hidden stats →
    # SortMergeJoin sorted the edge table twice); hash-building the
    # label slice is bounded per partition at any scale (r14)
    e = und.join(la.hint("shuffle_hash"), "_a").join(
        lb.hint("shuffle_hash"), "_b"
    )
    m_row = und.agg(F.count(F.lit(1)).cast("long").alias("_m"))
    # per-community internal edges
    e_in = (
        e.filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("_l"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    # per-community degree mass (each endpoint counts)
    deg = (
        e.select(F.col("_la").alias("_l"))
        .unionByName(e.select(F.col("_lb").alias("_l")))
        .groupBy("_l")
        .agg(F.count(F.lit(1)).cast("long").alias("deg_sum"))
    )
    nodes = lab.groupBy(F.col("_l")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    per = (
        nodes.join(deg, "_l", "left")
        .join(e_in, "_l", "left")
        .crossJoin(F.broadcast(m_row))
        .select(
            F.col("_l").alias(label_col),
            "n_nodes",
            F.coalesce("e_in", F.lit(0).cast("long")).alias("e_in"),
            F.coalesce("deg_sum", F.lit(0).cast("long")).alias("deg_sum"),
            F.col("_m"),
        )
    )
    term = (
        F.lit(4).cast("decimal(38,0)")
        * F.col("_m").cast("decimal(38,0)")
        * F.col("e_in").cast("decimal(38,0)")
        - F.col("deg_sum").cast("decimal(38,0)")
        * F.col("deg_sum").cast("decimal(38,0)")
    )
    denom = (
        F.lit(4).cast("decimal(38,0)")
        * F.col("_m").cast("decimal(38,0)")
        * F.col("_m").cast("decimal(38,0)")
    )
    # the partition-wide total is a 1-row exact-integer aggregate
    # broadcast back (never a single-partition window over the
    # community table)
    per = per.localCheckpoint(eager=False)
    tot = per.agg(F.sum(term).alias("_tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        label_col, "n_nodes", "e_in", "deg_sum",
        F.round(
            F.when(
                F.col("_m") > 0, term.cast("double") / denom.cast("double")
            ),
            6,
        ).alias("contribution"),
        F.round(
            F.when(
                F.col("_m") > 0,
                F.col("_tot").cast("double") / denom.cast("double"),
            ),
            6,
        ).alias("modularity"),
    )
