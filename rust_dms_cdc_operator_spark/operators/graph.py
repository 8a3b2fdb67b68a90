"""Connected components over pair edges — dedup *group* assignment.

The dedup operators (operators/dedup.py, operators/similarity.py)
emit near-duplicate PAIRS; a training pipeline needs the transitive
closure of those pairs — duplicate GROUPS — so it can keep one
canonical document per group. That closure is connected components.

Implementation: local-min labeling + a fixed budget of pointer-jump
rounds + contraction. Convergence is never probed — the contraction's
union-find (bounded driver) or recursion (distributed) resolves
whatever label connectivity the jumps left, so jump rounds are purely
a size optimization and every round is exactly one checkpoint job
with zero extra driver actions.

Scale: labeling is one groupBy; each jump is one equi-join over the
(node, comp) frame — orders of magnitude smaller than the input
pairs; contraction joins the edge list once per level. LSH dup graphs
(unions of near-cliques) finish in one level; adversarial chains
contract ~4× per level, O(log n) levels, ``max_iter`` as the guard.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_dms_cdc_operator_spark.session import local_relation


DRIVER_UF_THRESHOLD = 200_000

# contraction-side broadcast bound for the (node, comp) label frame:
# 4M rows x 2 longs ~ 64 MB serialized — comfortably under executor
# memory, far over any test corpus. Billions of nodes fall back to
# shuffle joins.
LABEL_BROADCAST_ROWS = 4_000_000


def _all_leaves_materialized(df: DataFrame) -> bool:
    """True iff every leaf of ``df``'s logical plan is an
    already-materialized RDD (``LogicalRDD`` — what
    ``session.materialize_leaf`` / ``localCheckpoint`` produce) or an
    Arrow/list local relation. Used to gate narrow coalesces that are
    safe over finished blocks but hazardous under a live shuffle
    pipeline (see connected_components' e0 note). Conservative on any
    py4j surprise: returns False (skip the coalesce)."""
    try:
        leaves = df._jdf.queryExecution().logical().collectLeaves()
        n = leaves.size()
        if n == 0:
            return False
        for i in range(n):
            name = leaves.apply(i).getClass().getName()
            if not name.endswith(("LogicalRDD", "LocalRelation")):
                return False
        return True
    except Exception:  # pragma: no cover — py4j defensive
        return False


def _make_ckpt(
    spark: SparkSession, checkpoint_dir: str | None
) -> Callable[[DataFrame], DataFrame]:
    """Per-round lineage cut. Default: ``localCheckpoint`` (fast,
    executor-local — but NON-replicated: losing an executor mid-run
    kills the job). With ``checkpoint_dir``: reliable ``checkpoint()``
    to that path (HDFS/object store on a cluster), so a multi-hour CC
    over billions of edges survives executor loss (r2 verdict #2)."""
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        return lambda df: df.checkpoint(eager=True)
    return lambda df: df.localCheckpoint()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    driver_threshold: int = DRIVER_UF_THRESHOLD,
    checkpoint_dir: str | None = None,
    jump_rounds: int = 2,
) -> DataFrame:
    """(node, comp) for every node in ``edges``; ``comp`` is the
    smallest node id in the component (deterministic, engine-portable
    — the DuckDB oracle reproduces it with a recursive closure).

    Two-level contraction: one distributed local-min round labels every
    node with min(self, neighbors), then the graph is CONTRACTED to
    edges between labels. For dup graphs (unions of near-cliques) the
    contracted graph is tiny — each cluster collapses to ~1 label — so
    it finishes in a bounded driver-side union-find
    (``driver_threshold`` caps the collect; ≤ a few MB). A contracted
    graph still above the threshold recurses distributed; each level
    at least halves chains, so depth is O(log diameter) with
    ``max_iter`` as the guard. Common case: init groupBy + contract
    join + one broadcast mapping join — constant rounds, vs diameter
    rounds for plain label propagation."""
    # the edge list is consumed once per round — materialize the
    # DIRECTED list (round 8: materializing the symmetrized union
    # instead meant the whole upstream pair computation — minhash band
    # joins, cosine candidates — ran TWICE, once per union branch; and
    # every downstream join paid 2|E| where |E| suffices).
    #
    # Round 12 (guide §2.2 fewer-larger partitions): coalesce the edge
    # list to defaultParallelism before caching — a salted LSH pair
    # stream arrives in ~4x-cores micro-partitions (salt shards × skew
    # splits), and every later pass (fast-path count, sym aggregation,
    # contraction join) pays per-partition task overhead. coalesce
    # never increases a partition count, so a real cluster scan with
    # >= cores splits is untouched. Deliberately persist, NOT
    # localCheckpoint: an extra per-recursion-level localCheckpoint
    # compounds Catalyst's LogicalRDD stats/constraint rewriting
    # (rewriteStatsAndConstraints) and on adversarial chains the
    # contraction checkpoint's planning time grows exponentially with
    # recursion depth (measured: 0.2 s/level → 5 s → stuck at level
    # ~8 on a 40-edge chain). Callers that feed an expensive pair
    # plan in cut its lineage ONCE at their own depth-1 site instead
    # (see q_docs_group_split_incr), which keeps e0's task binary
    # small without a per-level checkpoint.
    #
    # Round 13 (advisor note): the coalesce is GATED on the input
    # already being a materialized leaf. Below the gate it was a
    # scale hazard for callers that feed the LIVE banded-join plan
    # (q_dedup_groups, q_docs_canonical_by_quality): coalesce under
    # persist squeezes the whole post-shuffle band-join output stage
    # into ~cores fat tasks — the exact per-task memory-exhaustion
    # mode materialize_leaf documents at native sf1 — and can
    # re-concentrate salt-spread hot-bucket shards into one task. A
    # leaf input's blocks are already materialized (the coalesce is
    # a narrow merge of finished blocks, the safe case the round-12
    # win measured); a live plan instead materializes at its
    # AQE-sized parallelism, and the cached-plan output coalescing
    # conf (session.py) handles its partition sizing scale-adaptively.
    ckpt = _make_ckpt(edges.sparkSession, checkpoint_dir)
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if _all_leaves_materialized(edges):
        e0 = e0.coalesce(
            max(edges.sparkSession.sparkContext.defaultParallelism, 1)
        )
    e0 = e0.persist()
    try:
        # FAST PATH: if the RAW edge list already fits the same
        # bounded driver collect the contracted path is allowed (≤
        # driver_threshold edges, a few MB), union-find it directly.
        # The label/jump/contract machinery exists to SHRINK a big
        # graph down to that bound — when the input is already under
        # it, the machinery is ~6 fixed scheduler jobs spent
        # shrinking nothing (measured 15 s → 3 s on the sf0.1
        # embedding near-dup graph, 277 edges). The count also
        # materializes the persist the slow path needs anyway, and
        # comp = min member is algorithm-independent, so both paths
        # return identical rows. (Union-find is direction-blind, so
        # the directed list is enough — no symmetrize before collect.)
        n_e = e0.count()
        if n_e <= driver_threshold:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in e0.collect():
                ra, rb = find(r["a"]), find(r["b"])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            comp_min: dict[int, int] = {}
            for node in parent:
                root = find(node)
                comp_min[root] = min(comp_min.get(root, node), node)
            rows = [(n, comp_min[find(n)]) for n in parent]
            # schema derives from the INPUT edge type (select of
            # src/dst keeps each side's type; least/greatest below
            # coerce identically), so int/string node ids get the same
            # output schema the distributed path would produce — which
            # path the edge count selects must never be observable.
            # Python min()/max() on str matches F.least's
            # lexicographic order, so values agree too.
            node_type = e0.schema["a"].dataType
            out_schema = T.StructType(
                [  # nullable=True: what groupBy/join infer distributed
                    T.StructField("node", node_type, True),
                    T.StructField("comp", node_type, True),
                ]
            )
            # Arrow local relation (round 12): the list form costs one
            # Python-worker hop per slice at EVERY downstream
            # evaluation — see session.local_relation
            return local_relation(edges.sparkSession, rows, out_schema)
        # level-0 round: node's label = min(self, direct neighbors).
        # This is a FOREST: following comp pointers always ends at a
        # local-minimum node (comp(r) == r). The symmetrized view is
        # built lazily from the cached directed list — two cache
        # reads, one map-combined shuffle; never its own cache.
        sym = e0.union(
            e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        labels = ckpt(
            sym.groupBy("a")
            .agg(F.min("b").alias("_mb"))
            .select(
                F.col("a").alias("node"),
                F.least(F.col("a"), F.col("_mb")).alias("comp"),
            )
        )
        # pointer-jump comp ← comp(comp) a FIXED small number of
        # rounds — no convergence probe at all (r2 verdict #8, taken
        # further): convergence is not a correctness requirement,
        # because the contraction below plus the driver union-find /
        # recursion resolves whatever label connectivity remains.
        # Jump rounds only SHRINK the contracted graph, so two rounds
        # (pointer depth 4 resolved) cover LSH near-clique graphs in
        # one level, and adversarial chains still contract ~4× per
        # recursion level — O(log n) levels total. Fixed rounds = zero
        # per-round driver actions (no agg, no take(1)): each round is
        # exactly one checkpoint job over the tiny labels frame.
        for _ in range(jump_rounds):
            x, y = labels.alias("x"), labels.alias("y")
            labels = ckpt(
                x.join(y, F.col("x.comp") == F.col("y.node"), "left")
                .select(
                    F.col("x.node").alias("node"),
                    F.coalesce(F.col("y.comp"), F.col("x.comp")).alias("comp"),
                )
            )
        # contract: edges between LABELS (self-loops dropped). For a
        # near-dup corpus this is the tiny inter-cluster remainder.
        # Joins run over the DIRECTED list — half the rows of the
        # symmetrized view — with least/greatest canonicalizing the
        # label-edge orientation (union-find and the recursion are
        # direction-blind, so one orientation per label edge is
        # exactly what they need).
        #
        # The label frame is NODE-sized — orders of magnitude smaller
        # than the edge list (46k nodes vs 200M pairs on the sf1
        # near-dup fixture). When it fits a broadcast, the contraction
        # becomes one cache scan + two map-side hash joins + the
        # ca!=cb filter killing the intra-cluster majority BEFORE any
        # exchange — the only shuffle left is the distinct over the
        # tiny inter-label remainder (measured 26 s -> ~3 s at sf1).
        # Past the row bound (billions of nodes at 100 TB) it falls
        # back to the plain shuffle joins.
        n_nodes = labels.count()  # cheap: labels is checkpointed
        la = labels.select(
            F.col("node").alias("a"), F.col("comp").alias("ca")
        )
        lb = labels.select(
            F.col("node").alias("b"), F.col("comp").alias("cb")
        )
        if n_nodes <= LABEL_BROADCAST_ROWS:
            la, lb = F.broadcast(la), F.broadcast(lb)
        # checkpoint: each contraction level must start from a leaf
        # plan — recursion over lazy frames otherwise NESTS the whole
        # lower-level plan per level (exponential planning cost,
        # driver OOM). The checkpointed frame is the label-edge list,
        # orders of magnitude smaller than the input pairs.
        contracted = ckpt(
            e0.join(la, "a")
            .join(lb, "b")
            .filter(F.col("ca") != F.col("cb"))
            .select(
                F.least("ca", "cb").alias("ca"),
                F.greatest("ca", "cb").alias("cb"),
            )
            .distinct()
        )
        n2 = contracted.count()
        if n2 == 0:
            return labels
        spark = edges.sparkSession
        use_driver_uf = n2 <= driver_threshold or max_iter <= 0
        if use_driver_uf:
            # bounded driver union-find over label-edges (≤ a few MB)
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in contracted.collect():
                ra, rb = find(r["ca"]), find(r["cb"])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            mapping = [(label, find(label)) for label in parent]
            map_df = local_relation(
                spark, mapping, "comp long, _root long"
            )
        else:
            # contracted graph still large: recurse distributed —
            # every level at least halves chains
            sub = connected_components(
                contracted, "ca", "cb",
                max_iter=max_iter - 1,
                driver_threshold=driver_threshold,
                checkpoint_dir=checkpoint_dir,
                jump_rounds=jump_rounds,
            )
            map_df = sub.select(
                F.col("node").alias("comp"), F.col("comp").alias("_root")
            )
        # broadcast only the bounded driver mapping; the recursive
        # branch's mapping is label-graph-sized and joins normally
        if use_driver_uf:
            map_df = F.broadcast(map_df)
        resolved = labels.join(map_df, "comp", "left").select(
            "node", F.coalesce(F.col("_root"), F.col("comp")).alias("comp")
        )
        return resolved
    finally:
        e0.unpersist()


def dedup_groups(
    pairs: DataFrame,
    id_col: str = "id_a",
    other_col: str = "id_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs → (doc_id, group_id): transitive duplicate
    groups keyed by their minimum member. Downstream keeps
    ``doc_id == group_id`` rows (the canonical representative) and
    drops the rest. ``checkpoint_dir`` selects reliable checkpoints
    (survives executor loss on long runs)."""
    cc = connected_components(
        pairs, id_col, other_col, max_iter, checkpoint_dir=checkpoint_dir
    )
    return cc.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("group_id")
    )


def incremental_groups(
    prior_assign: DataFrame,
    new_ids: DataFrame,
    new_new_pairs: DataFrame,
    anchor_pairs: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    _comp: DataFrame | None = None,
) -> DataFrame:
    """Incremental connected components for GROUP-AWARE SPLITTING at
    ingest time (round 11, verdict item 1) — the `incremental_dedup`
    digest-state pattern applied to CC: the full-corpus group
    assignment is a PERSISTED ARTIFACT computed once; each ingest
    batch is grouped against it without re-running CC over the
    corpus.

    Inputs::

        prior_assign    (doc_id, group_id)  frozen artifact covering
                                            every already-ingested doc
                                            (singletons included)
        new_ids         (doc_id)            the ingest batch
        new_new_pairs   (id_a, id_b)        near-dup pairs WITHIN the
                                            batch
        anchor_pairs    (new_id, prior_id)  near-dup pairs from a new
                                            doc to a prior doc

    Returns (doc_id, group_id) for the batch: components of the
    batch-internal graph that touch (directly or transitively through
    other NEW docs) any prior group ADOPT the minimum such prior
    group id; untouched components mint their own id (min member,
    the dedup_groups convention — callers own id-space disjointness
    between epochs, e.g. monotone doc ids).

    STABILITY CONTRACT: prior assignments are NEVER rewritten — a
    document's split can never migrate between epochs (migration is
    itself train/test leakage). The residual this buys: a batch
    component anchored to TWO prior groups adopts the minimum and
    leaves the other intact, so one cross-group near-dup edge can
    survive until the next full `docs_group_split` rebuild — the
    classic incremental-index + periodic-compaction trade, documented
    in SCALE.md.

    Scale shape: everything is batch-sized except `prior_assign`,
    which is touched by exactly one id-keyed equi-join (anchor
    resolution); CC runs over batch-internal edges only. At 100 TB
    the artifacts carried between ingests are the assignment table
    and the corpus band-key table (which also prices anchor-pair
    discovery at O(batch) bucket lookups).
    """
    # ``_comp``: optimization hook (round 12, guide §2.6) — a caller
    # that already ran CC over ``new_new_pairs`` (e.g. concurrently
    # with the prior-epoch CC) passes the (doc_id, group_id) result
    # in; identical to computing it here by definition.
    comp = (
        _comp
        if _comp is not None
        else dedup_groups(
            new_new_pairs, max_iter=max_iter, checkpoint_dir=checkpoint_dir
        )
    ).withColumnRenamed("group_id", "comp")
    newc = (
        new_ids.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("comp"),
        )
    )
    resolved = anchor_pairs.join(
        prior_assign.select(
            F.col("doc_id").alias("prior_id"),
            F.col("group_id").alias("prior_group"),
        ),
        "prior_id",
    )
    adopt = (
        resolved.select(F.col("new_id").alias("doc_id"), "prior_group")
        .join(newc, "doc_id")
        .groupBy("comp")
        .agg(F.min("prior_group").alias("_adopt"))
    )
    return newc.join(adopt, "comp", "left").select(
        "doc_id",
        F.coalesce(F.col("_adopt"), F.col("comp")).alias("group_id"),
    )


def group_rebuild_migration(
    prior: DataFrame,
    rebuilt: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The REBUILD AUDIT for the exact-required class (round 12,
    verdict item 4): the incremental stability contract
    (:func:`incremental_groups`) never rewrites prior assignments, and
    defers cross-group merges to the periodic full rebuild — but a
    rebuild MOVES documents between groups, and therefore potentially
    between train/val/test splits. This is the report a curation team
    runs BEFORE accepting a rebuild: every document whose group or
    split would change, with both sides of the move.

    Inputs are two (id, group_id, split) assignment frames — the
    frozen incremental artifact and the candidate full rebuild (their
    split columns as produced by ``operators.split.with_split`` on the
    respective group ids). Returns
    (doc_id, old_group, new_group, old_split, new_split) for each doc
    where either differs, null-safely: a doc present on only one side
    (ingested between the artifact snapshot and the rebuild, or
    dropped by it) surfaces with nulls on the missing side rather
    than disappearing from the audit. Summary counts are one
    ``groupBy(old_split, new_split).count()`` away — kept row-level
    here so the report is joinable against holdout registries (the
    operational question is "which eval docs would leak into train",
    not just how many).

    Scale shape: one full-outer id-keyed equi-join of two narrow
    corpus-sized frames + a null-safe inequality filter — one shuffle
    each side, no skew surface (ids are unique per side). The output
    is migration-sized, which is exactly the quantity the stability
    contract keeps small between rebuilds."""
    p = prior.select(
        F.col(id_col),
        F.col("group_id").alias("old_group"),
        F.col("split").alias("old_split"),
    )
    n = rebuilt.select(
        F.col(id_col),
        F.col("group_id").alias("new_group"),
        F.col("split").alias("new_split"),
    )
    return (
        p.join(n, id_col, "full_outer")
        .filter(
            ~F.col("old_group").eqNullSafe(F.col("new_group"))
            | ~F.col("old_split").eqNullSafe(F.col("new_split"))
        )
        .select(
            id_col, "old_group", "new_group", "old_split", "new_split"
        )
    )


def triangle_stats(
    edges: DataFrame,
    max_degree: int | None = None,
    assume_distinct: bool = False,
) -> DataFrame:
    """Global triangle census of an undirected graph given as
    (id_a < id_b) edges: edge count, wedge count (paths of length 2:
    sum of deg*(deg-1)/2), triangle count, and the global clustering
    coefficient 3*triangles/wedges — the structure report for a
    near-dup candidate graph (high clustering = duplicate CLUSTERS,
    sparse wedges = pairwise-only noise), which predicts connected-
    component explosion before running CC.

    Plan shape: triangles enumerate via two hash joins of the
    ordered edge list with itself — (a<b) x (b<c) wedges closed by an
    (a,c) edge probe; the a<b<c total order counts each triangle
    exactly once, and both joins are node-keyed shuffles (the classic
    heavy-hitter caveat applies: a hub node's wedge set is quadratic
    in its degree — at 100 TB, cap or sample hub degrees first).
    Wedges/degrees are one node-keyed aggregation. All exact
    integers; the coefficient is one rounded double division.

    ``max_degree``: drop HUB nodes (degree > cap) and their edges
    before the census — the standard truncation for clustering
    statistics (a hub's wedge set is quadratic in its degree; in a
    near-dup graph hubs are boilerplate documents that would dominate
    and distort the coefficient anyway). Deterministic, so the capped
    census remains oracle-checkable; the cap bounds per-node wedge
    work at cap^2 regardless of data size — the knob that keeps the
    census linear at 100 TB."""
    e = edges.select("id_a", "id_b")
    if not assume_distinct:
        e = e.distinct()
    e = e.persist()
    if max_degree is not None:
        deg0 = (
            e.select(F.col("id_a").alias("v"))
            .unionByName(e.select(F.col("id_b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg0.filter(F.col("d") <= max_degree).select("v")
        e = (
            e.join(keep.select(F.col("v").alias("id_a")), "id_a", "left_semi")
            .join(keep.select(F.col("v").alias("id_b")), "id_b", "left_semi")
            .select("id_a", "id_b")
            .persist()
        )
    deg = (
        e.select(F.col("id_a").alias("v"))
        .unionByName(e.select(F.col("id_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("w")
    )
    ab = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    bc = e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    ac = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("m"))
    # one-row scalars combine via a tagged UNION + max aggregation
    # (the count_diff pattern) instead of two 1-row crossJoins — the
    # same three jobs, but zero BroadcastNestedLoopJoin nodes, so the
    # repo-wide BNLJ lint needs no allowlist entry for this census
    nulls = lambda *names: [  # noqa: E731
        F.lit(None).cast("long").alias(n) for n in names
    ]
    stacked = (
        n_edges.select(F.col("m").cast("long").alias("m"), *nulls("w", "t"))
        .unionByName(
            wedges.select(
                nulls("m")[0], F.col("w").cast("long").alias("w"), *nulls("t")
            )
        )
        .unionByName(
            tri.select(*nulls("m", "w"), F.col("t").cast("long").alias("t"))
        )
    )
    return stacked.agg(
        F.max("m").alias("m"), F.max("w").alias("w"), F.max("t").alias("t")
    ).select(
        F.col("m").alias("n_edges"),
        F.col("w").alias("n_wedges"),
        F.col("t").alias("n_triangles"),
        F.when(F.col("w") > 0,
               F.round(F.lit(3.0) * F.col("t") / F.col("w"), 6))
        .alias("clustering"),
    )


def pagerank_undirected(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    round_digits: int = 9,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank on an undirected graph given as
    (id_a < id_b) edges — the iterative-algorithm shape (BSP rounds as
    unrolled declarative stages, zero driver actions inside the loop;
    Catalyst sees one plan with ``iters`` join+agg levels and AQE
    re-plans each exchange at runtime).

    Cross-engine determinism: every rank is ROUNDED (default 9
    digits) after each iteration — per-node contribution sums carry
    ~1e-15 summation-order jitter, far below the rounding step, so
    ranks are bit-identical in any engine (the perplexity-family
    argument applied per-iteration, where unrounded drift would
    compound). Returns (v, pr) after ``iters`` rounds from a uniform
    start; Σpr stays 1 up to rounding because every node here has
    degree >= 1 (it comes from an edge list — no dangling mass).

    Round-10 build rework (the r9 verdict's exact-wall item; measured
    151 -> 35 s at native sf1, 200.8M pairs): profiling showed the
    adjacency BUILD was ~65% of the wall (99 of 151 s), not the BSP
    rounds — three build costs were removable. (1) ``assume_distinct``
    skips the safety ``distinct()`` (one full pair-stream shuffle)
    when the edge source guarantees uniqueness, as
    ``dedup.minhash_lsh_pairs`` does by its first-colliding-band
    construction. (2) ``deg`` no longer joins back onto the
    edge-sized stream: the cached adjacency stays a NARROW (src, dst)
    pair and per-round contributions attach deg on the NODE-sized
    side (deg ⋈ pr, then one edge-sized join) — removing a 2x-edges
    shuffle+sort from the build and a third of the cache bytes.
    (3) The adjacency caches PRE-PARTITIONED on the join key and each
    round's edge join takes a shuffle-hash hint (scale-safe — the
    build side is the node-sized rank table, never broadcast), so no
    round re-sorts or re-shuffles the edge stream. Both the adjacency
    and node-sized deg persist; caller owns both lifetimes (the
    returned plan is lazy over them — module cache contract)."""
    e = edges.select("id_a", "id_b")
    if not assume_distinct:
        e = e.distinct()
    both = e.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        e.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    adj = both.repartition("src").persist()
    # node-sized; computed off the cached adjacency (one scan), then
    # cached itself so the per-round deg ⋈ pr join never re-aggregates
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    n_nodes = deg.count()  # bounded driver scalar; materializes caches
    base = (1.0 - damping) / n_nodes
    # engine round (half-up, matching the SQL oracle), NOT python's
    # banker's round
    pr = deg.select(
        "src",
        F.round(F.lit(1.0) / F.lit(float(n_nodes)), round_digits).alias("pr"),
    )
    for _ in range(iters):
        pr2 = deg.join(pr, "src").select(
            "src", (F.col("pr") / F.col("deg")).alias("c")
        )
        contrib = adj.join(pr2.hint("shuffle_hash"), "src").select("dst", "c")
        pr = (
            contrib.groupBy("dst")
            .agg(
                F.round(
                    F.lit(base) + F.lit(damping) * F.sum("c"), round_digits
                ).alias("pr")
            )
            .select(F.col("dst").alias("src"), "pr")
        )
    return pr.select(F.col("src").alias("v"), "pr")


def label_propagation(
    edges: DataFrame, iters: int = 3, assume_distinct: bool = False
) -> DataFrame:
    """Semi-synchronous label propagation (community detection) on an
    undirected (id_a < id_b) edge list: labels initialize to node ids;
    each round every node adopts the most frequent label among its
    neighbors, ties broken by the smallest label — fully deterministic,
    so the ``iters``-level unrolled SQL oracle reproduces it exactly.
    Same execution contract as :func:`pagerank_undirected`, including
    its round-10 build rework (measured 246 -> ~40 s at native sf1):
    ``assume_distinct`` skips the pair-stream safety ``distinct()``
    for sources that guarantee uniqueness (minhash_lsh_pairs does);
    the adjacency caches narrow and PRE-PARTITIONED on the join key;
    each BSP round is one shuffle-hash edge join (build side = the
    node-sized label table, never the edges) + one keyed count + one
    per-node ARGMAX AGGREGATION — max(struct(c, -label)) replaces the
    former row_number window, so the round needs no per-partition
    sort and combines map-side (identical vote/tie rules: most votes,
    then smallest label; labels are ids >= 0, so the negation is
    exact). Zero driver actions inside the loop; the caller owns the
    adjacency cache (module contract)."""
    e = edges.select("id_a", "id_b")
    if not assume_distinct:
        e = e.distinct()
    if iters <= 0:
        # identity labels — the pre-round-11 iters=0 behavior, which
        # the round-1 fold would otherwise silently absorb into one
        # propagation round (range(iters - 1) is empty for iters <= 1)
        nodes = (
            e.select(F.col("id_a").alias("v"))
            .unionByName(e.select(F.col("id_b").alias("v")))
            .distinct()
        )
        return nodes.select("v", F.col("v").alias("label"))
    adj = (
        e.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            e.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .repartition("src")
        .persist()
    )

    def _argmax(votes: DataFrame) -> DataFrame:
        return (
            votes.groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("v")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select("v", (-F.col("m.nl")).alias("label"))
        )

    # ROUND 1 FOLDED (round 11): labels initialize to node ids, so the
    # first round's vote stream IS the adjacency itself (neighbor's
    # label == neighbor's id) — no node-extraction distinct() and no
    # edge-sized join for round 1; coverage is identical because every
    # node appears as dst of the symmetric adjacency. Saves one full
    # adjacency scan + one edge join per run (~15% of the sf1 wall).
    #
    # ROUND 1 DEGENERATE ARGMAX (round 13, guide §1.2 "the
    # distributed algorithm" + §2.3 aggregate-before-shuffle): in
    # round 1 every vote a node receives is DISTINCT (its neighbors'
    # ids — the edge list is distinct pairs), so every label has
    # count 1 and the most-frequent-then-smallest rule collapses to
    # plain min(neighbor id). The generic argmax paid the worst-case
    # round for nothing: with all-distinct votes the per-(v, label)
    # count reduces NOTHING map-side, ships the full edge-sized
    # stream, and the struct-max (not hash-aggregable — struct agg
    # buffers are not mutable) SORTS it twice in SortAggregates.
    # min() is a plain hash aggregate with effective partial
    # reduction (node-sized after the map side). Identical labels by
    # the vote rule itself; the unrolled SQL oracle — which keeps the
    # full argmax for round 1 — hash-matches (checked this round).
    labels = adj.groupBy(F.col("dst").alias("v")).agg(
        F.min("src").alias("label")
    )
    for _ in range(iters - 1):
        labels = _argmax(
            adj.join(
                labels.withColumnRenamed("v", "src").hint("shuffle_hash"),
                "src",
            ).select(F.col("dst").alias("v"), "label")
        )
    return labels


def _free_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's backing blocks NOW. Dataset.unpersist
    only covers CacheManager entries; a checkpointed frame's storage
    hangs off its LogicalRDD leaf and is otherwise freed only when the
    ContextCleaner GCs the RDD handle — nondeterministic, and the
    k-core sweep contract is 'live set = {cur, removed}' at every
    point. Best-effort: a non-checkpointed frame is a no-op."""
    try:
        plan = df._jdf.queryExecution().logical()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:  # pragma: no cover — GC fallback still applies
        pass


def kcore_membership(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman 1983's degeneracy cores,
    run as ``rounds`` synchronous Matula–Beck peel sweeps) on an
    undirected (id_a, id_b) edge list: every sweep deletes ALL nodes
    whose remaining degree is < ``k`` at once, so after R sweeps
    exactly the nodes whose peel depth exceeds R survive. On near-dup
    candidate graphs (unions of near-cliques from banded LSH) peeling
    converges in 1–2 sweeps — the loosely-attached bridge documents
    fall out and the dense template cores remain, which is the graph
    signal that separates "shares one hash band by luck" from "lives
    in a boilerplate clique". Adversarial chains peel one layer per
    sweep; ``rounds`` caps that (a path needs ~n/2 sweeps to empty),
    and because the sweep schedule is part of the operator's contract,
    the ``rounds``-level unrolled SQL oracle reproduces the exact
    output even when peeling has not converged.

    Returns (node, core_deg): survivors of the R-th sweep with their
    degree inside the surviving subgraph (core_deg >= k iff another
    sweep would keep the node — callers can read convergence off the
    result: no row below k means a fixed point was reached).

    Scale shape: the symmetric adjacency persists once; each sweep is
    ONE degree aggregation (map-side combine on the node key) + two
    anti-joins of the adjacency against the (small, AQE-broadcast)
    REMOVED node set. The only driver action in the loop is a
    bounded emptiness scalar that detects the fixed point — stopping
    there returns exactly the scheduled-rounds result, since every
    further sweep is a no-op. No global sort, no windows; the node
    set shrinks monotonically so later sweeps cost less, not more.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    e = edges.select("id_a", "id_b")
    if not assume_distinct:
        e = e.distinct()
    adj = (
        e.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            e.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .persist()
    )
    # Round-9 structure: the frontier is always ADJ MINUS A CUMULATIVE
    # REMOVED SET, never a chain of per-sweep frames. A chained
    # frontier references the previous sweep three times (directly,
    # and twice through `removed`), so its logical plan grows
    # 3^sweeps references to the upstream pair pipeline — four sweeps
    # over the capped-LSH plan overflowed the driver heap just
    # RENDERING the tree — and checkpointing the 400M-row frontier
    # instead pinned unEVICTABLE storage that starved execution
    # memory at native sf1. Here the only checkpoint is the CUMULATIVE
    # REMOVED SET — whisker nodes, a small fraction of the graph —
    # truncated per sweep (eager, tiny job), while each sweep's
    # frontier re-derives from the ONE persisted adjacency via two
    # anti-joins against that small (AQE-broadcast) set: plan growth
    # is linear in sweeps, storage is one evictable recomputable
    # cache plus one small leaf.
    cur = adj
    removed_cum = None
    prev_cum = None
    for _ in range(rounds):
        removed = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") < k)
            .select("src")
            .persist()
        )
        empty = removed.isEmpty()  # also materializes adj's cache
        if empty:
            # fixed point: every further sweep is a no-op, so stopping
            # here returns EXACTLY the scheduled-rounds result (the
            # oracle's unrolled schedule is unchanged). One tiny
            # driver scalar per sweep — the peel usually converges in
            # 1-2 sweeps, so this halves the sweep stages in practice.
            removed.unpersist()
            break
        removed_cum = (
            removed
            if removed_cum is None
            else removed_cum.unionByName(removed)
        ).localCheckpoint(eager=True)
        removed.unpersist()
        if prev_cum is not None:
            _free_local_checkpoint(prev_cum)
        prev_cum = removed_cum
        cur = adj.join(removed_cum, "src", "left_anti").join(
            removed_cum.withColumnRenamed("src", "dst"), "dst", "left_anti"
        )
    # the final frontier is lazy over the persisted adjacency and the
    # last (small) checkpointed removed set — the caller's action
    # reads the cache; adj's lifetime is caller-owned after that, the
    # pagerank_undirected contract (one bounded, LRU-evictable cache).
    return cur.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    ).select(F.col("src").alias("node"), "core_deg")
