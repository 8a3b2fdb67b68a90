"""Connected components over pair edges — dedup *group* assignment.

The dedup operators (operators/dedup.py, operators/similarity.py)
emit near-duplicate PAIRS; a training pipeline needs the transitive
closure of those pairs — duplicate GROUPS — so it can keep one
canonical document per group. That closure is connected components.

Implementation: distributed min-label propagation. Every node starts
labeled with itself; each round pushes labels across edges and keeps
the minimum; a fixpoint (detected by the invariant sum of labels — a
min-propagation label can only decrease, so an unchanged sum IS the
fixpoint) means every node carries its component's minimum id.

Scale: each round is one equi-join (edges ⋈ labels, both shuffled on
the join key) + one groupBy — AQE-planned, no driver data. Rounds =
graph diameter; LSH dup graphs are unions of near-cliques, so 2-4
rounds in practice, with ``max_iter`` as the guard. For adversarial
long-chain graphs swap the body for large-star/small-star (same loop
shape, fewer rounds); labels are persisted per round and the previous
round unpersisted, so memory stays one labels-frame regardless of
round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, comp) for every node in ``edges``; ``comp`` is the
    smallest node id in the component (deterministic, engine-portable
    — the DuckDB oracle reproduces it with a recursive closure)."""
    # the edge list is consumed once per round — persist it, or the
    # whole upstream pair computation (minhash, cosine, ...) re-runs
    # every iteration
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )
    try:
        # init fuses the first propagation round: node's starting label
        # is min(self, direct neighbors) from one groupBy — the
        # distinct-then-join round this replaces cost a full iteration
        labels = (
            sym.groupBy("a")
            .agg(F.min("b").alias("_mb"))
            .select(
                F.col("a").alias("node"),
                F.least(F.col("a"), F.col("_mb")).alias("comp"),
            )
            .persist()
        )
        prev_sum = labels.agg(F.sum("comp")).first()[0]
        for _ in range(max_iter):
            # one propagation hop across edges...
            msgs = sym.join(
                labels, sym["a"] == labels["node"]
            ).select(F.col("b").alias("node"), F.col("comp"))
            prop = (
                labels.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
            )
            # ...then a pointer-jump (path halving): comp ← comp's
            # comp. Propagation alone needs diameter rounds (a chain
            # of pairwise near-dups is worst-case linear); the jump
            # compresses label chains geometrically, so chains finish
            # in O(log diameter) rounds while cliques still finish in
            # 2-3.
            x, y = prop.alias("x"), prop.alias("y")
            # localCheckpoint (eager) truncates lineage every round —
            # the self-join otherwise doubles the logical plan per
            # iteration (exponential analysis cost / stack overflow).
            # This is the one legitimate localCheckpoint in the
            # engine: iterative algorithms need bounded plans, and
            # the checkpointed frame is the node-sized label table,
            # not data.
            new = (
                x.join(y, F.col("x.comp") == F.col("y.node"), "left")
                .select(
                    F.col("x.node").alias("node"),
                    F.least(
                        F.col("x.comp"),
                        F.coalesce(F.col("y.comp"), F.col("x.comp")),
                    ).alias("comp"),
                )
                .localCheckpoint()
            )
            cur_sum = new.agg(F.sum("comp")).first()[0]
            labels.unpersist()
            labels = new
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        return labels
    finally:
        sym.unpersist()


def dedup_groups(
    pairs: DataFrame,
    id_col: str = "id_a",
    other_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup pairs → (doc_id, group_id): transitive duplicate
    groups keyed by their minimum member. Downstream keeps
    ``doc_id == group_id`` rows (the canonical representative) and
    drops the rest."""
    cc = connected_components(pairs, id_col, other_col, max_iter)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("group_id")
    )
