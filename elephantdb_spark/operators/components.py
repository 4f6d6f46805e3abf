"""Connected components over near-duplicate pair graphs — the dedup
endgame: pair detectors (Jaccard / MinHash-LSH / SimHash / embedding)
emit edges, components turn edges into clusters, and the corpus keeps one
representative per cluster.

Algorithm: hash-min label propagation (the standard distributed CC
scheme: every node repeatedly adopts the minimum label in its closed
neighborhood until fixpoint), accelerated with pointer jumping (each
round also adopts the label's own label, halving label-chain depth — so
rounds scale with log(diameter), not diameter). Each round is two joins
+ a map-side-combinable min-aggregation — all DataFrame ops, shuffling
only (node, label) pairs, never documents; every round's result is
``localCheckpoint``-ed to truncate the otherwise-exponential iterative
plan lineage. Convergence is detected by the monotone label sum (labels
only ever decrease, so an unchanged exact-decimal sum IS the fixpoint) —
one scalar aggregate per round, no new-vs-old join and no collect of
data; ``max_iter`` bounds pathology.

At 100 TB: the edge set is the output of an LSH-style detector —
proportional to true duplicates, orders of magnitude smaller than the
corpus — and labels are 16-byte (id, label) rows. A celebrity component
(boilerplate cluster) degrades to its diameter in rounds, not to a
single-task straggler: every round's join and agg stay fully parallel.
The final keep-set anti-joins back into the corpus via a broadcast (the
duplicate set is detector-bounded), so the corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _label_sum(labels: DataFrame):
    """Exact decimal sum of all labels (the monotone convergence metric)."""
    return labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster an undirected edge list into connected components.

    Returns (``node``, ``cluster``) for every node appearing in
    ``pairs``, where ``cluster`` is the component's minimum node id —
    deterministic, engine-independent. Self-loops and duplicate edges
    are harmless.

    Raises ``RuntimeError`` if ``max_iter`` rounds don't reach the
    fixpoint (diameter > max_iter — not a near-dup-graph shape).
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
    )
    edges.persist()
    try:
        # label := min(self, neighbors) each round, starting from self.
        # localCheckpoint (NOT persist) each round: an iterative chain of
        # joins otherwise compounds the logical plan exponentially —
        # round 20's plan embeds rounds 1..19 and planning itself OOMs.
        # Checkpointing truncates lineage to the materialized result.
        labels = (
            edges.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("label"))
            .localCheckpoint(eager=True)
        )
        # initial sum taken here, once — each round then adds exactly one
        # scalar aggregate (the r3 shape computed it twice on round one)
        prev_sum = _label_sum(labels)
        for _ in range(max_iter):
            # hash-min step: adopt the minimum label in the neighborhood
            nbr = (
                edges.join(labels.withColumnRenamed("u", "v"), "v")
                .groupBy("u")
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = labels.join(nbr, "u", "left").select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            # pointer-jumping step: adopt the label's own label, halving
            # label-chain depth — convergence in O(log diameter) rounds
            # instead of O(diameter)
            jump = stepped.select(
                F.col("u").alias("j_u"), F.col("label").alias("j_label")
            )
            new_labels = (
                stepped.join(jump, stepped["label"] == jump["j_u"], "left")
                .select(
                    "u",
                    F.least(
                        F.col("label"), F.coalesce("j_label", F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            # convergence: labels only ever DECREASE (every update is a
            # least()), so fixpoint ⟺ the label sum is unchanged. A
            # scalar aggregate over the checkpointed frame — no
            # per-round join of new-vs-old labels (an O(nodes) shuffle
            # at cluster scale). Decimal sum: exact, overflow-free.
            new_sum = _label_sum(new_labels)
            old_sum = prev_sum
            prev_sum = new_sum
            labels = new_labels
            if new_sum == old_sum:
                return labels.select(
                    F.col("u").alias("node"), F.col("label").alias("cluster")
                )
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        edges.unpersist()


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "a",
    b_col: str = "b",
    broadcast_drop: bool = True,
) -> DataFrame:
    """Keep one document per near-dup cluster (the minimum id) plus every
    document not in any pair. The drop-set (cluster members minus reps)
    is detector-bounded, so by default it broadcasts into the anti-join
    and the corpus never shuffles. That bound is heuristic: a
    high-duplication corpus can make the drop-set billions of ids, past
    Spark's 8 GB broadcast limit — pass ``broadcast_drop=False`` to fall
    back to a shuffled anti-join (the corpus shuffles once on the id)."""
    comps = connected_components(pairs, a_col, b_col)
    drop = comps.filter(F.col("node") != F.col("cluster")).select(
        F.col("node").alias(id_col)
    )
    if broadcast_drop:
        drop = F.broadcast(drop)
    return df.join(drop, id_col, "left_anti")
