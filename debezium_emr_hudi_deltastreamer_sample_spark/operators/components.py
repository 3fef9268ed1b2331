"""Distributed connected components — cluster assignment for near-dup
groups (every member of a duplicate cluster gets the cluster's min id).

Iterative min-label propagation on DataFrames: each round every vertex
takes the min label among itself and its neighbors; convergence when no
label changes. Rounds needed = component diameter — for dedup graphs
(many tiny clusters) that is 2-3, so the simple algorithm beats the
O(log n)-round star-contraction variants on constant factors while
staying fully distributed (each round is one shuffle-join + one
aggregation; the only driver-side value is the changed-count scalar).

Scale notes: `localCheckpoint` after every round truncates the lineage —
without it the plan doubles per iteration and planning dominates by round
~10. For graphs with large-diameter components (not the dedup shape),
switch to alternating large-star/small-star contraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) for an undirected graph; component = min vertex
    id reachable. ``vertices``: one column ``id_col``; ``edges``: pairs
    (undirected — both directions are derived here).

    Returns DataFrame[id_col, component]. Raises if not converged within
    ``max_iter`` rounds (diameter bound exceeded — wrong algorithm for
    that graph, see module docstring).
    """
    bidir = (
        edges.select(F.col(src_col).alias("v"), F.col(dst_col).alias("n"))
        .union(edges.select(F.col(dst_col).alias("v"), F.col(src_col).alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_labels = bidir.join(labels, "v").select(
            F.col("n").alias("v"), "label"
        )
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("nw"), "v")
            .filter(F.col("o.label") != F.col("nw.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("v").alias(id_col), F.col("label").alias("component")
            )
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def pagerank_fixed(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list (src, dst) —
    the second iterative distributed algorithm next to
    ``connected_components``, and the standard importance prior for
    near-dup cluster representatives / crawl frontier ordering.

    Deterministic by construction: a FIXED iteration count (no
    convergence test, so any engine replays it exactly), dangling vertices
    keep only the teleport term, and each iteration is one
    shuffle-on-dst + one join back to degrees. At 100 TB the edge list
    shuffles on the same key every round — pre-partitioning/bucketing by
    vertex id makes every iteration after the first shuffle-free.
    """
    n = vertices.count()
    both = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranks = vertices.select(
        F.col(id_col).alias("u"), F.lit(1.0 / n).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            both.join(ranks, "u")
            .join(deg, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            vertices.select(F.col(id_col).alias("u"))
            .join(contrib, "u", "left_outer")
            .select(
                "u",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select(F.col("u").alias(id_col), "rank")
