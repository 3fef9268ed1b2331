"""Distributed iterative graph algorithms — connected components (cluster
assignment for near-dup groups) and fixed-iteration PageRank.

Iterative min-label propagation on DataFrames: each round every vertex
takes the min label among itself and its neighbors; convergence when no
label changes. Rounds needed = component diameter — for dedup graphs
(many tiny clusters) that is 2-3, so the simple algorithm beats the
O(log n)-round star-contraction variants on constant factors while
staying fully distributed.

Shuffle design (the 100 TB story): every join and aggregation in an
iteration keys on the vertex id, so the edge list should shuffle ONCE,
not once per round. Two mechanisms deliver that here:

- Within a single lazy multi-round query (`pagerank_fixed`, and each
  round-batch of `connected_components`), the edge list carries ONE
  explicit ``repartition(p, key)``; Catalyst's ReuseExchange (and AQE's
  stage reuse at runtime) materializes that shuffle once and every
  round's join reads the same shuffle output — the plan shows one
  Exchange plus ReusedExchange references (pinned in tests/test_plans).
- Across queries (convergence checks need an action), rounds are BATCHED:
  `connected_components` runs ``batch_rounds`` propagation rounds inside
  one lazy plan before checkpointing + counting changes, amortizing the
  edge shuffle and the per-action overhead over the batch.

`localCheckpoint` between batches truncates the lineage — without it the
plan doubles per round (labels appear twice per round) and planning
dominates by round ~10. Note checkpointing does NOT preserve partitioning
metadata under AQE (measured: LogicalRDD reports UnknownPartitioning), so
the in-plan repartition — not the checkpoint — is what carries the
co-partitioning. On a real cluster the same effect comes from bucketing
the edge table by vertex id. For graphs with large-diameter components
(not the dedup shape), switch to alternating large-star/small-star
contraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shuffle_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def _prehash(df: DataFrame, key: str, partitions: int) -> DataFrame:
    """One explicit hash-partition on the iteration key. Kept LAZY on
    purpose: downstream joins/aggregations on ``key`` inside the same
    query all hang off this single Exchange, which ReuseExchange (static
    plans) and AQE stage reuse (runtime) materialize exactly once — the
    DataFrame equivalent of bucketing the edge list by vertex id. An
    explicit user repartition is also exempt from AQE partition
    coalescing, so the partition count stays aligned across rounds."""
    return df.repartition(partitions, key)


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    batch_rounds: int = 2,
) -> DataFrame:
    """(vertex, component) for an undirected graph; component = min vertex
    id reachable. ``vertices``: one column ``id_col``; ``edges``: pairs
    (undirected — both directions are derived here).

    Rounds run in lazy batches of ``batch_rounds``: one Spark action per
    batch (checkpoint + changed-count) instead of per round, with the
    edge-list shuffle reused across the batch's joins. Min-label
    propagation is monotone (labels only decrease), so comparing labels
    at batch boundaries detects any change made by an inner round.

    Returns DataFrame[id_col, component]. Raises if not converged within
    ``max_iter`` rounds (diameter bound exceeded — wrong algorithm for
    that graph, see module docstring).
    """
    if batch_rounds < 1:
        # Zero inner rounds would compare the labels against themselves,
        # read changed == 0 as convergence, and return the IDENTITY
        # labeling (every vertex its own component) — silently wrong on
        # any connected graph.
        raise ValueError(f"batch_rounds must be >= 1, got {batch_rounds}")
    p = _shuffle_partitions(vertices)
    bidir = _prehash(
        edges.select(F.col(src_col).alias("v"), F.col(dst_col).alias("n"))
        .union(edges.select(F.col(dst_col).alias("v"), F.col(src_col).alias("n")))
        .distinct(),
        "v",
        p,
    ).localCheckpoint(eager=True)
    # Vertex universe = declared vertices ∪ edge endpoints: an endpoint
    # missing from `vertices` would otherwise receive labels but never
    # propagate its OWN id back, yielding non-minimal components and
    # phantom output rows (review-pinned: vertices={5}, edges={(5,3)}
    # must converge to component 3 for both).
    universe = (
        vertices.select(F.col(id_col).alias("v"))
        .union(bidir.select("v"))
        .distinct()
    )
    labels = (
        universe.select("v", F.col("v").alias("label"))
        .localCheckpoint(eager=True)
    )
    # The checkpointed edge list lost its partitioning metadata (module
    # docstring) — re-declare it once; every batch reuses this one node.
    bidir = _prehash(bidir, "v", p)

    rounds_done = 0
    while rounds_done < max_iter:
        new_labels = labels
        for _ in range(min(batch_rounds, max_iter - rounds_done)):
            # bidir ⋈ labels joins hang off bidir's single Exchange; the
            # one new shuffle per round is the min-label groupBy (labels
            # flow n→v, re-clustering on the destination vertex).
            neighbor_labels = bidir.join(new_labels, "v").select(
                F.col("n").alias("v"), "label"
            )
            new_labels = (
                new_labels.union(neighbor_labels)
                .groupBy("v")
                .agg(F.min("label").alias("label"))
            )
            rounds_done += 1
        new_labels = new_labels.localCheckpoint(eager=True)
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
    dedup_edges: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list (src, dst) —
    the second iterative distributed algorithm next to
    ``connected_components``, and the standard importance prior for
    near-dup cluster representatives / crawl frontier ordering.

    Deterministic by construction: a FIXED iteration count (no
    convergence test, so any engine replays it exactly), dangling vertices
    keep only the teleport term.

    Shuffle shape: the whole ``iterations``-round computation is ONE lazy
    query; the edge list and vertex set each carry one explicit
    ``repartition`` on the vertex key, so every per-round join reuses
    those two shuffles (ReuseExchange / AQE stage reuse) and the only new
    shuffle per round is the inherent message-passing groupBy that moves
    contributions from u-partitioning to v-partitioning (plan pinned in
    tests/test_plans.py). Each round re-joins the static ``deg`` frame to
    rebuild ``share`` = rank/deg — that join is co-partitioned on u (no
    exchange), so it adds join CPU but no shuffle; folding deg into the
    state would not remove it, because the contrib aggregate arrives as
    its own frame and needs the same join-back either way.
    """
    n = vertices.count()
    if n == 0:
        # Empty graph → empty ranks (1/n teleport is undefined), with the
        # same output schema the normal path produces.
        return vertices.select(F.col(id_col), F.lit(0.0).alias("rank")).limit(0)
    p = _shuffle_partitions(vertices)
    e = edges.select(F.col("src").alias("src"), F.col("dst").alias("dst")).filter(
        F.col("src") != F.col("dst")  # self-loops carry no rank anywhere
    )
    if dedup_edges:
        # Canonicalize orientation then dedup: duplicate input pairs (or
        # the same edge in both orientations) would inflate degrees and
        # skew every rank. One (src,dst) exchange; callers whose edge
        # source is PROVABLY distinct-and-oriented (the LSH candidate
        # pairs: aid < bid, distinct) pass dedup_edges=False to keep the
        # 3-exchange iteration plan pinned in tests/test_plans.py.
        e = (
            e.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            ).distinct()
        )
    both = _prehash(
        e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
            e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        ),
        "u",
        p,
    )
    # Input already HashPartitioning(u, p) → partial+final agg with no
    # Exchange; join back to verts is likewise co-partitioned.
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    verts = _prehash(vertices.select(F.col(id_col).alias("u")), "u", p)
    # State = (u, rank, share=rank/deg): dangling vertices get share 0.0
    # (coalesced — NULL deg would otherwise make share NULL, which is only
    # accidentally safe while dangling ids never appear in `both`; a
    # future aggregate over share, e.g. a total-mass check, must not
    # inherit NULL poison) and contribute nothing — "teleport-only".
    state = verts.join(deg, "u", "left_outer").select(
        "u",
        F.lit(1.0 / n).alias("rank"),
        F.coalesce(F.lit(1.0 / n) / F.col("deg"), F.lit(0.0)).alias("share"),
    )
    for _ in range(iterations):
        contrib = (
            both.join(state.select("u", "share"), "u")
            .groupBy(F.col("v").alias("u"))
            .agg(F.sum("share").alias("inflow"))
        )
        rank = F.lit((1.0 - damping) / n) + F.lit(damping) * F.coalesce(
            F.col("inflow"), F.lit(0.0)
        )
        state = (
            verts.join(contrib, "u", "left_outer")
            .join(deg, "u", "left_outer")
            .select(
                "u",
                rank.alias("rank"),
                F.coalesce(rank / F.col("deg"), F.lit(0.0)).alias("share"),
            )
        )
    return state.select(F.col("u").alias(id_col), "rank")
