"""Similarity search over embedding columns (BASELINE.json north star):
brute-force cosine top-k as the exactness baseline, LSH-bucketed
(random-hyperplane) top-k as the 100 TB path.

Scale design:
- Vector math runs in Arrow-vectorized pandas UDFs (numpy matmul per
  batch), NOT SQL higher-order functions: HOF lambdas are interpreted
  per-element (no codegen), and inlining a 12×64 hyperplane matrix as
  array literals bloats the plan until driver-side planning dominates.
  A pandas_udf keeps the plan tiny and the math BLAS-speed — this is the
  "UDFs are the slow path, except vectorized Arrow ones" tradeoff.
- Brute force = broadcast(queries) ⋈ candidates: the fact-side embedding
  table never shuffles. Cost O(|Q|·N) — right for small query sets or as
  the oracle.
- LSH = R random hyperplanes → R-bit signature → bucket join on signature
  band. Candidates per query drop from N to ~N/2^band_bits per band; exact
  cosine re-ranks candidates. Hyperplanes are generated once on the driver
  from a fixed seed and shipped inside the UDF closure (tiny: R×dim
  floats).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_LOG = logging.getLogger(__name__)

# Cosine threshold at/above which `embedding_neardup_pairs` treats a
# multiprobe request as a BUDGET and decays it with band width (dedup-regime
# pairs are near-collinear, so plain banding already catches them); below it
# (graph-analytics regime) the full requested budget is honored at every
# width. Measured at sf1, 8-bit bands: probes bought +2.9% pairs at 0.46 for
# 3.6× join mass, but +41% true edges at 0.35.
DEDUP_PROBE_DECAY_THRESHOLD = 0.4


def norm_col(vec: Column) -> Column:
    """JVM-side L2 norm (used by aggregation queries where the plan is
    small and a UDF would force an extra Arrow hop)."""
    return F.sqrt(
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


# NB: DataType objects, not DDL strings — string return types are parsed
# through the active SparkContext, which doesn't exist at import time.
@pandas_udf(T.DoubleType())
def _cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched cosine similarity between two array columns (Arrow in/out).
    np.stack turns the batch into (n, dim) matrices → one BLAS pass."""
    av = np.stack(a.to_numpy()).astype("float64")
    bv = np.stack(b.to_numpy()).astype("float64")
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(np.where(den > 0, num / den, 0.0))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    Returns (qid, cid, sim) — ties broken by cid for determinism.
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    c = embeddings.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("ce"))
    pairs = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .withColumn("sim", _cosine_sim("qe", "ce"))
        .select("qid", "cid", "sim")
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def _signature_udf(n_planes: int, seed: int, dim: int, with_margins: bool = False):
    planes = _hyperplanes(dim, n_planes, seed).T  # (dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype("int64")

    if with_margins:

        @pandas_udf("struct<sig:bigint,margins:array<float>>")
        def sigm(vec: pd.Series) -> pd.DataFrame:
            v = np.stack(vec.to_numpy()).astype("float64")  # (n, dim)
            proj = v @ planes  # (n, n_planes)
            return pd.DataFrame(
                {
                    "sig": (proj > 0) @ weights,
                    "margins": list(np.abs(proj).astype("float32")),
                }
            )

        return sigm

    @pandas_udf(T.LongType())
    def sig(vec: pd.Series) -> pd.Series:
        v = np.stack(vec.to_numpy()).astype("float64")  # (n, dim)
        bits = (v @ planes) > 0  # (n, n_planes)
        return pd.Series(bits @ weights)

    return sig


def with_lsh_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    dim: int = 64,
    margins: bool = False,
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · plane_i), packed into
    one long `lsh_sig` (n_planes ≤ 63). One matmul per Arrow batch.
    ``margins=True`` also keeps |v · plane_i| per plane (`lsh_margins`,
    float32) — the per-bit confidence that margin-aware multiprobe flips
    on; same matmul, no extra pass."""
    if margins:
        return (
            df.withColumn(
                "_s", _signature_udf(n_planes, seed, dim, True)(F.col(vec_col))
            )
            .select(
                "*",
                F.col("_s.sig").alias("lsh_sig"),
                F.col("_s.margins").alias("lsh_margins"),
            )
            .drop("_s")
        )
    return df.withColumn("lsh_sig", _signature_udf(n_planes, seed, dim)(F.col(vec_col)))


def _kmeans_fit_sample(
    embeddings: DataFrame,
    vec_col: str,
    nlist: int,
    seed: int,
    max_iter: int,
    sample_size: int = 50_000,
    n: int | None = None,
) -> np.ndarray:
    """Coarse-quantizer training, the IVF way: k-means++ on a bounded
    driver-side sample, pure numpy. At 100 TB you never fit on the full
    table — a fixed-size sample bounds driver memory and fit cost no matter
    how big the table is, and Lloyd's on (sample × dim) is one BLAS-bound
    loop instead of ``max_iter`` distributed jobs (the Spark ML KMeans
    version spent ~8 s of pure job-scheduling overhead on a 2000-row
    fixture). Returns (nlist, dim) centroids — tiny, shipped in UDF
    closures. ``n``: pass the table's row count if the caller already
    ran it (semantic_dedup_report sizes k from the same count) — saves a
    full-table count job per fit."""
    frac = min(1.0, sample_size / max(1, n if n is not None else embeddings.count()))
    # Arrow path (toPandas), not Row collect: same rows in the same
    # partition order, but the 64-float arrays cross as Arrow buffers
    # instead of per-element Python objects (~3x faster at the 50k cap).
    pdf = embeddings.sample(fraction=frac, seed=seed).select(vec_col).toPandas()
    if len(pdf) == 0:
        raise ValueError(
            "k-means fit needs at least one embedding vector; the input "
            "table (or its sample) is empty"
        )
    v = np.stack([np.asarray(a, dtype="float64") for a in pdf[vec_col].to_numpy()])
    # Spherical: the ranking metric is cosine, so cells must partition
    # DIRECTIONS, not positions — cluster L2-normalized vectors (assignment
    # normalizes identically), else long/short vectors of the same
    # direction land in different cells and recall craters.
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)

    # Distance math note: everything in this fit is unit-norm, so
    # ‖x−c‖² = 2−2·x·c exactly — every distance below is ONE BLAS product
    # with no (n, k, dim) broadcast temporary and no |x|²/|c|² (n, k)
    # temporaries either. History of this hot spot: the naive broadcast
    # form measured 318 s for one fit at 20k×78; the |x|²−2x·c+|c|² form
    # fixed that but still materialized five (n, k) float64 temporaries
    # (~8 GB of memory traffic per Lloyd iteration at the 50k×4096
    # ceiling, 23 s measured — tools/semdedup_ceiling.py).

    def one_fit(rng: np.random.Generator) -> tuple[float, np.ndarray]:
        # k-means++ seeding with the min-distance maintained INCREMENTALLY
        # (only the newest centroid's distances per step — O(n·dim), not
        # O(n·k·dim)); draw sequence identical to the textbook form.
        # Everything here is unit-norm (v by construction, seeds are data
        # rows), so ‖v−c‖² = 2−2·v·c — a BLAS matvec with NO (n, dim)
        # subtraction temporary per step. At the structural ceiling
        # (50k × k=4096, tools/semdedup_ceiling.py) the subtraction form
        # spent 34 s of pure memory traffic on seeding alone.
        seeds = [v[rng.integers(len(v))]]
        d2 = np.maximum(2.0 - 2.0 * (v @ seeds[0]), 0.0)
        for _ in range(1, nlist):
            p = d2 / d2.sum() if d2.sum() > 0 else None
            c = v[rng.choice(len(v), p=p)]
            seeds.append(c)
            d2 = np.minimum(d2, np.maximum(2.0 - 2.0 * (v @ c), 0.0))
        centroids = np.stack(seeds)
        for _ in range(max_iter):
            # Unit-norm v AND centroids: Euclidean argmin ≡ cosine argmax,
            # so assignment is ONE matmul + argmax — the dists() form
            # materializes five (n, k) float64 temporaries (~8 GB of
            # memory traffic at the ceiling, 23 s per iteration measured).
            assign = (v @ centroids.T).argmax(axis=1)
            # Cell means via per-dim bincount — one O(n) pass per dim
            # instead of nlist boolean-mask scans (4096 Python-loop mask
            # reductions cost ~0.9 s/iteration at the ceiling; this is
            # ~30 ms). Empty cells keep their previous centroid, exactly
            # like the mask form did.
            counts = np.bincount(assign, minlength=nlist)
            sums = np.stack(
                [
                    np.bincount(assign, weights=v[:, d], minlength=nlist)
                    for d in range(v.shape[1])
                ],
                axis=1,
            )
            new = np.where(
                counts[:, None] > 0,
                sums / np.maximum(counts, 1)[:, None],
                centroids,
            )
            # Spherical k-means proper: re-normalize the means every
            # iteration. With unit-norm data AND unit-norm centroids,
            # Euclidean argmin ≡ cosine argmax, so the fit's own
            # assignment, kmeans_assign, and the IVF probe ranking all
            # order cells identically — a non-unit Lloyd mean would make
            # the |c|² term silently shift probe sets between consumers.
            new = new / np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
            if np.allclose(new, centroids):
                break
            centroids = new
        # Same unit-norm identity: min ‖v−c‖² = 2 − 2·max cos.
        inertia = float(
            np.maximum(2.0 - 2.0 * (v @ centroids.T).max(axis=1), 0.0).sum()
        )
        return inertia, centroids

    # Lloyd's converges to local optima; a few seeded restarts on the
    # in-memory sample buy back the quantizer quality an iterative
    # distributed fit would get from k-means|| init. Restarts matter when
    # k is SMALL (one bad seed ruins a 16-cell quantizer); at large k the
    # law of large numbers over k++ seeds makes single-fit quality stable
    # while the O(sample*k) seeding loop becomes the dominant fit cost —
    # so scale restarts down instead of paying 4x for nothing (measured:
    # 2.4 s -> 0.6 s at k=78 on the 20k-row sf1 fixture, recall flat).
    restarts = 4 if nlist <= 16 else 1
    fits = [one_fit(np.random.default_rng(seed + i)) for i in range(restarts)]
    return min(fits, key=lambda t: t[0])[1]


def _topn_cells(sims: np.ndarray, na: int) -> np.ndarray:
    """Deterministic top-``na`` centroid indices per row, nearest first.
    ``na`` successive argmax passes (ties → first occurrence, identical
    to plain argmax) — O(k · na) per row, NOT the O(k log k) full argsort
    whose cost scales with exactly the axis (large capped k) the callers
    are bounding."""
    s = sims.copy()
    rows = np.arange(len(s))
    cols = []
    for _ in range(na):
        j = s.argmax(axis=1)
        cols.append(j)
        s[rows, j] = -np.inf
    return np.stack(cols, axis=1).astype("int32")


def _multi_assign_udf(centroids: np.ndarray, na: int):
    """Shared fit-free assigner: normalize the Arrow batch, one BLAS
    matmul against the (k, dim) closure-shipped centroids, emit the
    ``na`` nearest cell ids (nearest first) and the matching cosines.
    Single source of truth for kmeans_assign (na=1) and the SemDeDup
    multi-assignment — norm guards, dtype, and tie behavior cannot
    drift apart."""

    @F.pandas_udf("struct<cells:array<int>,coss:array<double>>")
    def assign(vec: pd.Series) -> pd.DataFrame:
        # float64 like every other vector UDF here (_cosine_sim,
        # _signature_udf): a float32-stored embedding column must see the
        # same near-tie cell ranking the float64 driver-side fit saw.
        m = np.stack(vec.to_numpy()).astype("float64")
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ centroids.T
        top = _topn_cells(sims, na)
        rows = np.arange(len(top))[:, None]
        return pd.DataFrame(
            {"cells": list(top), "coss": list(sims[rows, top])}
        )

    return assign


def kmeans_assign(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 7,
    max_iter: int = 8,
) -> DataFrame:
    """Spherical k-means assignment at scan speed: fit ``k`` centroids on a
    bounded driver sample (`_kmeans_fit_sample` — never the full table),
    ship the tiny (k, dim) array in Arrow pandas_udf closures, and tag
    every row with its nearest-by-cosine ``cluster_id`` plus the cosine to
    that centroid (``cluster_cos``, the per-row cohesion). One pass, one
    vectorized matmul per Arrow batch, no iteration over the full table —
    the cost profile that survives 100 TB."""
    centroids = _kmeans_fit_sample(
        embeddings, vec_col, nlist=k, seed=seed, max_iter=max_iter
    )
    assign = _multi_assign_udf(centroids, 1)
    return embeddings.withColumn("_kc", assign(vec_col)).select(
        "*",
        F.col("_kc.cells")[0].alias("cluster_id"),
        F.col("_kc.coss")[0].alias("cluster_cos"),
    ).drop("_kc")


def _semantic_cells(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nassign: int,
    seed: int,
    max_iter: int = 8,
    n: int | None = None,
) -> DataFrame:
    """One assignment scan for SemDeDup: adds ``cells`` (the ``nassign``
    nearest centroids, nearest first — cells[0] is the primary/reporting
    cell) and the matching ``coss`` cosines, so downstream chunking can
    order each cell's members by cohesion to THAT cell's centroid (a
    secondary member sorted by its primary-cell cosine would break
    near-identical adjacency in shared cells)."""
    centroids = _kmeans_fit_sample(
        embeddings, vec_col, nlist=k, seed=seed, max_iter=max_iter, n=n
    )
    na = max(1, min(int(nassign), len(centroids)))
    assign = _multi_assign_udf(centroids, na)
    return embeddings.withColumn("_kc", assign(vec_col)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_kc.cells").alias("cells"),
        F.col("_kc.coss").alias("coss"),
    )


def semantic_dedup_report(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.46,
    target_cell: int = 256,
    cell_cap: int = 512,
    k_max: int = 4096,
    nassign: int = 2,
    seed: int = 7,
    lsh_reprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) as a bounded
    two-level plan: k-means-cluster the embedding directions, then prune
    every vector whose cosine to a LOWER-id vector sharing one of its
    cells is ≥ ``threshold``. Returns one row per PRIMARY cell:
    (cluster_id, n_members, n_pruned, min_vec) — membership counts each
    vector once, in its nearest cell.

    ``nassign`` indexes each vector under its ``nassign`` nearest cells
    for CANDIDATE generation (the same multi-assignment/"spilling" lever
    as ivf_topk): Voronoi-boundary pairs — the dominant recall loss when
    a duplicate pair straddles a cell edge — become reachable from either
    side. Candidate mass scales ×nassign (still linear in n). Cell
    sharing alone saturates in the mid-similarity regime (raising nassign
    2→4 at sf0.1 only moved recall 0.44→0.74: a 0.46-cosine pair has no
    reason to share ANY nearest cells once cells are dense), so
    ``lsh_reprobe`` adds a second, angle-local candidate channel —
    multiprobe hyperplane-LSH pairs at the same threshold, exact-cosine
    re-checked — and the report prunes the UNION. Measured recall vs the
    exact all-pairs dup set: 1.00 at sf0.01 and 0.95 at sf0.1 (cells
    alone: 1.00 / 0.44).

    The bounds that make this the 100 TB shape:

    - **Coarse k is capped** (``k_max``): k = min(n // target_cell, k_max),
      so the driver-side sample fit stays O(sample × k_max) no matter how
      big the table gets — sizing k ∝ n forever would eventually ask the
      bounded 50k sample to carve millions of cells (≈0 points per cell in
      the sample: a meaningless fit and an O(n·k) seeding blow-up).
    - **Per-cell pair cost is capped** (``cell_cap``): inside each pandas
      group, members are ordered by cohesion (``cluster_cos``, then id —
      deterministic) and chunked to ≤ cell_cap rows before the pairwise
      matmul, so a fat cell costs Σ ceil(|c|/cap) · cap² instead of |c|².
      Near-identical vectors have near-identical cosine to ANY fixed
      centroid, so cohesion-adjacent chunking keeps true duplicate pairs
      co-chunked (the recall trade is only at chunk boundaries, and only
      for cells that outgrew 2× the target — insurance, never hit at
      fixture scale).
    - **Each row crosses Arrow ≤ nassign times**: the within-cell pairwise
      is one BLAS ``m @ m.T`` per chunk inside ``applyInPandas`` — the
      equi-self-join formulation this replaced exploded to Σ|c|²/2 pair
      ROWS each carrying two 64-float arrays through Arrow (measured
      ≈5 GB of transfer at 20k rows vs ~10 MB per assignment here).

    Plan shape: one bounded driver fit, one assignment scan (checkpointed
    — the pruned-id and membership branches both consume it), one shuffle
    on cell for the pairwise pass, one dedup of pruned ids across cells,
    one aggregation on the primary cell. ``min_vec`` is the min SURVIVING
    id: under multi-assignment a cell's minimum member can itself be
    pruned through a shared cell with a lower-id vector, so the survivor
    set — not raw membership — is what the minimum is taken over (a cell
    whose members are all pruned reports min_vec NULL). Containment
    (pruned ⊆ the exact all-pairs dup set) and the recall floor are
    pinned in tests/test_operators.py::test_semantic_dedup_prunes_subset_of_exact.
    """
    n = embeddings.count()
    k = max(2, min(n // target_cell, k_max))
    base = _semantic_cells(
        embeddings, id_col, vec_col, k=k, nassign=nassign, seed=seed, n=n
    ).localCheckpoint(eager=True)
    # Checkpointed: the pruned-id set feeds BOTH the per-cluster count and
    # the survivor anti-join — lazy, the per-cell pairwise UDF would run
    # twice (the multi-leg recompute class fixed across the graph queries).
    pruned_ids = semantic_dedup_pruned_ids(
        base, id_col, vec_col, threshold=threshold, cell_cap=cell_cap
    )
    if lsh_reprobe and dim is None:
        # Fallback width probe — one tiny job; callers that know their
        # schema (queries/llm.py passes the fixture's 64) skip it. Empty
        # input can't reach here: the k-means fit above already raised.
        dim = embeddings.select(F.size(vec_col)).first()[0]
    if lsh_reprobe:
        # Second candidate channel: multiprobe random-hyperplane LSH pairs
        # at the SAME threshold, exact-cosine re-checked — the recall
        # complement of cell sharing. Mid-similarity pairs (the 0.46
        # regime) need not share any of their nassign nearest k-means
        # cells once cells are dense (measured recall at sf0.1: cells
        # alone 0.44, LSH alone 0.92, union 0.94+), but hyperplane
        # banding is angle-local and doesn't care where Voronoi edges
        # fall. Both channels only ever emit exact-verified pairs, so
        # containment in the all-pairs dup set is preserved; cost adds
        # one O(n·bucket) candidate join (the llm_embed_neardup_lsh
        # plan). The probe budget self-decays with band width inside
        # embedding_neardup_pairs (3 probes at sf0.1's 4-bit bands where
        # they carry the recall; 0 at sf1's 8-bit bands where measured
        # gain was 2.9% of pairs for 3.6× the join mass), keeping the
        # channel's sf1 cost at the plain-banding floor.
        lsh_pruned = (
            embedding_neardup_pairs(
                embeddings,
                id_col=id_col,
                vec_col=vec_col,
                threshold=threshold,
                approx=True,
                # 3 low-margin probes, not the channel default 2: the
                # re-probe exists for borderline-threshold pairs, where
                # the third-lowest margin still flips real misses
                # (measured recall at sf0.1: 2 probes 0.895, 3 probes —
                # see docstring; cost is one more index entry per band).
                multiprobe=3,
                dim=int(dim),
                # n is already counted above — sizing the bands here hits
                # embedding_neardup_pairs' explicit-width branch: no
                # redundant sig.count() job, a 3·bits-plane signature
                # instead of the 48-plane adaptive max, and no dead
                # checkpointed margins column once the ≥0.4-threshold
                # decay zeroes the probes (hyperplanes are prefix-stable,
                # so the pair set is identical either way).
                band_bits=adaptive_band_bits(n),
            )
            .select(F.col("bid").alias(id_col))
            .distinct()
        )
        pruned_ids = pruned_ids.unionAll(lsh_pruned).distinct()
    pruned_ids = pruned_ids.localCheckpoint(eager=True)
    primary = base.select(
        F.col(id_col), F.col("cells")[0].alias("cluster_id")
    )
    members = primary.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    survivors_min = (
        primary.join(pruned_ids, id_col, "left_anti")
        .groupBy("cluster_id")
        .agg(F.min(id_col).alias("min_vec"))
    )
    pruned_per = (
        pruned_ids.join(primary, id_col)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_pruned"))
    )
    return (
        members.join(pruned_per, "cluster_id", "left")
        .join(survivors_min, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_pruned", F.lit(0).cast("long")).alias("n_pruned"),
            "min_vec",
        )
    )


def semantic_dedup_pruned_ids(
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.46,
    cell_cap: int = 512,
) -> DataFrame:
    """The prune decision of ``semantic_dedup_report``, exposed for
    verification: given the multi-cell assignment (``_semantic_cells``
    output), returns the DISTINCT ids pruned in at least one shared cell.
    Every emitted id has a genuine cosine ≥ threshold to a lower id (the
    pairwise is exact within candidates), so the result is contained in
    the all-pairs dup set regardless of assignment quality."""
    thr, cap = float(threshold), int(cell_cap)

    def cell_pruned(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        m = len(ids)
        vecs = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        # Chunk by cohesion to THIS cell's centroid (cell_cos rides the
        # explode) — a secondary member ordered by its primary-cell cosine
        # would lose near-identical adjacency in shared cells.
        order = np.lexsort((ids, pdf["cell_cos"].to_numpy()))
        n_chunks = max(1, -(-m // cap))
        bounds = np.linspace(0, m, n_chunks + 1).astype(int)
        out: list[int] = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            sel = order[lo:hi][np.argsort(ids[order[lo:hi]])]
            sub = vecs[sel]
            sims = sub @ sub.T
            upper = np.triu(np.ones((len(sel), len(sel)), dtype=bool), 1)
            hit = ((sims >= thr) & upper).any(axis=0)
            out.extend(int(x) for x in ids[sel][hit])
        return pd.DataFrame({id_col: out}, dtype="int64")

    exploded = assigned.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(F.arrays_zip("cells", "coss")).alias("cc"),
    ).select(
        id_col,
        vec_col,
        F.col("cc.cells").alias("cell"),
        F.col("cc.coss").alias("cell_cos"),
    )
    return (
        exploded.groupBy("cell")
        .applyInPandas(
            cell_pruned, schema=T.StructType([T.StructField(id_col, T.LongType())])
        )
        .distinct()
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    max_iter: int = 10,
    nassign: int = 1,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse k-means quantizer
    partitions vectors into ``nlist`` cells; each query probes its
    ``nprobe`` nearest cells and re-ranks exactly within them.

    ``nassign`` > 1 indexes each DATABASE vector under its ``nassign``
    nearest cells (multi-assignment / "spilling"): boundary vectors — the
    dominant recall loss when neighbors straddle Voronoi edges — become
    reachable from either side. Index size grows ×nassign; query cost is
    still bounded by the probed-cell mass. Measured on the sf0.1 fixture
    (2000×64-d, k=10): nassign=1 → 0.71 recall, nassign=2 → 0.91 at the
    same nlist=16/nprobe=6.

    The 100 TB shape: centroids are tiny (nlist×dim, fit once on a bounded
    sample — `_kmeans_fit_sample` — broadcast everywhere), the cell
    assignment is one narrow pass, and the candidate join is an equi-join
    on cell id — partition-prunable if the table is written
    bucketed/partitioned by cell. Expected candidates per query ≤
    N·nassign·nprobe/nlist (duplicate (qid, cid) pairs from shared cells
    are removed before the re-rank).
    """
    centroids = _kmeans_fit_sample(embeddings, vec_col, nlist, seed, max_iter)

    # _multi_assign_udf is the module's single assigner (kmeans_assign,
    # SemDeDup, and IVF must rank cells identically): one BLAS matmul per
    # Arrow batch with NO (n, nlist, dim) broadcast temporary — the naive
    # pairwise-difference form this replaced re-allocated exactly the
    # temporary _kmeans_fit_sample's distance-math note measures at 318 s
    # once a caller scales nlist up, and its unstable argsort tie-break
    # could drift from _topn_cells' first-occurrence rule. (Euclidean on
    # unit vectors orders identically to cosine: d² = 2 − 2cos.)
    nassign = max(1, min(int(nassign), len(centroids)))
    nprobe = max(1, min(int(nprobe), len(centroids)))
    emb_cells = embeddings.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("ce"),
        F.explode(
            _multi_assign_udf(centroids, nassign)(F.col(vec_col))["cells"]
        ).alias("cell"),
    )
    q_cells = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qe"),
        F.explode(
            _multi_assign_udf(centroids, nprobe)(F.col(vec_col))["cells"]
        ).alias("cell"),
    )
    cands = emb_cells.join(F.broadcast(q_cells), "cell").filter(
        F.col("qid") != F.col("cid")
    )
    if nassign > 1:
        # A pair reachable through two shared cells would otherwise occupy
        # two of the query's k slots after row_number.
        cands = cands.dropDuplicates(["qid", "cid"])
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        cands.withColumn("sim", _cosine_sim("qe", "ce"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )


def _explode_bands(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    prefix: str,
    n_planes: int,
    band_bits: int,
    probe: bool = False,
    probe_lowmargin: int = 0,
) -> DataFrame:
    """One row per (vector, band[, probe-bucket]): the banded LSH index.
    ``probe`` adds, per band, every bucket at Hamming distance 1 (standard
    multi-probe — apply on the QUERY side only so the table-side index
    stays linear in the data). ``probe_lowmargin=k`` probes only the k
    buckets flipping the LOWEST-|margin| bits of the band (Lv et al. 2007
    multi-probe: a near-zero hyperplane margin is the bit most likely to
    disagree across a true pair) — at 8-bit bands that is 3 index entries
    per band instead of 9 for ~4× less candidate mass at almost the same
    recall; requires the `lsh_margins` column (with_lsh_signature
    margins=True) and takes precedence over ``probe``."""
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1
    powers = F.array(*[F.lit(1 << i) for i in range(band_bits)])
    entries = []
    for b in range(n_bands):
        bucket = F.shiftright("lsh_sig", b * band_bits).bitwiseAND(F.lit(mask))
        entries.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
        if probe_lowmargin > 0:
            ms = F.slice("lsh_margins", b * band_bits + 1, band_bits)
            srt = F.array_sort(ms)
            for j in range(min(probe_lowmargin, band_bits)):
                # 1-based plane-in-band of the j-th smallest margin; on
                # tied margins array_position repeats the first hit and
                # the duplicate probe collapses in the candidate distinct.
                idx = F.array_position(ms, F.element_at(srt, j + 1))
                flip = F.element_at(powers, idx.cast("int"))
                entries.append(
                    F.struct(
                        F.lit(b).alias("band"),
                        bucket.bitwiseXOR(flip).alias("bucket"),
                    )
                )
        elif probe:
            entries.extend(
                F.struct(
                    F.lit(b).alias("band"),
                    bucket.bitwiseXOR(F.lit(1 << i)).alias("bucket"),
                )
                for i in range(band_bits)
            )
    return df.select(
        F.col(id_col).alias(f"{prefix}id"),
        F.col(vec_col).alias(f"{prefix}e"),
        F.explode(F.array(*entries)).alias("bb"),
    ).select(f"{prefix}id", f"{prefix}e", "bb.band", "bb.bucket")


def embedding_neardup_survivors(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.46,
    approx: bool = False,
    n_planes: int | None = None,
    band_bits: int | None = None,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate dedup: a row is a duplicate iff some
    LOWER-id row has cosine ≥ ``threshold``; survivors are the rest. The
    lowest-id member of every near-dup cluster always survives, and the
    rule needs no iterative clustering (membership is decided against ALL
    earlier rows, surviving or not — exactly a NOT EXISTS).

    ``approx=False``: all-pairs self-join (a < b), broadcast one side —
    the oracle shape, O(n²) cosine evals, for fixtures and verification.
    ``approx=True``: the 100 TB path — candidate pairs = vectors sharing a
    multi-probe LSH band bucket (same index as `cosine_topk_lsh`), exact
    cosine re-check on candidates only; expected cost O(n · bucket_size).
    """
    dup_ids = (
        embedding_neardup_pairs(
            embeddings, id_col, vec_col, threshold, approx,
            n_planes, band_bits, seed, dim,
        )
        .select(F.col("bid").alias(id_col))
        .distinct()
    )
    return embeddings.join(dup_ids, id_col, "left_anti")


def adaptive_band_bits(n_rows: int, target_bucket: int = 128) -> int:
    """Band width that keeps the EXPECTED bucket size ≈ ``target_bucket``:
    bits = log2(n / target), clamped to [4, 16]. The bucket self-join's
    candidate mass is Σ bucket² ≈ n·bucket — with fixed bits it grows
    QUADRATICALLY in n (measured: 14× wall on 10× data in the sf1 sweep);
    with adaptive bits it stays ≈ n·target, linear. The trade is the
    textbook LSH one: more bits per band shift the per-band collision
    curve (cos θ ↦ (1−θ/π)^bits) right, so at scale recall concentrates
    on HIGH-similarity pairs — which is the regime near-dup dedup
    actually operates in (replica/boilerplate cosine ≥ 0.95, caught at
    ≥ 0.97/band even at 16 bits), while borderline-threshold pairs
    become best-effort. Small fixtures (n ≤ ~2k) keep the historical
    4-bit behavior, so oracle/containment tests see identical output."""
    import math

    return min(16, max(4, math.ceil(math.log2(max(n_rows, 1) / target_bucket))))


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.46,
    approx: bool = False,
    n_planes: int | None = None,
    band_bits: int | None = None,
    seed: int = 42,
    dim: int = 64,
    multiprobe: bool | int | str = False,
) -> DataFrame:
    """(aid, bid, sim) pairs with aid < bid and cosine ≥ threshold — the
    edge set shared by near-dup filtering (`embedding_neardup_survivors`)
    and cluster assignment (operators/components.py). Exact = all-pairs
    broadcast self-join; approx = shared LSH band buckets with exact
    cosine re-check on candidates only. ``band_bits``/``n_planes`` default
    to the adaptive sizing (`adaptive_band_bits`: expected bucket ≈ 128,
    3 bands) so candidate volume stays linear in n.

    ``multiprobe`` defaults OFF here (unlike `cosine_topk_lsh`): measured
    on the sf0.1 fixture, probing inflates the candidate set from 0.18×
    to 0.68× of all-pairs — near-dup thresholds are high (pairs nearly
    collinear), so plain banding already catches them; multi-probe is the
    recall lever for top-k's mid-similarity neighbors, not for dedup.
    When requested (True = 2, int = that many) at HIGH thresholds
    (≥ 0.4, the dedup regime), the probe count DECAYS one per adaptive
    band bit above 4 (see the inline rationale): there probes only pay
    on short bands, so a consumer can ask for 3 and get 3 at sf0.1-like
    densities but 0 once `adaptive_band_bits` reaches 7+ — the request
    is a budget, not a contract (an INFO log records any decay). Below
    ``DEDUP_PROBE_DECAY_THRESHOLD`` (0.4 — the graph-analytics regime,
    where this function's own mid-similarity caveat applies) the full
    requested budget is honored at every band width — measured at sf1,
    8-bit bands: probes added 2.9% more pairs at threshold 0.46 but 41%
    more TRUE edges at 0.35 (exact-verified recall 0.22 → 0.31).
    ``multiprobe='ring'`` opts into the historical full Hamming-1 ring
    per band (band_bits probes, never decayed, no margins column) for
    callers that want guaranteed probe width at its full candidate
    cost."""
    a = embeddings.select(F.col(id_col).alias("aid"), F.col(vec_col).alias("ae"))
    b = embeddings.select(F.col(id_col).alias("bid"), F.col(vec_col).alias("be"))
    if approx:
        # Margin-aware probing (lowest-|margin| flips per band), not
        # all-bit flips: the full Hamming-1 ring at 8-bit bands is 9
        # index entries per (vector, band) and was the entire 4× sweep
        # regression of the probing consumers. multiprobe=True probes 2
        # flips; an int probes that many — at thresholds ≥ 0.4 DECAYED
        # one probe per band bit above the 4-bit floor: a single-bit
        # flip can only rescue a pair whose band mismatches by exactly
        # 1, and a ≥0.4-threshold edge set is dominated by high-sim
        # pairs that plain banding already catches (measured at sf1,
        # 8-bit bands: 3 probes added 2.9% more pairs for 3.6× the
        # candidate join mass — 11.7M vs 3.2M pre-distinct). At sf0.1's
        # 4-bit bands the same probes lift SemDeDup union recall
        # 0.64 → 0.94, and at LOW thresholds probes stay load-bearing
        # at every width (sf1, threshold 0.35: +41% true edges, recall
        # 0.22 → 0.31 exact-verified) — so the decay is gated on the
        # threshold, not applied globally.
        # multiprobe='ring' keeps the historical full Hamming-1 ring
        # reachable as an EXPLICIT opt-in (band_bits probes per band, no
        # decay, no margins column) — callers that want guaranteed-width
        # probing pay its 4× candidate mass knowingly instead of getting
        # it silently.
        ring = multiprobe == "ring"
        if isinstance(multiprobe, str) and not ring:
            # Fail loudly: int('Ring') would raise a baffling ValueError,
            # and a numeric string would silently become a decayable
            # budget the caller may not have meant.
            raise ValueError(
                f"multiprobe={multiprobe!r}: the only string mode is "
                "'ring' (full Hamming-1 ring); pass an int for a "
                "margin-aware probe budget"
            )
        if ring:
            probes_req = 0
        elif multiprobe:
            probes_req = 2 if multiprobe is True else int(multiprobe)
        else:
            probes_req = 0

        def effective_probes(bits: int) -> int:
            if threshold < DEDUP_PROBE_DECAY_THRESHOLD:
                return probes_req
            return max(0, probes_req - max(0, bits - 4))

        # The signature (Arrow pandas_udf matmul) feeds BOTH sides of the
        # bucket self-join; checkpoint so it is computed once, not twice
        # (blocks free with the result DataFrame — see dedup.py rationale).
        #
        # Adaptive sizing without an extra scan: compute the signature at
        # the MAX width (48 planes = 3 × 16-bit clamp), checkpoint, and
        # size the bands from the count of the now-materialized blocks —
        # `_hyperplanes` is prefix-stable (rng fills C-order), so the low
        # 3·bits signature bits are bit-identical to a narrow signature
        # and small-fixture behavior is unchanged.
        if band_bits is None:
            # band_bits unknown until the count, so margins ride along
            # whenever probes are requested at all (they may decay to 0
            # after sizing — a wasted float32[n_planes] column per row,
            # but only in the high-threshold adaptive path).
            sig = with_lsh_signature(
                embeddings, vec_col, 48, seed, dim, margins=probes_req > 0
            ).localCheckpoint(eager=True)
            band_bits = adaptive_band_bits(sig.count())
            if n_planes is None:
                n_planes = 3 * band_bits
            else:
                # Explicit n_planes with adaptive bits: clamp so at least
                # the conventional 3 bands survive — adaptive bits wider
                # than n_planes//3 would make n_bands = n_planes//bits
                # collapse (to 0 at the extreme: zero candidate pairs,
                # every duplicate silently kept).
                band_bits = max(1, min(band_bits, n_planes // 3))
        else:
            if n_planes is None:
                n_planes = 3 * band_bits
            if n_planes // band_bits < 1:
                # Same hazard the adaptive branch clamps away: zero bands
                # would mean zero candidate pairs and every duplicate
                # silently kept — refuse loudly on explicit widths.
                raise ValueError(
                    f"band_bits={band_bits} exceeds n_planes={n_planes}: "
                    "no bands would survive (n_bands = n_planes // "
                    "band_bits = 0) and the candidate join would be "
                    "silently empty"
                )
            # Explicit width: the probe budget is decidable BEFORE the
            # signature, so a fully-decayed request skips the margins
            # column instead of checkpointing dead payload.
            sig = with_lsh_signature(
                embeddings,
                vec_col,
                n_planes,
                seed,
                dim,
                margins=effective_probes(band_bits) > 0,
            ).localCheckpoint(eager=True)
        probes_eff = effective_probes(band_bits)
        if probes_eff < probes_req:
            # The request is a budget, not a contract (docstring) — but
            # say so at runtime, so a consumer watching recall can see
            # the probe channel thinned/vanished instead of guessing.
            _LOG.info(
                "embedding_neardup_pairs: multiprobe budget decayed "
                "%d -> %d (band_bits=%d, threshold=%.2f >= "
                "DEDUP_PROBE_DECAY_THRESHOLD=%.2f)",
                probes_req,
                probes_eff,
                band_bits,
                threshold,
                DEDUP_PROBE_DECAY_THRESHOLD,
            )
        pairs = (
            _explode_bands(
                sig,
                id_col,
                vec_col,
                "a",
                n_planes,
                band_bits,
                probe=ring,
                probe_lowmargin=probes_eff,
            )
            .drop("ae")
            .join(
                # drop("be"): vectors must not ride through the bucket
                # self-join (the largest shuffle) — they are re-joined
                # from `b` after the (long, long) distinct, same as the
                # a-side's drop("ae").
                _explode_bands(
                    sig, id_col, vec_col, "b", n_planes, band_bits
                ).drop("be"),
                ["band", "bucket"],
            )
            .filter(F.col("aid") != F.col("bid"))
            # Canonicalize with least/greatest instead of filtering
            # aid < bid: probes fire on the a-side only, so a pair whose
            # differing bit is low-margin only for the HIGHER id arrives
            # as (aid=hi, bid=lo) — an aid<bid filter would discard that
            # already-paid-for rescue (the lo-side probe need not fire).
            # Identical join mass; the distinct collapses both routes.
            .select(
                F.least("aid", "bid").alias("aid"),
                F.greatest("aid", "bid").alias("bid"),
            )
            .distinct()
            .join(a, "aid")
            .join(b, "bid")
        )
    else:
        id_type = embeddings.schema[id_col].dataType
        if isinstance(id_type, T.LongType):
            return _exact_pairs_blocked(
                embeddings, id_col, vec_col, float(threshold)
            )
        # Non-bigint ids (generic operator contract): the historical
        # broadcast all-pairs form — the block kernel emits int64 ids,
        # which would silently widen an int/string id column.
        pairs = b.join(F.broadcast(a), F.col("aid") < F.col("bid"))
    return (
        pairs.withColumn("sim", _cosine_sim("ae", "be"))
        .filter(F.col("sim") >= threshold)
        .select("aid", "bid", "sim")
    )


def _exact_pairs_blocked(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block: int = 512,
) -> DataFrame:
    """All-pairs cosine ≥ threshold as a BLOCK-PAIR matmul (the exact
    oracle companion's engine, round 12 — guide §4 "shuffle block
    summaries, not per-pair payloads"): pack vectors into ~``block``-row
    blocks (collect_list per hash bucket), self-join the ~(n/block)²/2
    block PAIRS, and compute each pair's cosine inside one vectorized
    numpy kernel per block pair.

    Why: the historical broadcast self-join materialized O(n²) pair ROWS
    each carrying BOTH 64-float vectors through Arrow — ~4 GB of transfer
    at sf0.1's 2000 vectors (measured 5.9 s) and ~400 GB at sf1's 20k,
    the single worst quadratic in the repo. Block packing moves each
    vector O(n/block) times instead of O(n): ~6 MB at sf0.1 (measured
    1.7 s, sims BIT-identical — the kernel reduces the same 64-length
    float64 axis with the same numpy pairwise summation `_cosine_sim`
    uses, so not even a ULP moves).

    Pair accounting: each unordered block pair {p, q} is joined once
    (blk_a ≤ blk_b); cross-block pairs are emitted once with
    aid = min, bid = max; same-block pairs are masked to the upper
    triangle — no duplicates, no post-distinct shuffle. Only qualifying
    pairs (sim ≥ threshold) cross back from Python. The inner broadcast
    temp is sliced to ≤ ~32 MB per step regardless of block size.

    Null handling matches the historical broadcast form (ADVICE r12): a
    null id or null vector never pairs — there it fell out of the
    ``aid < bid`` join condition / null sim; here those rows are dropped
    before packing (np.int64 packing would otherwise raise on None).
    The (id, vec) projection is materialized once (localCheckpoint) so
    the sizing count and the packing aggregate share one execution of
    the upstream plan instead of two."""
    embeddings = (
        embeddings.select(
            F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
        )
        .filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .localCheckpoint(eager=True)
    )
    n = embeddings.count()
    nb = max(1, -(-n // block))
    packed = (
        embeddings.select(
            F.col(id_col).alias("i"),
            F.col(vec_col).alias("v"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).alias("blk"),
        )
        .groupBy("blk")
        .agg(F.collect_list(F.struct("i", "v")).alias("rows"))
    )
    bp = packed.select(
        F.col("blk").alias("ba"), F.col("rows").alias("ra")
    ).join(
        packed.select(F.col("blk").alias("bb"), F.col("rows").alias("rb")),
        F.col("ba") <= F.col("bb"),
    )
    out_schema = T.StructType(
        [
            T.StructField("aid", T.LongType()),
            T.StructField("bid", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ra, rb = row["ra"], row["rb"]
                same = row["ba"] == row["bb"]
                ia = np.array([r["i"] for r in ra], dtype="int64")
                ib = np.array([r["i"] for r in rb], dtype="int64")
                A = np.stack([np.asarray(r["v"]) for r in ra]).astype("float64")
                B = np.stack([np.asarray(r["v"]) for r in rb]).astype("float64")
                na = np.linalg.norm(A, axis=1)
                nb_ = np.linalg.norm(B, axis=1)
                outs = []
                # Slice the (step, |B|, dim) broadcast temp to ~32 MB —
                # the memory-bounded form of _cosine_sim's elementwise
                # multiply + sum over the contiguous last axis (same
                # reduction order → bit-identical sims).
                step = max(1, (1 << 22) // (B.shape[0] * A.shape[1] + 1))
                for lo in range(0, A.shape[0], step):
                    hi = min(A.shape[0], lo + step)
                    num = (A[lo:hi, None, :] * B[None, :, :]).sum(-1)
                    den = na[lo:hi, None] * nb_[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        sims = np.where(den > 0, num / den, 0.0)
                    m = sims >= threshold
                    aa = ia[lo:hi, None]
                    bb2 = ib[None, :]
                    # Same-block: upper triangle only (each unordered
                    # pair once, aid < bid for free). Cross-block: every
                    # (a, b) appears once; orient by id below.
                    m &= (aa < bb2) if same else (aa != bb2)
                    r_, c_ = np.nonzero(m)
                    if len(r_):
                        outs.append(
                            pd.DataFrame(
                                {
                                    "aid": np.minimum(ia[lo:hi][r_], ib[c_]),
                                    "bid": np.maximum(ia[lo:hi][r_], ib[c_]),
                                    "sim": sims[r_, c_],
                                }
                            )
                        )
                if outs:
                    yield pd.concat(outs)

    return bp.mapInPandas(gen, schema=out_schema)


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 12,
    band_bits: int = 4,
    seed: int = 42,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing ≥1 signature band with
    the query (banding, like MinHash), then exact cosine re-rank within
    candidates.

    ``multiprobe``: each query additionally probes, per band, every bucket
    at Hamming distance 1 (one sign bit flipped) — the standard multi-probe
    LSH recall lever. It multiplies only the QUERY side of the bucket join
    by (band_bits+1); the table-side index stays one row per (vector,
    band), which is what survives at 100 TB (measured on the sf0.1
    fixture: recall@10 0.33 → ~0.8 for ~2× candidate volume).

    Recall < 1 by construction; tests assert recall ≥ threshold against the
    brute-force baseline rather than equality.
    """
    emb_sig = with_lsh_signature(embeddings, vec_col, n_planes, seed, dim)
    q_sig = with_lsh_signature(queries, vec_col, n_planes, seed, dim)

    def banded(df: DataFrame, prefix: str, probe: bool = False) -> DataFrame:
        return _explode_bands(
            df, id_col, vec_col, prefix, n_planes, band_bits, probe
        )

    # Dedup candidate IDs before the exact re-rank so the cosine UDF sees
    # each (query, candidate) pair once, not once per colliding band; the
    # distinct shuffles (long, long) pairs, never the vectors.
    cand_ids = (
        banded(emb_sig, "c")
        .drop("ce")
        .join(
            F.broadcast(banded(q_sig, "q", probe=multiprobe).drop("qe")),
            ["band", "bucket"],
        )
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    cands = (
        cand_ids.join(
            embeddings.select(
                F.col(id_col).alias("cid"), F.col(vec_col).alias("ce")
            ),
            "cid",
        ).join(
            F.broadcast(
                queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
            ),
            "qid",
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        cands.withColumn("sim", _cosine_sim("qe", "ce"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )
