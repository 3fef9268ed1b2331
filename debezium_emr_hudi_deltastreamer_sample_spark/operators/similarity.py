"""Similarity search over embedding columns (BASELINE.json north star):
brute-force cosine top-k as the exactness baseline, LSH-bucketed
(random-hyperplane) top-k as the 100 TB path.

Scale design:
- Brute force = broadcast(queries) ⋈ candidates: the fact-side embedding
  table never shuffles; per-row dot products run JVM-side via
  zip_with/aggregate (no Python). Cost O(|Q|·N) — right for small query
  sets or as the oracle.
- LSH = R random hyperplanes → R-bit signature → bucket join on signature
  band. Candidates per query drop from N to N/2^band_bits on average;
  exact cosine re-ranks candidates. Hyperplanes are generated once on the
  driver from a fixed seed and shipped as literals (tiny: R×dim floats).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


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
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qe")
    )
    c = embeddings.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("ce"))
    sim = _dot(F.col("qe"), F.col("ce")) / (
        norm_col(F.col("qe")) * norm_col(F.col("ce"))
    )
    pairs = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .withColumn("sim", sim)
        .select("qid", "cid", "sim")
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def with_lsh_signature(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 12, seed: int = 42, dim: int = 64
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · plane_i). Signature as
    one long column `lsh_sig` (n_planes ≤ 63)."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col), plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + F.shiftleft(bit, i)
    return df.withColumn("lsh_sig", sig)


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
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing ≥1 signature band with
    the query (multi-probe via bands, like MinHash banding), then exact
    cosine re-rank within candidates.

    Recall < 1 by construction; tests assert recall ≥ threshold against the
    brute-force baseline rather than equality.
    """
    n_bands = n_planes // band_bits
    emb_sig = with_lsh_signature(embeddings, vec_col, n_planes, seed, dim)
    q_sig = with_lsh_signature(queries, vec_col, n_planes, seed, dim)

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("lsh_sig", b * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .alias("bucket"),
                )
                for b in range(n_bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{prefix}id"),
            F.col(vec_col).alias(f"{prefix}e"),
            F.explode(bands).alias("bb"),
        ).select(f"{prefix}id", f"{prefix}e", "bb.band", "bb.bucket")

    cands = (
        banded(emb_sig, "c")
        .join(F.broadcast(banded(q_sig, "q")), ["band", "bucket"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "qe", "cid", "ce")
        .distinct()
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (
        norm_col(F.col("qe")) * norm_col(F.col("ce"))
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        cands.withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", F.round("sim", 4).alias("sim"))
    )
