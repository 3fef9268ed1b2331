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
    # NULL-safe, injective encoding: concat_ws SKIPS nulls, so ("x", NULL)
    # and (NULL, "x") would collide on the same digest and merge genuinely
    # different rows; a raw separator is also forgeable by values that
    # contain it. Each column encodes as "\x00" for NULL or
    # "<len>:<value>" otherwise — the length prefix pins every value's
    # span, so two digests match iff the column tuples match.
    def _enc(c: str) -> F.Column:
        v = F.col(c).cast("string")
        return F.when(v.isNull(), F.lit("\x00")).otherwise(
            F.concat(F.length(v).cast("string"), F.lit(":"), v)
        )

    digest = F.sha2(F.concat_ws("\x1f", *[_enc(c) for c in cols]), 256)
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.withColumn("__digest", digest)
        .groupBy("__digest")
        .agg(agg.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .withColumnRenamed("__digest", "digest")
    )


def shingles_col(n: int = 3) -> F.Column:
    """Word n-gram shingles over a `tokens` array column (distinct).
    Safe on SHORT docs: fewer than n tokens yields an empty array —
    without the guard, F.sequence(0, size−n) with size<n produces a
    DESCENDING sequence whose positions feed element_at index ≤ 0, which
    always throws (callers like with_shingles pre-filter for plan-shape
    reasons, but the helper must not crash when used directly)."""
    t = F.col("tokens")
    return F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Short-doc rows are dropped with ``size(tokens) >= n`` BEFORE the
    shingle projection — equivalent to the natural ``size(shingles) > 0``
    (shingle count = tokens−n+1; distinct of non-empty is non-empty), but
    a filter on the shingle column gets predicate-pushed below the
    projection with the WHOLE shingle pipeline inlined into the Filter
    condition (HOF lambdas have no CSE → the O(tokens²) element_at form,
    re-evaluated per row, once per consumer plan — measured 25× on the
    novelty query). The token-count predicate inlines only the split."""
    out = df
    if "tokens" not in df.columns:
        out = out.withColumn("tokens", tokens_col(text_col))
    return out.filter(F.size("tokens") >= n).withColumn("shingles", shingles_col(n))


def with_shingle_hashes(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Hash-only shingles over `tokens`: token → xxhash64 long, shingle
    hash = xxhash64(h_i, …, h_{i+n-1}). Never materializes shingle strings
    — for sketching (MinHash) the string is dead weight; hashing longs is
    cheaper than concatenating and hashing n-word strings, and the distinct
    dedups longs, not strings.

    The token-hash array is materialized as its own column first: HOF
    lambdas have no common-subexpression elimination, so an inline
    transform referenced from element_at would recompute the whole array
    per sequence element (O(tokens²) per doc)."""
    out = df
    if "tokens" not in df.columns:
        out = out.withColumn("tokens", tokens_col(text_col))
    # size(tokens) >= n, not size(shingle_hashes) > 0: same rows (see
    # with_shingles), but the latter predicate-pushes the whole O(tokens²)
    # shingle pipeline into the Filter condition.
    out = out.filter(F.size("tokens") >= n)
    out = out.withColumn("__tok_h", F.transform("tokens", lambda t: F.xxhash64(t)))
    th = F.col("__tok_h")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(th) - n),
            lambda i: F.xxhash64(
                *[F.element_at(th, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )
    return out.withColumn("shingle_hashes", shingles).drop("__tok_h")


def minhash_signatures_from_tokens(
    df: DataFrame, id_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """MinHash signatures straight from `tokens`, one shuffle total.

    Pipeline: posexplode(tokens) → xxhash64 per token (the explode child
    evaluates once per row — no HOF recomputation) → shingle hash via
    lead(h,1)/lead(h,2) over a (doc, pos) window → 32 min-aggregates.
    The window and the groupBy share the doc-id hash partitioning, so the
    whole signature costs ONE shuffle of (doc, pos, hash) tuples; every
    expression is JVM/codegen.

    Shingle multiset ≠ set, but MIN is insensitive to duplicates, so the
    signature equals the string-shingle one (modulo 64-bit collisions) —
    no array_distinct pass needed.
    """
    from pyspark.sql import Window as W

    ex = df.select(
        F.col(id_col), F.posexplode("tokens").alias("pos", "tok")
    ).withColumn("h0", F.xxhash64("tok"))
    w = W.partitionBy(id_col).orderBy("pos")
    sh = ex
    for j in range(1, n):
        sh = sh.withColumn(f"h{j}", F.lead("h0", j).over(w))
    sh = sh.filter(F.col(f"h{n - 1}").isNotNull()).withColumn(
        "sh", F.xxhash64(*[F.col(f"h{j}") for j in range(n)])
    )
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[f"__m{i}" for i in range(num_hashes)]).alias("minhash"),
    )


def minhash_signatures(df: DataFrame, id_col: str, num_hashes: int = 32) -> DataFrame:
    """K-permutation MinHash → (id_col, minhash: array<long>), over
    `shingle_hashes` if present (cheap path) else `shingles` strings.

    Shape matters for speed: each shingle is hashed to a long ONCE, then
    permutation i is the cheap long-hash xxhash64(h, i) — never K string
    hashes. The min-per-permutation runs as a codegen'd hash aggregate over
    exploded shingles (map-side partial min) instead of interpreted
    higher-order lambdas — ~10× faster at sf0.1, and at cluster scale it's
    one narrow explode + one shuffle of K longs per doc.
    """
    if "shingle_hashes" in df.columns:
        ex = df.select(F.col(id_col), F.explode("shingle_hashes").alias("h"))
    else:
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


def _banded_signatures(
    df: DataFrame, id_col: str, num_hashes: int, bands: int,
    materialize: bool = True,
) -> DataFrame:
    """(id, minhash) → (id, minhash, band, bucket): one row per band with
    the band's bucket hash. ``materialize=True`` localCheckpoints the
    result — right when a SELF-join reads it twice (the signature DAG,
    num_hashes × shingle hashes per doc, is expensive; checkpoint blocks
    are freed by the ContextCleaner when the result is dropped, where
    persist() would park them in the session cache manager and leak
    across repeated calls). Cross-set callers that consume each side ONCE
    pass False and skip the extra materialization pass."""
    if bands < 1 or num_hashes % bands:
        # A remainder would silently DROP the trailing num_hashes % bands
        # minhashes from bucketing (the effective LSH recall curve shifts
        # from the requested one, with no warning); bands > num_hashes
        # yields rows_per_band=0 and an opaque zero-child xxhash64
        # analysis error. The banding contract is divisibility — enforce
        # it at the boundary.
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(LSH banding contract: num_hashes = bands x rows_per_band)"
        )
    rows_per_band = num_hashes // bands
    out = (
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
    )
    return out.localCheckpoint(eager=True) if materialize else out


def _sig_agreement(num_hashes: int) -> F.Column:
    """Estimated Jaccard between mh_a / mh_b signature columns."""
    return F.round(
        F.aggregate(
            F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(num_hashes),
        4,
    )


def minhash_lsh_candidates_between(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Cross-set LSH: candidate near-dup pairs between a (small) LEFT set
    and a (large) RIGHT set that share a band bucket — the INGESTION-GATE
    shape: probe an incoming batch against the corpus signature index
    without ever joining batch×corpus. Returns distinct
    (id_a from left, id_b from right, est_jaccard).

    Scale: both sides explode to `bands` rows each and equi-join on
    (band, bucket) — cost is bucket-intersection sized. At 100 TB the
    right side's banded signatures are the persisted corpus index (stored
    once, ~bands longs per doc); each ingest batch rebuilds only its own
    signatures."""
    a = _banded_signatures(
        left, id_col, num_hashes, bands, materialize=False
    ).select(
        "band", "bucket", F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a")
    )
    b = _banded_signatures(
        right, id_col, num_hashes, bands, materialize=False
    ).select(
        "band", "bucket", F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b")
    )
    return (
        a.join(b, ["band", "bucket"])
        .withColumn("est_jaccard", _sig_agreement(num_hashes))
        .select("id_a", "id_b", "est_jaccard")
        .distinct()
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

    Shape (round-12, guide §2.3 "shuffle keys and metadata instead of
    payloads" — the same slim form `embedding_neardup_pairs` and
    `cosine_topk_lsh` already use): the checkpointed state is ONE row per
    doc (id, minhash) — not the ×bands exploded index — both sides of the
    bucket self-join carry only (band, bucket, id), and the signature
    arrays are re-attached from the checkpoint AFTER the (id, id) distinct.
    The historical form shipped both 32-long arrays through the join and
    evaluated the interpreted zip_with agreement once per COLLIDING BAND
    row (then again in the projection); this one moves 8 B of id instead
    of ~256 B of array per index row and scores each candidate pair once.
    Banding is recomputed per side — pure bit math over the checkpoint.
    """
    sigs = df.select(F.col(id_col), "minhash").localCheckpoint(eager=True)
    banded = _banded_signatures(
        sigs, id_col, num_hashes, bands, materialize=False
    )
    a = banded.select("band", "bucket", F.col(id_col).alias("id_a"))
    b = banded.select("band", "bucket", F.col(id_col).alias("id_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        pairs.join(
            sigs.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b")),
            "id_b",
        )
        .withColumn("est_jaccard", _sig_agreement(num_hashes))
        .select("id_a", "id_b", "est_jaccard")
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
    # Materialize the shingle arrays BEFORE explode: the Generate node
    # infers a size(shingles)>0 constraint, and pushing it below the
    # shingle projection inlines the whole O(tokens²) HOF pipeline into a
    # per-row Filter — on BOTH sides of the self-join (measured 25× on
    # this family; same medicine as the LSH signature checkpoint).
    sized = (
        df.select(F.col(id_col), "shingles")
        .withColumn("n_sh", F.size("shingles"))
        .localCheckpoint(eager=True)
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
    from ..functions import dround

    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    # Threshold the UNROUNDED value (the oracle does), round only the
    # output — and with dround, not F.round: Spark rounds the decimal
    # repr where DuckDB rounds the binary value, which diverges once
    # shingle unions reach ~800 (functions.dround rationale).
    return (
        shared.filter(jac >= threshold)
        .withColumn("jaccard", dround(jac, 4))
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(df: DataFrame, id_col: str, bits: int = 64) -> DataFrame:
    """SimHash over `tokens` → (id_col, simhash: long): per token a 64-bit
    xxhash; each bit position votes ±1 (term frequency = vote weight);
    signature bit = sign of the vote.

    Runs as explode + codegen'd hash aggregate (64 branch-free bit sums
    with map-side partial aggregation) — the same shape as
    minhash_signatures and ~6× faster than per-row interpreted HOF voting
    at sf0.1; at cluster scale the shuffle carries 64 longs per doc.
    The ±1 vote is computed in closed form: vote_i = 2·Σbit_i − n, so
    bit_i of the signature is 1 iff 2·Σbit_i > n — the aggregate sums the
    raw bit (`(h >> i) & 1`, no CASE branch per row per bit) and one
    shared count replaces the subtraction (round-12: 1.92 → 1.59 s at
    sf0.1, signatures bit-identical)."""
    ex = df.select(F.col(id_col), F.explode("tokens").alias("t")).withColumn(
        "h", F.xxhash64("t")
    )
    votes = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1))).alias(
                f"__s{i}"
            )
            for i in range(bits)
        ],
    )
    sig = None
    for i in range(bits):
        bit = F.when(
            F.col(f"__s{i}") * 2 > F.col("__n"), F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return votes.select(F.col(id_col), sig.alias("simhash"))


def with_simhash(df: DataFrame, bits: int = 64, id_col: str = "doc_id") -> DataFrame:
    """Back-compat wrapper: attach `simhash` to ``df`` by computing
    signatures (aggregate shape) and joining them back on ``id_col``.
    LEFT join: a doc with no tokens has no signature row, and an inner
    join would silently drop it from the annotated frame — it keeps a
    NULL simhash instead. The input is checkpointed because it feeds
    both join sides (lazy, the upstream would evaluate twice)."""
    df = df.localCheckpoint(eager=True)
    return df.join(simhash_signatures(df, id_col, bits), id_col, "left")


def simhash_candidates(
    df: DataFrame, id_col: str, n_bands: int = 4, max_hamming: int | None = None
) -> DataFrame:
    """Near-dup candidates by banded SimHash: the 64-bit signature splits
    into ``n_bands`` 16-bit blocks; by pigeonhole, any pair within
    ``n_bands - 1`` bits Hamming distance shares at least one identical
    block, so blocking on (band_index, block_value) finds all such pairs
    without an O(n²) comparison. Pairs are scored by exact Hamming distance
    (``max_hamming`` filters, None keeps all candidates).
    """
    bits_per_band = 64 // n_bands
    mask = (1 << bits_per_band) - 1
    banded = df.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("block"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.block")
    a = banded.select(
        "band", "block", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b = banded.select(
        "band", "block", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    pairs = (
        a.join(b, ["band", "block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
    )
    if max_hamming is not None:
        pairs = pairs.filter(F.col("hamming") <= max_hamming)
    return pairs
