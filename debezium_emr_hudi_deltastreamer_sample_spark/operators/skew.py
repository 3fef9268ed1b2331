"""Skew-handling joins (SURVEY.md §2.C joins; 100 TB design note).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but only for sort-merge joins and only per-partition. For *key*
skew known in advance — the classic hot-key fact⋈dim join — explicit
salting distributes one hot key over N salt buckets deterministically:

- fact side: append a random-but-deterministic salt in [0, N)
- dim side: replicate each row N times, once per salt value
- join on (key, salt): the hot key's rows now spread across N tasks

The dim side grows N×, so this is for dim tables small enough to replicate
(or broadcast — in which case salting is unnecessary; use this when the dim
is too big to broadcast but the fact has hot keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with ``n_salts``-way key salting.

    Deterministic: the salt is a hash of the fact row's full key tuple plus
    a per-row disambiguator column if present — here we use
    ``monotonically_increasing_id`` hashed, which is stable within a single
    execution (sufficient: the salt only needs uniformity, not cross-run
    stability; results are salt-invariant by construction).
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "semi"):
        # Each dim row is replicated n_salts times; under right/full outer
        # the n_salts-1 unmatched replicas would emit spurious null-padded
        # rows. Only fact-preserving joins are salt-safe.
        raise ValueError(
            f"salted_join supports inner/left/semi joins, not {how!r} — "
            "the dim side is replicated per salt"
        )
    on = list(on)
    for side, name in ((fact, "fact"), (dim, "dim")):
        if "__salt" in side.columns:
            # Same contract as merge.py's _reject_reserved: a silent
            # clobber-and-drop of a user column destroys data — refuse.
            raise ValueError(
                f"salted_join {name} side carries reserved column "
                "'__salt'; rename it before joining"
            )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = f.join(d, on + ["__salt"], how)
    return out.drop("__salt")
