"""As-of (backward, inclusive) join — SURVEY.md §2.C joins.

Spark has no native as-of join; the scalable composition is union + window
rather than pandas merge_asof: tag both sides, union, and for each left row
take the last right row at or before its timestamp via ``last(..., ignorenulls)``
over a (key, ts)-ordered window. One shuffle on the key — no range-explosion
join, no per-group pandas materialization, works at any key cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach ``right_values`` from the most recent right
    row with ``right.ts <= left.ts`` sharing the ``on`` keys (backward
    inclusive — DuckDB ``ASOF JOIN`` semantics). Unmatched rows get nulls
    (left-outer shape).
    """
    on = list(on)
    lcols = left.columns
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            "struct<"
            + ",".join(f"`{c}`:{rdt[c]}" for c in right_values)
            + ">"
        ).alias("__r"),
    )
    # A right row with a NULL timestamp can never satisfy right.ts <=
    # left.ts, but ascending nulls-first ordering would sort it ahead of
    # everything and make it everyone's "most recent" match — drop it.
    # Likewise a NULL join KEY: Window.partitionBy groups NULLs into one
    # partition, so NULL-key left rows would match NULL-key right rows —
    # but the documented semantics are DuckDB ASOF JOIN's equi-match,
    # where NULL = NULL never holds. Dropping NULL-key right rows leaves
    # NULL-key left rows alone in their partition → null match, exactly
    # the equi-join behavior.
    right = right.filter(F.col(right_ts).isNotNull())
    for key in on:
        right = right.filter(F.col(key).isNotNull())
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{ldt[c]}" for c in lcols) + ">"
        ).alias("__l"),
        F.struct(*right_values).alias("__r"),
    )
    # Right rows sort before left rows at equal ts → inclusive (<=) match.
    w = (
        W.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    return matched.select(
        "__l.*",
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_values],
    )
