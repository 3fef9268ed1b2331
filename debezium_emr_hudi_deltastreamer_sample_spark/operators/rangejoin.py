"""Binned range join — pure point-in-interval joins without the
nested-loop trap (SURVEY.md §2.C joins).

A range-only join condition (`point BETWEEN lo AND hi`, no equi key) gives
Catalyst nothing to hash on: the physical plan is BroadcastNestedLoopJoin
— O(|points|·|intervals|) compares, the classic 100 TB cliff. The standard
fix is binning: quantize the domain into width-``w`` bins; a point belongs
to exactly one bin, an interval covers ``len/w + 1`` bins; equi-join on
the bin id and refine with the exact BETWEEN. Each (point, interval) pair
meets in at most one bin (the point's), so no post-join dedup is needed.

Cost: shuffle on bin id + per-bin hash probe — linear in inputs plus the
interval replication factor. Pick ``bin_width`` ≈ typical interval length
(replication ≈ 2) ; skewed bins (hot value ranges) can be salted on top
with operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    [lo_col, hi_col] contains ``point_col`` — via an equi-join on quantized
    bins instead of a nested loop. Column sets must be disjoint.

    Only ``how='inner'`` is supported: the post-join BETWEEN refinement
    would discard the null-padded rows of an outer join, silently turning
    it back into an inner join — refuse rather than lie."""
    if how != "inner":
        raise ValueError(f"binned_range_join supports how='inner' only, got {how!r}")
    if not bin_width > 0:
        # bin_width=0 would make every bin NULL (divide-by-zero → null in
        # non-ANSI Spark) and the join silently return zero rows.
        raise ValueError(f"bin_width must be positive, got {bin_width!r}")

    for side, name in ((points, "points"), (intervals, "intervals")):
        if "__bin" in side.columns:
            # Same contract as merge.py's _reject_reserved: silently
            # clobbering then dropping a user column destroys data.
            raise ValueError(
                f"binned_range_join {name} side carries reserved column "
                "'__bin'; rename it before joining"
            )

    def bin_of(c: Column) -> Column:
        return F.floor(c / F.lit(float(bin_width))).cast("long")

    p = points.withColumn("__bin", bin_of(F.col(point_col)))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))
        ),
    )
    return (
        p.join(i, "__bin", how)
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bin")
    )


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Interval-overlap join (``l_lo <= r_hi AND r_lo <= l_hi``) via
    binning — the interval-interval sibling of `binned_range_join`.

    Both sides explode over their covered bins and equi-join on bin id.
    An overlapping pair shares every bin in the overlap region, so naive
    binning emits duplicates; instead of a distinct (an extra shuffle over
    the full output), each pair is kept only in its FIRST shared bin —
    ``bin == greatest(floor(l_lo/w), floor(r_lo/w))`` — which every
    overlapping pair hits exactly once. Column sets must be disjoint.

    Only ``how='inner'`` is supported (see binned_range_join)."""
    if how != "inner":
        raise ValueError(
            f"binned_interval_join supports how='inner' only, got {how!r}"
        )
    if not bin_width > 0:
        raise ValueError(f"bin_width must be positive, got {bin_width!r}")
    for side, name in ((left, "left"), (right, "right")):
        if "__bin" in side.columns:
            raise ValueError(
                f"binned_interval_join {name} side carries reserved column "
                "'__bin'; rename it before joining"
            )

    def bin_of(c) -> "F.Column":
        return F.floor(F.col(c) / F.lit(float(bin_width))).cast("long")

    l = left.withColumn(
        "__bin", F.explode(F.sequence(bin_of(left_lo), bin_of(left_hi)))
    )
    r = right.withColumn(
        "__bin", F.explode(F.sequence(bin_of(right_lo), bin_of(right_hi)))
    )
    return (
        l.join(r, "__bin", how)
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col("__bin") == F.greatest(bin_of(left_lo), bin_of(right_lo)))
        )
        .drop("__bin")
    )
