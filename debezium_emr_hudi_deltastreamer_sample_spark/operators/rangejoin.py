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
    bins instead of a nested loop. Column sets must be disjoint."""
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
