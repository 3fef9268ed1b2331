"""Scalar helper functions shared by the query surface."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 0) -> Column:
    """Round half-away-from-zero on the *binary* double value — matches
    DuckDB/C ``round()`` bit-for-bit on quantized data.

    Spark's ``F.round`` rounds the shortest decimal representation instead
    (BigDecimal.valueOf): 37081.64499999999 prints as "37081.645" and rounds
    UP to 37081.65, while DuckDB rounds the true binary value DOWN to
    37081.64. Fixture prices are decimal-quantized, so these boundary hits
    are common, not measure-zero — every oracle-compared rounding in
    queries/ must go through this helper (verified exhaustively against
    DuckDB on all 600k sf0.1 disc-price products at 2dp and 4dp).

    Implementation note: NOT the ``floor(x + 0.5)`` trick — that
    double-rounds when the add itself rounds up (floor(0.49999999999999994
    + 0.5) == 1 while C round() == 0). ``frac = a - floor(a)`` is exact in
    IEEE (both operands share a grid, the difference < 1 needs no extra
    significand bits), so ``frac >= 0.5`` reproduces C/DuckDB
    half-away-from-zero on the true binary product, boundary included.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**scale))
    a = F.abs(c) * p
    fl = F.floor(a)
    up = F.when(a - fl >= F.lit(0.5), F.lit(1)).otherwise(F.lit(0))
    return F.signum(c) * (fl + up) / p


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative int columns into a
    Morton (Z-order) key — pure JVM bit expressions, codegen'd. Size
    ``bits`` from the columns' maxima: values >= 2**bits contribute only
    their low bits and the curve's locality silently collapses."""
    # Long-cast first: shiftleft on an IntegerType operand uses Java
    # 32-bit shift semantics — shift 31 sign-extends into the key's high
    # bits and shifts >= 32 alias mod 32 onto low positions, silently
    # destroying the curve for int columns whenever bits > 15.
    x = x.cast("long")
    y = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            .bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def adaptive_zorder_bits(df, col_x: str, col_y: str) -> int:
    """Interleave width for `zorder_key`, sized from the columns' maxima
    (one tiny column-pruned agg): floor 16, clamp 31 so the Morton key
    stays in a long. Returns 16 for an empty / all-NULL input — callers
    should treat that case as "nothing to cluster"."""
    mx = df.agg(F.max(col_x).alias("x"), F.max(col_y).alias("y")).first()
    if mx.x is None or mx.y is None:
        return 16
    return min(31, max(16, int(max(mx.x, mx.y)).bit_length()))
