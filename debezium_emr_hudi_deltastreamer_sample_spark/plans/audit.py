"""Physical-plan introspection helpers.

The properties that make a query survive a 100× scale-up are PLAN
properties — filters reaching the parquet scan, column pruning, broadcast
vs shuffle joins, partial aggregation, whole-stage codegen, no row-at-a-
time Python in hot paths. These helpers extract them from `df.explain`
output so tests (tests/test_plans.py) and ad-hoc audits can pin them.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _lines_with(plan: str, marker: str) -> list[str]:
    return [l for l in plan.splitlines() if marker in l]


def read_schema_line(plan: str, nth: int = 0) -> str:
    """The nth scan's ReadSchema line — what the scan actually reads;
    columns absent here were pruned before I/O."""
    return _lines_with(plan, "ReadSchema")[nth]


def pushed_filters_line(plan: str, nth: int = 0) -> str:
    """The nth scan's PushedFilters line — predicates evaluated inside the
    parquet reader (row-group/page skipping), not post-scan."""
    return _lines_with(plan, "PushedFilters")[nth]


def partition_filters_line(plan: str, nth: int = 0) -> str:
    """The nth scan's PartitionFilters line — directory-level pruning on a
    hive-partitioned layout; pruned partitions are never even listed."""
    return _lines_with(plan, "PartitionFilters")[nth]


def uses_python_row_udf(plan: str) -> bool:
    """True if the plan contains row-at-a-time Python evaluation
    (BatchEvalPython) — the 10-100× slow path. Arrow-vectorized nodes
    (ArrowEvalPython, FlatMapGroupsInPandas, MapInPandas) are the
    sanctioned escape hatches and do NOT trip this."""
    return "BatchEvalPython" in plan
