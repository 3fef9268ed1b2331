from .audit import (
    formatted_plan,
    partition_filters_line,
    pushed_filters_line,
    read_schema_line,
    uses_python_row_udf,
)

__all__ = [
    "formatted_plan",
    "partition_filters_line",
    "pushed_filters_line",
    "read_schema_line",
    "uses_python_row_udf",
]
