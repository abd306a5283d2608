"""Plan-inspection helpers: make optimizer behavior testable.

At 100 TB the difference between "filter reached the parquet scan" and
"filter ran after a full materialize" is the job. These helpers turn
``.explain`` output into assertions so pushdown, column pruning, and
codegen coverage are pinned by tests instead of eyeballed.
"""

from .inspect import (
    assert_no_python_row_udf,
    assert_pushed_filter,
    assert_read_schema_only,
    codegen_stage_count,
    explain_string,
    scan_info,
)

__all__ = [
    "assert_no_python_row_udf",
    "assert_pushed_filter",
    "assert_read_schema_only",
    "codegen_stage_count",
    "explain_string",
    "scan_info",
]
