"""Explain-plan introspection (SURVEY.md §5.2.5, L7 design rule).

The 100 TB contract is enforced at the *plan* level: filters reach the
scan, dim joins broadcast, bucketed joins skip the exchange. These
helpers expose the physical plan as text so tests (and users auditing
a query before a cluster run) can assert those properties.
"""

from big_data_programming_spark.plans.explain import (
    evaluate_fully,
    executed_parquet_scan_count,
    executed_parquet_scan_count_during,
    executed_plan,
    formatted_plan,
    scan_read_columns,
)

__all__ = [
    "evaluate_fully",
    "executed_parquet_scan_count",
    "executed_parquet_scan_count_during",
    "executed_plan",
    "formatted_plan",
    "scan_read_columns",
]
