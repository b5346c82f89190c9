"""Physical-plan text extraction used by the scale-hygiene tests.

Spark's user-facing ``df.explain()`` prints to stdout; asserting on a
plan needs the string. Both helpers go through ``queryExecution`` on
the JVM side, so they reflect exactly what would run — including AQE's
initial plan (the final plan only exists after execution; callers that
need it materialize first, as test_flagship_q1_has_partial_aggregate
does).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as a string (``== Physical Plan ==`` body)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` output: operator tree plus per-node
    details (PushedFilters, ReadSchema, PartitionFilters, ...)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def scan_read_columns(df: DataFrame) -> list[str]:
    """Column names the (first) parquet scan actually reads — the
    column-pruning ground truth. Empty list if no scan node matched."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
