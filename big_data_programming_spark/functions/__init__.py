"""Scalar/aggregate expression helpers (SURVEY.md §2.8, §2.10)."""

from big_data_programming_spark.functions.canonical import (  # noqa: F401
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
    r6,
)
