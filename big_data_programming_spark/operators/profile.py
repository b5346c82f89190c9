"""Single-pass table profiler (SURVEY.md §2.12 extension): per-column
null/distinct/min/max stats — the data-quality report every ingest job
runs before training-data curation.

One ``agg`` computes every column's stats in a single scan (Catalyst
plans the multi-distinct via Expand: rows multiply by the distinct
count, still one pass over storage); the wide 1-row result is then
unpivoted to one row per column. At 100 TB swap the exact
``count_distinct`` for ``approx_count_distinct`` (HLL, no Expand) —
the plan shape is otherwise identical, and exact is kept here because
the DuckDB oracle hash-checks values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per column: (column, n_nonnull, n_distinct, min_val,
    max_val). min/max are cast to string AFTER aggregating, so numeric
    ordering is preserved and the output schema is uniform."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nonnull, n_distinct, min_val, max_val)"
        )
    )
