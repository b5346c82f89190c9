"""Binned interval (range) join — the equi-join scale path for
time-interval theta joins (SURVEY.md §2.12 X26).

A bare ``fact.ts BETWEEN i.start AND i.end`` join has no equi
component, so Spark plans BroadcastNestedLoopJoin: O(|fact|·|i|)
comparisons and a hard wall once the interval side outgrows the
broadcast threshold. Binning restores an equi key: each interval
explodes to the fixed-width bins it overlaps (bounded fan-out:
ceil(len/bin)+1 rows), each fact row maps to exactly ONE bin, the
join keys on the bin, and the true range predicate rides along as a
residual filter. Because a fact row has a single bin, no post-join
dedup is needed. Bin width is the one tunable: ~the median interval
length keeps fan-out small and residual selectivity high.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN_UNITS = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY", "minute": "INTERVAL 1 MINUTE"}


def binned_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_unit: str = "hour",
) -> DataFrame:
    """Inner-join fact rows to the intervals containing their
    timestamp (half-open: start <= ts < end) via a ``bin_unit``-wide
    equi key. Returns facts columns + intervals columns (minus the
    internal bin). Empty intervals (start >= end) match nothing, as
    in the theta formulation."""
    if bin_unit not in _BIN_UNITS:
        raise ValueError(f"bin_unit must be one of {sorted(_BIN_UNITS)}")
    step = F.expr(_BIN_UNITS[bin_unit])
    binned_iv = intervals.filter(F.col(start_col) < F.col(end_col)).select(
        "*",
        F.explode(
            F.sequence(
                F.date_trunc(bin_unit, F.col(start_col)),
                F.date_trunc(bin_unit, F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")),
                step,
            )
        ).alias("__bin__"),
    )
    binned_facts = facts.withColumn("__bin__", F.date_trunc(bin_unit, F.col(ts_col)))
    return (
        binned_facts.join(
            binned_iv,
            (binned_facts["__bin__"] == binned_iv["__bin__"])
            & (binned_facts[ts_col] >= binned_iv[start_col])
            & (binned_facts[ts_col] < binned_iv[end_col]),
        )
        .drop("__bin__")
    )
