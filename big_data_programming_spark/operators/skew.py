"""Explicit skew-mitigation operators (SURVEY.md §4, L7): salting for
hot keys, beyond what AQE does automatically.

AQE's skew-join splitting handles skewed *shuffle partitions* at join
time, but two cases still need source-level salting at 100 TB:

* **Low-cardinality aggregation** — groupBy over a handful of keys
  (e.g. event_type) puts each whole group on one reducer regardless of
  AQE. Salting the key spreads the partial aggregation over
  ``n_salts × |keys|`` reducers; a second, tiny aggregate merges the
  partials. Works for any algebraic aggregate (sum/count/min/max).
* **Hot-key join where the build side exceeds broadcast** — replicate
  the small side once per salt and scatter the large side's hot keys
  across ``(key, salt)`` buckets. Join output is identical; the hot
  key's rows now land on ``n_salts`` reducers instead of one.

Both transforms are pure row-preserving rewrites, so their queries
hash-match the unsalted oracle formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_programming_spark.functions.canonical import DEC


def _salt(n_salts: int, *cols: Column) -> Column:
    """Deterministic salt in [0, n_salts) from row content — keeps runs
    reproducible (a random salt would also be correct; determinism is
    for the test harness, distribution quality is equivalent)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation: per-(key, salt) partial decimal
    sums + counts, then per-key final merge. Output columns:
    ``group_col, n_rows, total``."""
    salt_col = _salt(n_salts, F.col(salt_source or value_col))
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(group_col, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(value_col).cast(DEC)).alias("_s"),
        )
    )
    return partial.groupBy(group_col).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_s").cast("double").alias("total"),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the large side salted and the small side
    replicated ``n_salts``×. The shuffle key becomes ``(key, salt)``,
    so a hot key's rows spread over ``n_salts`` reducers. The small
    side must tolerate replication (n_salts × |small| rows shuffled).

    ``salt_source`` must be a per-row-varying column of the large side
    (a row id, timestamp, anything high-cardinality): salting from the
    join key itself would hash every row of a hot key to the SAME
    salt and spread nothing.

    The shuffle-hash hint pins the non-broadcast path — salting a
    broadcast join would be pointless (broadcast joins don't shuffle
    and can't skew)."""
    lg = large.withColumn("_salt", _salt(n_salts, F.col(salt_source)))
    sm = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).hint("shuffle_hash")
    return lg.join(sm, [key, "_salt"], "inner").drop("_salt")
