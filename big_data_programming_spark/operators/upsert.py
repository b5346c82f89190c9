"""Keyed latest-state reduction — the MERGE/upsert core (SURVEY.md
§2.9 ST11).

``latest_per_key`` reduces any relation to one row per key, keeping the
row with the greatest ``order_cols`` tuple. It is the idempotent merge
step of every CDC / incremental-snapshot pipeline: applying it to
(current_snapshot ∪ new_batch) yields the next snapshot, regardless of
how the input was batched.

Scale shape: a single ``groupBy(keys)`` with a ``max_by`` over a struct
— one key-partitioned shuffle with map-side partial aggregation, no
window, no sort, no join. At 100 TB the snapshot stays partitioned by
key across versions, so successive merges co-locate with the incoming
batch (write the snapshot bucketed by key — sources/loaders.py
``write_bucketed`` — and even the merge shuffle disappears on the
snapshot side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """One row per ``keys``: the row with the greatest ``order_cols``
    tuple (lexicographic struct comparison; make the tuple unique —
    e.g. include an id — for a deterministic result)."""
    payload = [c for c in df.columns if c not in keys]
    winner = F.max_by(F.struct(*payload), F.struct(*[F.col(c) for c in order_cols]))
    return (
        df.groupBy(*keys)
        .agg(winner.alias("_latest"))
        .select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload])
    )
