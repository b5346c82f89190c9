"""Replays the driver's correctness gate in-repo (SURVEY.md §5.2.2):
for every catalog query with an oracle, run the Spark plan and the
DuckDB SQL on the same sf0.01 parquet and require identical column
names, row counts, and canonicalized values. Queries without an oracle
get a rows-run smoke check (the driver records the same weaker check).
"""

from __future__ import annotations

import pytest

from big_data_programming_spark.registry import catalog
from tests.conftest import SF_DIR, duck_result, spark_result

_CATALOG = catalog()
_WITH_ORACLE = sorted(n for n, q in _CATALOG.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, oracle, name):
    q = _CATALOG[name]
    s_cols, s_rows = spark_result(q.fn(spark, SF_DIR))
    d_cols, d_rows = duck_result(oracle, q.oracle)
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatched rows: {mismatches[:3]}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = _CATALOG[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
