"""Smoke-checks of the driver contract surface itself."""

from __future__ import annotations

import __spark_entry__ as entrymod

from big_data_programming_spark.sources.loaders import TABLES, load
from big_data_programming_spark.sources.schemas import SCHEMAS
from tests.conftest import SMOKE_SF_DIR


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert qs, "catalog must not be empty"
    assert set(osql) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_fixture_schemas_match(spark):
    for t in TABLES:
        df = load(spark, SMOKE_SF_DIR, t)
        expected = {f.name: f.dataType.simpleString() for f in SCHEMAS[t].fields}
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert actual == expected, f"{t}: {actual} != {expected}"
