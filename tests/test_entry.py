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
    """The declared SCHEMAS must equal what Spark would INFER from the
    fixture parquet. load() applies SCHEMAS directly (r11 footer-read
    optimization), so inferring through load() would compare the
    declared schema to itself; infer independently via a bare
    spark.read.parquet so drift between SCHEMAS and regenerated fixture
    files (renamed/retyped column) fails here, not as runtime null-fill
    (the r11 advisor's catch)."""
    import os

    for t in TABLES:
        df = load(spark, SMOKE_SF_DIR, t)
        inferred = spark.read.parquet(os.path.join(SMOKE_SF_DIR, f"{t}.parquet"))
        declared = {f.name: f.dataType.simpleString() for f in SCHEMAS[t].fields}
        via_load = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        from_file = {f.name: f.dataType.simpleString() for f in inferred.schema.fields}
        assert via_load == declared, f"{t}: {via_load} != {declared}"
        assert from_file == declared, f"{t}: inferred {from_file} != declared {declared}"
