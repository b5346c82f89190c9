"""Shared pytest fixtures: one SparkSession per test run, a DuckDB
connection with the fixture tables pre-registered as views (mirroring
the driver's oracle setup, __spark_entry__.py:31-38), and the
canonicalization used for cross-engine comparison."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from big_data_programming_spark.session import get_spark
from big_data_programming_spark.sources.loaders import TABLES

#: Correctness checks mirror the driver: sf0.01 (TESTDATA.md:17-18).
SF_DIR = os.environ.get("BDPS_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bdps-tests", cpus=int(os.environ.get("BDPS_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon_cell(v):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # guard against -0.0 vs 0.0 repr drift
        return v + 0.0
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_cell(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # pyspark Row (struct column)
        return tuple(sorted((k, canon_cell(x)) for k, x in v.asDict().items()))
    if isinstance(v, bytes):
        return v.hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name (as the driver does before hashing), then
    canonicalize + sort rows order-insensitively."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return sorted_cols, out


def spark_result(df):
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return canon_rows(cols, rows)


def duck_result(con, sql: str):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = [tuple(r) for r in res.fetchall()]
    return canon_rows(cols, rows)
