"""Cross-engine deterministic aggregation canon (SURVEY.md §7 hard-part 1).

The driver hash-compares Spark results against DuckDB. A plain
``SUM(double)`` is order-dependent: Spark sums per-partition then
merges, DuckDB sums in its own order, and the two doubles differ in the
last bits — rounding afterwards only shrinks, never eliminates, the
mismatch window.

The canon used by every query in this repo instead makes the aggregate
itself exact:

    Spark :  sum(col.cast(DECIMAL(38,10))).cast(double)
    DuckDB:  CAST(SUM(CAST(expr AS DECIMAL(38,10))) AS DOUBLE)

double→decimal(38,10) is a deterministic rounding both engines perform
identically (round-half-up at the 10th fractional digit; exact ties
require the double's binary expansion to terminate exactly there, which
fixture data never does). The decimal SUM is exact integer arithmetic —
associative, order-free — and decimal→double is again deterministic.
Net: bit-identical doubles on both sides, at any partition count.

Cost: decimal aggregation is slower than double aggregation, but it
stays inside whole-stage codegen (no Python boundary) and is still a
single-pass hash aggregate; the 2× bench envelope holds (measured in
bench.py). At true 100 TB scale one would flip `dsum` to plain double
sums once an engine-internal comparison replaces the cross-engine hash
gate — the query shapes don't change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for sums over 1e9 rows of 1e10-magnitude
#: values while keeping 10 fractional digits.
DEC = "decimal(38,10)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM over a double column, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def oracle_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`.

    DuckDB's direct DECIMAL→DOUBLE cast is occasionally 1 ulp off the
    correctly-rounded result (observed on q1: 289473120.03 came back as
    …03000003); Spark's BigDecimal.doubleValue *is* correctly rounded.
    Routing through VARCHAR makes DuckDB use strtod, which is correctly
    rounded — verified to match Python's float(Decimal) on all fixture
    groups.
    """
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
        f" AS {alias}"
    )


def oracle_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg` (same VARCHAR-mediated cast, then an
    exact double division both engines perform identically)."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def r6(col: Column, alias: str) -> Column:
    """Round to 6 dp — for quantities where the decimal canon can't apply
    (stddev/corr-style aggregates whose per-engine algorithms differ by
    ~1e-12 relative). Pair with ``ROUND(x, 6)`` in the oracle SQL."""
    return F.round(col, 6).alias(alias)


#: DuckDB fragment: cosine(a, b) over the fixture's 64-dim embeddings
#: with Spark's exact fold order — format with {a}/{b} expressions.
#: 0.0 + x == x in IEEE, so Spark's zero-seeded F.aggregate fold equals
#: DuckDB's first-element-seeded list_reduce, making every cosine
#: bit-identical cross-engine. ONE definition on purpose: this string
#: encodes the load-bearing fold-order canon, and a drifted copy would
#: be a silent last-ulp oracle divergence (r5 review finding).
COS64_SQL = """
list_reduce(list_transform(generate_series(1, 64),
            i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)
/ (SQRT(list_reduce(list_transform(generate_series(1, 64),
         i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), (x, y) -> x + y))
   * SQRT(list_reduce(list_transform(generate_series(1, 64),
           i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)))
"""
