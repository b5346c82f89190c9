"""big_data_programming_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and
data-processing capabilities of ``JqKOU/Big_Data_Programming``
(reference checkout at ``/root/reference`` is empty at v0 — see
SURVEY.md §0; the capability surface is defined by SURVEY.md §2).

Design stance (SURVEY.md §7): a thin, idiomatic layer over the Spark
DataFrame/SQL API. Logical plans are declared declaratively and Catalyst
+ Tungsten pick the physical strategy; no bespoke planner, no custom
Catalyst rules. Python crosses into the JVM only as plan-building calls;
data stays JVM-side except for explicitly-marked Pandas-UDF escape
hatches (Arrow-batched, never row-at-a-time in hot paths).

Layout:
    session.py     SparkSession factory tuned for local[32] testing and
                   1000-executor posture (AQE, Arrow, UTC, ANSI).
    sources/       explicit-schema loaders for the 10 fixture tables,
                   CSV/JSON ingest, parquet/CSV/JSON sinks, stream sources.
    operators/     composable relational / window / as-of / dedup /
                   similarity / text operators (DataFrame -> DataFrame).
    functions/     scalar-expression helpers incl. the decimal-exact
                   aggregation canon used for oracle parity.
    plans/         explain-plan introspection used by scale-hygiene tests.
    streaming/     Structured Streaming jobs with deterministic
                   availableNow harnesses and batch twins.
    queries/       the named query catalog: every SURVEY.md §2 operator
                   lands here as a (spark, sf_dir) -> DataFrame callable
                   plus a DuckDB oracle SQL string.
    registry.py    the catalog registry consumed by __spark_entry__.py.
"""

__version__ = "0.1.0"
