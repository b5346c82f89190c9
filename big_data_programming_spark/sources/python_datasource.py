"""Spark 4 Python DataSource API (SURVEY.md §2.12 X59) — the custom
connector seam.

`pyspark.sql.datasource.DataSource` lets a pure-Python reader
participate in Spark's scan machinery with real input partitions: the
planner asks `partitions()` once, then each executor-side task calls
`read(partition)` for its own split — so a Python connector to an
internal API, queue, or exotic format parallelizes like any file scan
(no driver bottleneck, no single-threaded collect-then-parallelize).
The demo source generates deterministic synthetic telemetry (a
Knuth-multiplicative-hash value stream) so the DuckDB oracle can
replay every row bit-for-bit; a real deployment swaps the generator
body for client reads while keeping the partitioning contract.

At 100 TB the caveats are the API's, not ours: rows cross the
Python→JVM boundary through Arrow batches, so a Python source is for
*sources that have no JVM connector*, not a replacement for parquet —
the price is documented here and measured nowhere else in the repo
(every other scan is JVM-native).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: Knuth multiplicative constant / Mersenne modulus — fixture arithmetic
#: chosen to be exactly replayable in 64-bit integer SQL on any engine.
_MULT = 2654435761
_MOD = 2147483647


class _TelemetryReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        # option keys arrive lower-cased from the DataFrame reader
        self.n_parts = int(options.get("partitions", "8"))
        self.rows_per = int(options.get("rowsperpartition", "1000"))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows_per
        for i in range(base, base + self.rows_per):
            yield (i, (i * _MULT) % _MOD, f"cat{i % 5}")


class TelemetrySource(DataSource):
    """`spark.read.format("synthetic_telemetry")` — deterministic rows."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry"

    def schema(self) -> str:
        return "id bigint, val bigint, category string"

    def reader(self, schema: StructType) -> _TelemetryReader:
        return _TelemetryReader(self.options)


def register_telemetry_source(spark: SparkSession) -> None:
    """Idempotent registration (re-registering replaces the entry)."""
    spark.dataSource.register(TelemetrySource)
