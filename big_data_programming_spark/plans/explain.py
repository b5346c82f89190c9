"""Physical-plan text extraction used by the scale-hygiene tests.

Spark's user-facing ``df.explain()`` prints to stdout; asserting on a
plan needs the string. Both helpers go through ``queryExecution`` on
the JVM side, so they reflect exactly what would run — including AQE's
initial plan (the final plan only exists after execution; callers that
need it materialize first, as test_flagship_q1_has_partial_aggregate
does).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as a string (``== Physical Plan ==`` body)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` output: operator tree plus per-node
    details (PushedFilters, ReadSchema, PartitionFilters, ...)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def scan_read_columns(df: DataFrame) -> list[str]:
    """Column names the (first) parquet scan actually reads — the
    column-pruning ground truth. Empty list if no scan node matched."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]


def executed_parquet_scan_count(df: DataFrame) -> int:
    """How many parquet scans a query EXECUTES, post runtime reuse —
    executes ``df.count()`` and reads the SQL status store (available
    with the UI disabled) for that execution's final plan graph.

    Why this exists (round-9 audit): the plan STRING massively
    overcounts scans — ``InMemoryTableScan`` nodes re-print their
    cached build subtree per occurrence, and identical broadcast
    subtrees (the house 1-row-aggregate attach idiom) print fully even
    though AQE stage reuse executes them once. l5k's string shows 12
    ``Scan parquet`` nodes; the status store shows TWO scans actually
    ran (the cached featurize + one skinny label pass). Runtime truth
    is the 100 TB number that matters, so the scan-bound tests pin
    this alongside the static upper bounds."""
    df.count()
    store = df.sparkSession._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    eid = execs.apply(execs.size() - 1).executionId()
    metric_values = store.executionMetrics(eid)
    executed = 0
    nodes = store.planGraph(eid).allNodes().iterator()
    while nodes.hasNext():
        node = nodes.next()
        if not node.name().startswith("Scan parquet"):
            continue
        mets = node.metrics().iterator()
        while mets.hasNext():
            m = mets.next()
            if m.name() != "number of files read":
                continue
            opt = metric_values.get(m.accumulatorId())
            if opt.isDefined():
                # displayed values look like "1" or "3 (1, 1, 1)"
                first = str(opt.get()).strip().split(" ")[0].replace(",", "")
                if first.isdigit() and int(first) > 0:
                    executed += 1
    return executed
