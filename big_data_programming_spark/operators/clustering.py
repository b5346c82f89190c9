"""Connected-components clustering over similarity pairs (the step
after candidate generation in a production dedup pipeline: near-dup
PAIRS → duplicate CLUSTERS → one kept doc per cluster).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, every node adopts the minimum label in
its neighborhood (via a join along edges); converged when no label
changes. Rounds needed ≈ graph diameter ≤ O(log n) for the
small-world-ish similarity graphs dedup produces.

100 TB posture: each round is one equi-join (edges ⋈ labels, shuffled
on node id) + one min-aggregate — no driver-side graph, state is one
(node, label) row per node. Checkpointing every round truncates the
lineage that iterative DataFrame algorithms otherwise accumulate
(Spark re-plans the whole chain each action without it). The loop's
only driver traffic is the converged? count — a scalar.

The exact twin is a recursive CTE in DuckDB (see
CLUSTERS_ORACLE_SQL), so even this iterative operator is
oracle-checkable — not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (node, component) where component = min node id reachable.
    Deterministic: min() is order-free.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))

    for _ in range(max_iterations):
        # neighbor labels: for each node u, the labels of all v adjacent
        neighbor = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor, labels.node == neighbor.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        # checkpoint-via-materialization: cut lineage so round k+1 does
        # not re-execute rounds 1..k (localCheckpoint avoids needing a
        # checkpoint dir; on a cluster use reliable checkpointing)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs → per-cluster summary: canonical (min) doc id,
    cluster size. Singleton docs (no near-dup) are not rows here —
    production keeps them implicitly."""
    comp = connected_components(pairs)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("node").alias("keep_doc_id"),
    )


#: DuckDB twin: recursive CTE reachability to the minimum-id node.
#: {pairs_sql} must select columns (doc_a, doc_b).
CLUSTERS_ORACLE_SQL = """
WITH RECURSIVE pairs AS ({pairs_sql}),
sym(u, v) AS (
  SELECT doc_a, doc_b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT u, u FROM sym
  UNION
  SELECT s.u, r.lbl
  FROM sym s JOIN reach r ON r.node = s.v
),
comp AS (
  SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
)
SELECT component,
       COUNT(*) AS cluster_size,
       MIN(node) AS keep_doc_id
FROM comp
GROUP BY component
"""
