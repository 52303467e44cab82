"""Graph operators for near-duplicate clustering.

The LSH/minhash stages emit candidate *pairs*; a training-data dedup
pipeline needs *clusters* (keep one doc per connected component of the
near-dup graph). ``connected_components`` closes that gap with an
iterative min-label propagation expressed entirely in DataFrame ops.

Scale notes (100 TB): each round is one shuffle-join of the label table
onto the (bidirectional) edge list plus one min-groupBy — both hash-
partitioned on the node id, so AQE coalesces and the label payload is
16 bytes/row. Round count equals the graph diameter; near-dup graphs
are clique-like (diameter 2-3). For adversarial long chains swap the
round body for the alternating large-star/small-star steps of
Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — O(log^2 n) rounds with the identical join+min building
block. The driver-side loop holds only a changed-row count, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         src: str = "id_a", dst: str = "id_b",
                         node_col: str = "node",
                         max_iterations: int = 25) -> DataFrame:
    """(node, component) for every node, component = min node id
    reachable in the undirected graph.

    ``nodes`` optionally supplies the full vertex set (isolated
    vertices become singleton components); otherwise vertices are
    derived from the edge list. The result is deterministic — labels
    are ids, merges take the min.
    """
    spark = edges.sparkSession
    bidir = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
             .unionAll(edges.select(F.col(dst).alias("u"),
                                    F.col(src).alias("v")))
             .distinct())
    # edge list is reused every round — materialize it once
    bidir = bidir.persist()
    if nodes is None:
        vertices = bidir.select(F.col("u").alias(node_col)).distinct()
    else:
        vertices = nodes.select(F.col(node_col)).distinct()
    labels = vertices.select(node_col, F.col(node_col).alias("component"))

    prev_persisted = None
    for _ in range(max_iterations):
        # min label among each node's neighbors (one join + one groupBy,
        # both partitioned on the id)
        neighbor_min = (bidir.join(labels,
                                   bidir["v"] == labels[node_col])
                        .groupBy("u")
                        .agg(F.min("component").alias("nmin")))
        updated = (labels.join(neighbor_min,
                               labels[node_col] == neighbor_min["u"],
                               "left")
                   .select(labels[node_col],
                           F.least("component",
                                   F.coalesce("nmin", "component"))
                           .alias("component"),
                           (F.col("nmin") < F.col("component"))
                           .alias("__changed"))
                   .persist())
        changed = updated.filter(F.col("__changed")).limit(1).count()
        # previous round's cache is dead once `updated` materialized;
        # release it so a long run holds exactly one label generation
        if prev_persisted is not None:
            prev_persisted.unpersist()
        prev_persisted = updated
        labels = updated.select(node_col, "component")
        if changed == 0:
            break
    result = labels
    if prev_persisted is not None:
        # hand the caller a plan that doesn't depend on loop caches
        result = labels.localCheckpoint(eager=True)
        prev_persisted.unpersist()
    bidir.unpersist()
    return result


def dedup_keep_representatives(df: DataFrame, components: DataFrame,
                               id_col: str = "doc_id",
                               node_col: str = "node") -> DataFrame:
    """Keep one row per near-dup cluster: the component representative
    (min id). One broadcast-able semi-join when the component table is
    small; a shuffle hash join otherwise — either way a single pass."""
    reps = (components.filter(F.col(node_col) == F.col("component"))
            .select(F.col(node_col).alias(id_col)))
    return df.join(reps, id_col, "left_semi")
