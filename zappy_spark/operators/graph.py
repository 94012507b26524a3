"""Iterative DataFrame algorithms: connected components.

Near-duplicate pairs form a graph; production dedup keeps one
representative per CONNECTED COMPONENT (transitive closure), not per
pair — (a,b) and (b,c) near-dups mean a,b,c are one cluster even if
(a,c) was never generated. This is also the missing piece most
pair-based dedup implementations get subtly wrong.

Algorithm: iterative min-label propagation (each node adopts the
smallest component id among itself and its neighbors, until
fixpoint). Per iteration: one join + one aggregation — both
hash-partitioned on the node id, so at 100 TB each round is two
shuffles over (node, label) pairs. Lineage is cut every iteration
with localCheckpoint, or Catalyst plans grow exponentially — the
standard pattern for iterative DataFrame algorithms.
Converges in O(diameter) rounds; near-dup clusters are shallow
(diameter ≲ 5), so 10 rounds is a generous default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum
    node id of its component. Returns (node, component).

    Raises RuntimeError if not converged within ``max_iter`` —
    silent partial convergence would mis-cluster.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # edges may be an expensive upstream plan (e.g. the full
        # MinHash-LSH pipeline); materialize once so each round is a
        # cheap join instead of a full recompute
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        # each node's candidate label: min over its own label and its
        # neighbors' labels
        neighbor_labels = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # cut lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def drop_cluster_dups(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iter: int = 20
) -> DataFrame:
    """Keep one doc (the min id) per near-dup component — the
    transitively-correct version of pairwise removal. ``max_iter``
    bounds the component diameter (near-dup chains are shallow;
    raise it for gradual-drift corpora)."""
    comps = connected_components(pairs, max_iter=max_iter)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("_loser")
    )
    return df.join(losers, F.col(id_col) == F.col("_loser"), "left_anti")
