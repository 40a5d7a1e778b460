"""Distributed connected components — the clustering step of a dedup
pipeline (LSH/near-dup PAIRS -> duplicate CLUSTERS -> one canonical doc
per cluster).

Algorithm: iterative min-label propagation.  Every node starts as its
own component; each round every node takes the minimum label among
itself and its neighbors; convergence when no label changes.  Rounds =
O(graph diameter) — near-dup graphs are unions of near-cliques, so 2-4
rounds in practice; for adversarial high-diameter graphs the round
count is the known cost of this scheme (the alternating large/small-
star scheme trades per-round cost for O(log n) rounds and can slot in
behind the same API).

Scale shape: per round one hash join (edges x labels, both keyed small
rows) + one min-aggregate — ids-only shuffles, no geometry/payloads,
lineage truncated with localCheckpoint so plans stay flat.  The
convergence check is a single count() action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node of the undirected edge list;
    `component` is the smallest node id in the node's component
    (deterministic, retry-safe)."""
    a = F.col(src).alias("node")
    b = F.col(dst).alias("node")
    nodes = edges.select(a).unionByName(edges.select(b)).distinct()
    labels = nodes.select("node", F.col("node").alias("comp")).localCheckpoint()
    bi = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor = (
            bi.join(labels, bi.v == labels.node)
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(pathological diameter; raise max_iter)"
    )
