"""Distributed connected components — the clustering step of a dedup
pipeline (LSH/near-dup PAIRS -> duplicate CLUSTERS -> one canonical doc
per cluster), and the stitch stage of cross-tile polygonize/contour.

Default algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
rounds on ANY graph, each round two ids-only shuffles (a groupBy-min
and an equi-join), so a pathological high-diameter graph (a pixel-chain
contour, a long road network) costs log-rounds instead of the
diameter-rounds a label-propagation scheme pays.  Per round:

- large-star: every node connects its strictly-larger neighbors to the
  minimum of its closed neighborhood;
- small-star: every node connects its smaller-or-equal neighbors (and
  itself) to their minimum.

Both steps preserve connectivity exactly and monotonically shrink the
label potential; the fixpoint is a forest of stars rooted at each
component's minimum id — deterministic, partitioning- and retry-safe.
Convergence is detected with one count+hash action per round.

`connected_components_labelprop` keeps the previous min-label
propagation (O(diameter) rounds, slightly cheaper per round) as the
differential twin and as an explicit choice for graphs known to be
unions of near-cliques (LSH duplicate groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node of the undirected edge list;
    `component` is the smallest node id in the node's component.

    Alternating large-star/small-star: converges in O(log n) rounds
    regardless of graph diameter.  Pass a dict as `stats` to receive
    {'rounds': n} for instrumentation/tests."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # canonical child->parent pairs (u > v), self-loops dropped
    e = (
        edges.select(
            F.greatest(src, dst).alias("u"), F.least(src, dst).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    prev_sig = None
    if e.isEmpty():
        if stats is not None:
            stats["rounds"] = 0
        return nodes.select("node", F.col("node").alias("comp"))
    for _ in range(max_iter):
        rounds += 1
        # ---- large-star: for each u, attach neighbors v > u to
        # m = min(neighborhood(u) + {u})
        nb = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = (
            nb.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        large = (
            nb.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # ---- small-star over the (u > v) result: for each u, attach
        # its smaller neighbors and itself to their minimum
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        children = (
            large.join(smin, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = (
            children.unionAll(smin.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        # ---- fixpoint check: star sets are fixpoints of both steps,
        # so an unchanged (count, hash-sum) signature means converged
        sig = tuple(
            e.agg(
                F.count(F.lit(1)), F.expr("bit_xor(xxhash64(u, v))")
            ).collect()[0]
        )
        if sig == prev_sig:
            if stats is not None:
                stats["rounds"] = rounds
            labels = e.select(F.col("u").alias("node"), F.col("v").alias("comp2"))
            return nodes.join(labels, "node", "left").select(
                "node", F.coalesce("comp2", "node").alias("comp")
            )
        prev_sig = sig
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def connected_components_labelprop(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Min-label propagation twin: every node repeatedly takes the
    minimum label of its closed neighborhood; O(diameter) rounds (one
    join + one min-aggregate each).  Cheaper per round than the
    alternating-star default — use when the graph is known to be a
    union of near-cliques (near-dup groups, 2-4 rounds)."""
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
        f"connected_components_labelprop did not converge in {max_iter} "
        "rounds (diameter exceeds the cap; use connected_components)"
    )
