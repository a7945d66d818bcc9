"""Canonicalization: connected components over similarity edges
(SURVEY.md §2.11, K4).

Iterative min-label propagation implemented with plain DataFrame joins
(no GraphFrames dependency): every node starts labeled with itself; each
round every node takes the minimum label among itself and its neighbors;
stop when no label changes. Converges in O(diameter) rounds — entity-
similarity components are shallow (near-duplicate clusters), so this is
3-5 rounds in practice.

Scale notes: each round is one shuffle (groupBy node). ``localCheckpoint``
truncates the exploding lineage every round — without it round N replays
rounds 1..N-1. On a real cluster use ``checkpoint`` to reliable storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """edges (src, dst) -> (node, component) with component = min node id
    (lexicographic) in the component."""
    sym = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .unionByName(edges.select(F.col(dst).alias("x"), F.col(src).alias("y")))
        .distinct()
        # sym is consumed once PER ITERATION; without materialization the
        # whole upstream lineage (e.g. a MinHash-LSH candidate join) would
        # re-execute every round
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("x").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "y"), "y")
            .groupBy("x")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("x", "node")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .withColumn(
                "new_component",
                F.least(F.col("component"), F.coalesce("nbr_component", "component")),
            )
            # the convergence flag rides along in the SAME pass — probing
            # it needs no extra join against the previous round
            .select(
                "node",
                F.col("new_component").alias("component"),
                (F.col("new_component") != F.col("component")).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    else:
        # a silent non-converged return would hand back WRONG components
        # (long duplicate chains legitimately need O(diameter) rounds);
        # fail loudly so the caller raises max_iter instead of shipping
        # split clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (propagation needs O(component diameter) rounds)"
        )
    return labels.select("node", "component")


def merge_components(
    assignment: DataFrame,
    new_edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Fold a NEW batch of similarity edges into an existing
    (node, component) assignment — the incremental form of
    ``connected_components`` for a KG that links entities batch by
    batch (X47).

    Every existing component is contracted to its star — edges
    node -> component, diameter <= 2 no matter how deep the original
    merge history was — so propagation over (star ∪ new_edges)
    converges in O(diameter of the NEW connectivity), not of the
    accumulated graph. Output: (node, component) over all nodes seen
    in either input; component ids stay min-node-id, so re-running
    from scratch over the full edge log yields the identical table
    (idempotence is test-asserted).
    """
    star = assignment.select(
        F.col("node").alias(src), F.col("component").alias(dst)
    )
    return connected_components(
        star.unionByName(new_edges.select(src, dst)), src, dst, max_iter
    )


def canonical_entities(
    forms: DataFrame, edges: DataFrame, col: str = "form"
) -> DataFrame:
    """All forms + components -> (form, canonical_id). Forms with no edge
    are their own canonical entity."""
    comp = connected_components(edges)
    return (
        forms.select(col)
        .distinct()
        .join(comp.withColumnRenamed("node", col), col, "left")
        .withColumn("canonical_id", F.coalesce("component", F.col(col)))
        .select(col, "canonical_id")
    )
