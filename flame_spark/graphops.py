"""Distributed connected components for dedup grouping.

Near-dup PAIRS (embedding cosine, MinHash-LSH, Jaccard) are only half
of deduplication: the training-data pipeline needs GROUPS — transitive
closures of the pair relation — and one keeper per group. This module
computes components with iterative minimum-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until a fixpoint. Each round is two hash joins + one
aggregation (all DataFrame ops); the round count is bounded by the
graph diameter (near-dup clusters are tiny and dense, so 2-4 rounds in
practice; the classic alternating large-star/small-star optimization
drops the bound to O(log n) rounds on adversarial chains — noted here,
not needed for dedup-shaped graphs). Determinism: the component id is
the MINIMUM member id, so output is independent of partitioning and
iteration order. Each round materializes via localCheckpoint to cut
the growing lineage (a real run at 10^9 edges would persist to the
warehouse instead).

The fixpoint is detected with a changed-row count — one tiny aggregate
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """nodes(id), edges(src, dst) -> (id, component) with component =
    min node id reachable. Singleton nodes keep their own id."""
    # undirected: propagate along both directions
    und = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).union(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct().persist()

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_rounds):
        # neighbor-minimum per node
        nbr = (
            und.join(labels, und["b"] == labels["id"])
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels


def dedup_groups(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_i: str,
    pair_j: str,
) -> DataFrame:
    """-> (id, component, is_keeper): transitive near-dup groups with
    the deterministic keeper = minimum id of each component (the policy
    the reference's exact-dedup keeper uses, flame-spark textops
    exact_dedup_groups)."""
    cc = connected_components(nodes, pairs, id_col, pair_i, pair_j)
    return cc.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )
