"""Iterative graph algorithms over (src, dst) edge DataFrames.

``connected_components`` is min-label propagation: every node
repeatedly adopts the smallest component id among itself and its
neighbors until a fixpoint. Each iteration is one shuffle (join on the
edge endpoint + min-aggregate); convergence takes O(graph diameter)
iterations — near-dup clusters are shallow (diameter ≲ 3), so this
terminates in a handful of rounds at any corpus size. Lineage is cut
with localCheckpoint per round so the plan doesn't grow unboundedly
(the standard Spark iterative-algorithm pattern; GraphFrames does the
same internally).

Primary use here: collapsing pairwise near-duplicate edges
(lsh_verified_near_dups) into transitive dedup clusters with a
deterministic canonical representative (the min id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Returns (id, component) for every node appearing in ``edges``;
    component = min node id reachable (deterministic canonical)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"),
            )
        )
        updated = updated.localCheckpoint()
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .where(F.col("u.comp") != F.col("l.comp"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("id", "comp")
