"""Fixed-iteration PageRank in exact integer arithmetic.

Floating-point PageRank cannot be compared across engines (parallel
float sums are order-dependent), so ranks are carried as scaled
BIGINTs: pr is rank × 10^scale, a neighbor's contribution is
``pr DIV out_degree`` (floor division — identical in every engine),
and the damping step is ``base + (num × Σcontrib) DIV den``. Every
operation is integer-exact, so the result is bit-identical to any
other engine running the same recurrence — which is what makes the
operator DuckDB-oracle-checkable (q93).

Scale shape: each iteration is one join (ranks ⋈ edges on the source
node) + one aggregation (sum of contributions by destination) — the
standard distributed PageRank round. Degrees are precomputed once and
persisted. Iteration count is fixed by the caller (unrolled lazy
plan); for high iteration counts cut lineage with localCheckpoint as
``connected_components`` does.

The reference has no graph analytics (its graph layer is a sink,
json_to_db.py); this is a north-star §2.13 addition alongside
connected components / degree analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 850,
    damping_den: int = 1000,
    scale: int = 9,
) -> DataFrame:
    """Returns (node, pr) after ``iterations`` synchronous rounds over
    the DIRECTED edge set; ``pr`` is the scaled-integer rank (rank ×
    10^scale as BIGINT). Every node starts at 10^scale; dangling nodes
    (no out-edges) keep only the teleport share — standard simplified
    treatment; symmetrize edges upstream for an ergodic variant.
    """
    # CACHE CONTRACT: nodes/degree-edges are persisted because the
    # returned UNROLLED plan reads them iterations+1 times at action
    # time (nothing here is eager, so unpersisting before return would
    # simply disable the cache). The entries are deduplicated by plan in
    # Spark's CacheManager (repeat calls reuse, not accumulate) and
    # spill under pressure (MEMORY_AND_DISK); a caller embedding this
    # in a long-lived session owns `spark.catalog.clearCache()` /
    # unpersist after materializing (r10 review note, same class as the
    # r9 ivf advice but with no eager phase to hide the unpersist in).
    one = 10**scale
    base = (damping_den - damping_num) * one // damping_den
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    nodes = (
        e.select(F.explode(F.array("e_src", "e_dst")).alias("node"))
        .distinct()
        .persist()
    )
    # degree-annotated edges are loop-invariant: join degrees ONCE and
    # pre-partition on the probe key so every iteration's rank join
    # reuses this layout instead of re-joining deg + re-shuffling edges
    ed = (
        e.join(e.groupBy("e_src").agg(F.count("*").alias("deg")), "e_src")
        .repartition("e_src")
        .persist()
    )
    ranks = nodes.withColumn("pr", F.lit(one).cast("long"))
    for _ in range(iterations):
        contribs = (
            ranks.join(ed, ranks.node == ed.e_src)
            .select(
                F.col("e_dst").alias("node"),
                F.expr("pr DIV deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(in_sum, 0L)) DIV {damping_den}"
                    )
                ).cast("long").alias("pr"),
            )
        )
    return ranks
