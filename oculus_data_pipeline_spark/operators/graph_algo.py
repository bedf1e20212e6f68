"""Iterative graph algorithms over (src, dst) edge DataFrames.

``connected_components`` is Shiloach-Vishkin-style min-label
propagation (neighbor-min + root hooking + pointer jump): label-
regions MERGE every round, so convergence takes O(log n) rounds in
the largest component's node count, independent of graph diameter.
(The original O(diameter) neighbor-min design assumed near-dup
clusters are shallow — the r8 scaling probe DISPROVED that with a
diameter-greater-than-20 fixture; do not reason from the shallow-
cluster model.) Each round is a bounded number of shuffles; lineage
is cut with localCheckpoint per round so the plan doesn't grow
unboundedly (the standard Spark iterative-algorithm pattern;
GraphFrames does the same internally).

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
    max_iterations: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """Returns (id, component) for every node appearing in ``edges``;
    component = min node id reachable (deterministic canonical).

    If ``stats`` is passed, records ``stats["iterations"]`` = the
    number of propagation rounds RUN (including the final no-change
    round that proves quiescence) — the round count ×  per-job fixed
    latency is this operator's cost floor (see SCALING.md's cc-rounds
    section for the measured counts).

    Each round is Shiloach-Vishkin-style: neighbor-min step, then
    ROOT HOOKING (the minimum candidate seen ANYWHERE in a current
    label-region relabels the whole region — a groupBy on the label
    value joined back), then a pointer jump (adopt the label of my
    updated label). Label-regions MERGE every round, so convergence
    takes O(log n) rounds, not O(diameter). History pinned by the r8
    scaling probe: plain neighbor-min SILENTLY hit the 20-round cap on
    the 8× fixture (its loose-threshold near-dup graph has diameter
    > 20 — unconverged components are wrong results, not slow ones),
    and neighbor-min + jump WITHOUT hooking stalled there too (a jump
    through an interior local-minimum label gains nothing: comp[u]=u,
    so a wrongly-labeled region collapses only one hop per round from
    its boundary; a path graph hides this — it has no interior local
    minima). Exhausting ``max_iterations`` without quiescence raises
    instead of returning. The default cap is 64, NOT the observed
    round counts (≤ 7 on every fixture): rounds grow ~log2 of the
    largest component's node count, so a 20-ish cap sized to today's
    fixtures would turn a legitimately-converging 10⁶-node boilerplate
    component at corpus scale into a crash — and the loop exits at
    quiescence, so headroom costs nothing."""
    # symmetrize via explode, not self-union: a union evaluates the
    # upstream edge plan twice before the persist materializes — for
    # derived edge sets (LSH near-dup pairs) that upstream plan IS the
    # expensive part. SELF-LOOPS ride the same explode: with (a, a)
    # and (b, b) rows in the edge set, each round's neighbor-min
    # aggregation sees every node's own label next to its neighbors',
    # so the round needs no separate labels-side join to mix in the
    # current label (one join fewer per round than the previous
    # formulation; +|V| rows is noise next to |E| both locally and at
    # 100 TB). Pre-partitioned on the probe key: every round's
    # propagation join re-uses this layout instead of re-shuffling.
    s, d = F.col(src), F.col(dst)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(s.alias("a"), d.alias("b")),
                    F.struct(d.alias("a"), s.alias("b")),
                    F.struct(s.alias("a"), s.alias("b")),
                    F.struct(d.alias("a"), d.alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .repartition("b")
        .persist()
    )
    # init = min(self, neighbors) — the same one shuffle the old
    # distinct-ids init paid, but labels start one propagation step
    # ahead (one full round saved on every shallow near-dup graph)
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("comp"))
        .select(F.col("a").alias("id"), "comp")
        .localCheckpoint(eager=False)
    )
    changed = 1
    for it in range(max_iterations):
        if stats is not None:
            stats["iterations"] = it + 1
        # fused neighbor-min: min label over neighbors AND self (mid),
        # plus the node's own current label (cur) via the self-loop
        # row — one join + one aggregate, no labels join-back
        stepped = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(
                F.min("comp").alias("mid"),
                F.min(
                    F.when(F.col("b") == F.col("a"), F.col("comp"))
                ).alias("cur"),
            )
        )
        # root hook: the best candidate any member of a CURRENT
        # label-region saw relabels the whole region this round
        # (without this, a region whose label is an interior local
        # minimum shrinks one hop per round). Every candidate is a
        # node id inside the same component (labels only propagate
        # along edges), so hook and jump are monotone and fixpoint-
        # preserving. Since r12 the per-region min is a whole-
        # partition WINDOW over cur instead of groupBy(cur) + join-
        # back on cur — identical hmin per row, one exchange fewer
        # per round (guide §2.4: a window partitioned like the
        # aggregation it replaces shares the shuffle; measured 0.86-
        # 0.94× on the CC consumers, same-session interleaved A/B).
        # Scale note: in late rounds one giant component can own most
        # labels, making cur a skewed key — the window sees the same
        # fat partition the join-back did; the per-row state is one
        # running min (no buffering), so the exposure is the sort,
        # same as before.
        from pyspark.sql import Window as W

        hooked = stepped.withColumn(
            "hmin", F.min("mid").over(W.partitionBy("cur"))
        ).select("a", "cur", F.least("mid", "hmin").alias("mid2"))
        # pointer jump: adopt the label OF my updated label.
        jump = labels.select(
            F.col("id").alias("jid"), F.col("comp").alias("jcomp")
        )
        # the convergence flag rides the checkpointed row — detecting
        # quiescence is then a scan of in-memory data, not a self-join
        updated = (
            hooked.join(jump, hooked.mid2 == jump.jid, "left")
            .select(
                F.col("a").alias("id"),
                F.least(
                    F.col("mid2"), F.coalesce("jcomp", F.col("mid2"))
                ).alias("new_comp"),
                (
                    F.least(F.col("mid2"), F.coalesce("jcomp", F.col("mid2")))
                    < F.col("cur")
                ).alias("chg"),
            )
            # lazy checkpoint: lineage is cut at the first materialization,
            # which the convergence probe below triggers anyway — one job
            # per round instead of an eager-checkpoint job plus a probe job
            .localCheckpoint(eager=False)
        )
        changed = updated.where("chg").limit(1).count()
        labels = updated.select("id", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — with root hooking that means vastly more label-"
            "region merge rounds than log2(n) or a bug; refusing to "
            "return unconverged (silently wrong) components"
        )
    return labels.select("id", "comp")


def two_hop_candidates(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Open wedges: node pairs exactly two hops apart that are NOT
    directly connected — the transitive-closure frontier of a
    similarity graph (candidates a blocked/banded pair generator
    missed but a cluster pass would merge; also the classic
    friend-of-friend recommendation shape).

    One self-join on the shared middle node + one anti-join to drop
    direct edges. The join key is a node id, so skew follows the
    degree distribution — hub nodes are the hot keys, and degree
    capping (dropping super-hubs) is the standard mitigation upstream.
    Returns (src, dst) with src < dst, deduplicated across middles.
    """
    s, d = F.col(src), F.col(dst)
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(s.alias("a"), d.alias("b")),
                F.struct(d.alias("a"), s.alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    u1, u2 = sym.alias("u1"), sym.alias("u2")
    wedges = (
        u1.join(u2, F.col("u1.b") == F.col("u2.a"))
        .where(F.col("u1.a") < F.col("u2.b"))
        .select(F.col("u1.a").alias(src), F.col("u2.b").alias(dst))
        .distinct()
    )
    direct = edges.select(
        F.least(src, dst).alias(src), F.greatest(src, dst).alias(dst)
    )
    return wedges.join(direct, [src, dst], "left_anti")


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation over an UNDIRECTED edge set
    (input rows oriented src < dst, the near-dup pair convention).
    Classic two-join enumeration on the oriented edges — each triangle
    a<b<c is produced exactly once from (a,b)+(b,c)+(a,c), so no
    division by 6 and no symmetrization blow-up. Triangle density
    separates tight duplicate communities from chains of borderline
    pairs. Equi-joins on node ids: shuffle-partitioned, AQE handles
    the skewed hub nodes.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """Synchronous label propagation (LPA) community detection with a
    fully deterministic update: every node adopts the most frequent
    label among its neighbors, ties broken by smallest label — so a
    fixed iteration count is cross-engine replayable (unlike classic
    randomized LPA). Communities differ from connected components:
    CC merges everything reachable; LPA splits a component along
    dense cores, which on a near-dup graph separates distinct
    duplicate groups that share a single borderline bridge pair.

    Each iteration is one join + one count aggregate + one ranked
    pick, all keyed on node ids — the same bounded shapes as
    connected_components, O(E) shuffle per round, no driver-side
    anything. Isolated endpoints cannot occur (every node comes from
    an edge)."""
    from pyspark.sql import Window as W

    s, d = F.col(src), F.col(dst)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(s.alias("a"), d.alias("b")),
                    F.struct(d.alias("a"), s.alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "lbl", F.col("id")
    )
    w = W.partitionBy("a").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(iterations):
        labels = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a", "lbl")
            .agg(F.count("*").alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("a").alias("id"), "lbl")
            .localCheckpoint(eager=False)
        )
    # Unlike connected_components there is NO action inside the loop
    # (no convergence probe — fixed iteration count), so the lazy
    # checkpoints have not materialized yet; unpersisting sym now
    # would make the caller's first action recompute the symmetrized
    # pair plan once per round WITHOUT the cache (r11 review). One
    # eager checkpoint materializes the whole chain while sym is
    # still cached, then the cache can go.
    labels = labels.localCheckpoint(eager=True)
    sym.unpersist()
    return labels.select("id", F.col("lbl").alias("community"))
