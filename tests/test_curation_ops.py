"""Edge-case tests for the round-3 curation/relational operators —
semantics the sf-scale oracle harness can't pin (left-join null
extension, boundary points, constant dimensions, cluster invariants).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_range_join_boundaries(spark):
    from oculus_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    ranges = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 20.0)], "band string, lo double, hi double"
    )
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 19.999), (5, 20.0), (6, -0.5)],
        "pid long, value double",
    )
    got = {
        (r.pid, r.band)
        for r in bucketed_range_join(pts, ranges, "value", "lo", "hi", 4.0).collect()
    }
    # half-open [lo, hi): 10.0 belongs to the upper band only; 20.0 and
    # -0.5 match nothing
    assert got == {(1, "lo"), (2, "lo"), (3, "hi"), (4, "hi")}


def test_bucketed_range_join_left_keeps_unmatched(spark):
    from oculus_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    ranges = spark.createDataFrame([("b", 0.0, 1.0)], "band string, lo double, hi double")
    pts = spark.createDataFrame([(1, 0.5), (2, 5.0)], "pid long, value double")
    out = bucketed_range_join(pts, ranges, "value", "lo", "hi", 1.0, how="left")
    rows = {r.pid: r.band for r in out.collect()}
    assert rows == {1: "b", 2: None}


def test_int8_quantize_constant_dim_is_zero(spark):
    from oculus_data_pipeline_spark.operators.quantize import int8_quantize

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 4.0]), (3, [1.0, 8.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.id: r for r in int8_quantize(emb).collect()}
    # dim 0 is constant -> code 0 for everyone; dim 1 spans [0, 8] ->
    # codes -127, round(4/8*254)-127 = 0, 127
    assert [rows[i].checksum for i in (1, 2, 3)] == [-127 * 2, 0, 127 * 2]
    assert rows[1].q_min == -127 and rows[3].q_max == 127
    assert all(rows[i].n_dims == 2 for i in rows)


def test_canonical_docs_invariants(spark, sf_dir):
    from oculus_data_pipeline_spark.operators.curation import canonical_docs
    from oculus_data_pipeline_spark.sources.tables import load_table

    out = canonical_docs(load_table(spark, sf_dir, "documents")).cache()
    # every cluster's canonical is a member of the cluster, exactly one
    # canonical per cluster, and it carries the cluster's max quality
    per_comp = out.groupBy("comp").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.max("quality_score").alias("maxq"),
    )
    assert per_comp.where("n_canon <> 1").count() == 0
    bad = (
        out.where("is_canonical")
        .join(per_comp, "comp")
        .where(F.col("quality_score") < F.col("maxq"))
    )
    assert bad.count() == 0
    # cluster_size matches the actual member count
    sizes = out.groupBy("comp", "cluster_size").count()
    assert sizes.where(F.col("cluster_size") != F.col("count")).count() == 0
    out.unpersist()


def test_retention_cohorts_week0_covers_all_users(spark, sf_dir):
    from oculus_data_pipeline_spark.operators.sequence import retention_cohorts
    from oculus_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = retention_cohorts(ev).cache()
    # offset-0 cells must exist for every cohort, and their union counts
    # every distinct user exactly once
    week0 = out.where("week_offset = 0")
    assert week0.count() == out.select("cohort_week").distinct().count()
    n_users = ev.select("user_id").distinct().count()
    assert (
        week0.agg(F.sum("n_active_users")).collect()[0][0] == n_users
    )
    assert out.where("week_offset < 0").count() == 0
    out.unpersist()


def test_connected_components_empty_and_single_edge(spark):
    from oculus_data_pipeline_spark.operators.graph_algo import connected_components

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0
    one = spark.createDataFrame([(7, 3)], "src long, dst long")
    got = {(r.id, r.comp) for r in connected_components(one).collect()}
    assert got == {(3, 3), (7, 3)}


def test_pagerank_empty_edges(spark):
    from oculus_data_pipeline_spark.operators.pagerank import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0


def test_sequence_packing_invariants(spark, sf_dir):
    from oculus_data_pipeline_spark.queries import QUERIES

    out = QUERIES["q122_sequence_packing"](spark, sf_dir).cache()
    rows = out.collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, packs in by_source.items():
        packs.sort(key=lambda r: r.pack_id)
        # pack ids are dense from 0 and doc ranges never overlap:
        # pack k's last_doc precedes pack k+1's first_doc
        assert [p.pack_id for p in packs] == list(range(len(packs)))
        for a, b in zip(packs, packs[1:]):
            assert a.last_doc < b.first_doc
        # every pack except the last holds ≥ the 512-token budget once
        # its straddling doc lands (greedy fill ⇒ cum ≥ budget)
        for p in packs[:-1]:
            assert p.pack_tokens > 0
    out.unpersist()


def test_salted_join_left_keeps_unmatched(spark):
    from oculus_data_pipeline_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    small = spark.createDataFrame([(1, "dim1")], "k long, d string")
    got = {(r.k, r.d) for r in salted_join(big, small, on="k", how="left").collect()}
    assert got == {(1, "dim1"), (2, None)}


def test_snapshot_diff_roundtrip_reconstructs_new(spark, sf_dir):
    """Applying the diff to the old snapshot must reproduce the new one
    exactly: new == (old minus removed, with changed rows updated, plus
    added rows) — the semantic contract that makes the diff usable for
    incremental backfill."""
    from oculus_data_pipeline_spark.operators.scd import snapshot_diff
    from oculus_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    h = F.abs(F.hash("o_orderkey"))
    v1 = orders.where(h % 100 < 90)
    v2 = orders.where(h % 100 >= 10).withColumn(
        "price",
        F.when(h % 3 == 0, F.col("price") * 2).otherwise(F.col("price")),
    )
    diff = snapshot_diff(v1, v2, ["o_orderkey"], ["price"]).cache()
    added = diff.where("status = 'added'").select(
        "o_orderkey", F.col("new_price").alias("price")
    )
    changed = diff.where("status = 'changed'").select(
        "o_orderkey", F.col("new_price").alias("price")
    )
    dirty_keys = diff.select("o_orderkey")
    reconstructed = (
        v1.join(dirty_keys, "o_orderkey", "left_anti")
        .unionByName(added)
        .unionByName(changed)
    )
    assert reconstructed.exceptAll(v2).count() == 0
    assert v2.exceptAll(reconstructed).count() == 0
    diff.unpersist()


def test_table_fingerprint_is_mergeable(spark, sf_dir):
    """Fingerprints of disjoint halves must merge (sum counts, sum
    digests mod 2^61-1 per bucket — merge_fingerprints) into the
    fingerprint of the whole — the property that lets incremental
    loads update checksums without rescanning history. Holds because
    (a+b) mod M == ((a mod M) + (b mod M)) mod M."""
    from oculus_data_pipeline_spark.operators.scd import (
        merge_fingerprints,
        table_fingerprint,
    )
    from oculus_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_linenumber", "l_returnflag"]
    whole = table_fingerprint(li, "l_orderkey", cols)
    # three-way split: >2 partials per bucket exercises the
    # DECIMAL-sum-then-remod path beyond a single pairwise fold
    parts = [
        table_fingerprint(
            li.where(f"l_partkey % 3 = {i}"), "l_orderkey", cols
        )
        for i in range(3)
    ]
    merged = merge_fingerprints(
        parts[0].unionByName(parts[1]).unionByName(parts[2])
    )
    w = {(r.bucket, r.n_rows, int(r.digest)) for r in whole.collect()}
    m = {(r.bucket, r.n_rows, int(r.digest)) for r in merged.collect()}
    assert w == m


def test_stratified_split_exact_quotas(spark, sf_dir):
    """Every stratum must land exactly floor(80%) train / floor(10%)
    val / remainder test, and assignment must be deterministic."""
    from oculus_data_pipeline_spark.operators.split import stratified_split
    from oculus_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_split(docs, "source", "doc_id")
    counts = {
        (r.source, r.split): r.n
        for r in out.groupBy("source", "split").agg(F.count("*").alias("n")).collect()
    }
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in totals.items():
        n_train = n * 80 // 100
        n_val = n * 10 // 100
        assert counts.get((src, "train"), 0) == n_train, src
        assert counts.get((src, "val"), 0) == n_val, src
        assert counts.get((src, "test"), 0) == n - n_train - n_val, src
    # determinism: a second evaluation assigns identically
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in stratified_split(docs, "source", "doc_id").collect()}
    assert a == b


def test_stratified_split_null_stratum_retained(spark):
    """A NULL stratum is a real stratum: it keeps its rows and gets its
    own exact quota (round-7 fix — the sizes join is null-safe; the
    previous equi-join silently dropped NULL-stratum rows that the
    pre-round-6 window implementation retained)."""
    from oculus_data_pipeline_spark.operators.split import stratified_split
    from pyspark.sql import functions as F

    rows = [(None, f"k{i:03d}") for i in range(50)]
    rows += [("s", f"m{i:03d}") for i in range(20)]
    df = spark.createDataFrame(rows, "stratum string, key string")
    out = stratified_split(df, "stratum", "key")
    assert out.count() == 70  # no rows lost
    null_counts = {
        r.split: r.n
        for r in out.where(F.col("stratum").isNull())
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert null_counts == {"train": 40, "val": 5, "test": 5}


def test_connected_components_converges_on_deep_path_graphs(spark):
    """Regression for the r8 scaling-probe finding: plain neighbor-min
    propagation needs O(diameter) rounds and SILENTLY hit the 20-round
    cap on the 8× fixture's loose-threshold near-dup graph (diameter
    > 20) — unconverged components are wrong results. With root
    hooking + pointer jumping a 200-node path (diameter 199, far past
    the old 20-round cap that silently truncated it) must converge in
    O(log n) rounds to the exact min-label answer; the operator now
    raises rather than return unconverged (default cap 64 — sized for
    ~2^60-node components, free since the loop exits at
    quiescence)."""
    from oculus_data_pipeline_spark.operators.graph_algo import (
        connected_components,
    )

    n = 200
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    stats: dict = {}
    got = {
        (r.id, r.comp)
        for r in connected_components(path, stats=stats).collect()
    }
    assert got == {(i, 0) for i in range(n)}
    assert stats["iterations"] <= 12  # O(log n), nowhere near the cap


def test_connected_components_converges_with_interior_local_minima(spark):
    """The case a sequential-id path CANNOT exhibit, and the one that
    stalled the jump-only variant on the 8× fixture (second r8 probe
    finding): with node ids PERMUTED along a path, interior LOCAL
    MINIMA abound, and a pointer jump through a local-min label gains
    nothing (comp[u] = u) — jump-only collapses a mislabeled region
    one hop per round from its boundary, O(diameter) again. Root
    hooking relabels each whole region per round, so a 211-node
    permuted path must converge well under the cap with exact
    min-labels."""
    from oculus_data_pipeline_spark.operators.graph_algo import (
        connected_components,
    )

    n = 211  # prime, so the stride permutation below is a bijection
    perm = [(i * 73) % n for i in range(n)]
    path = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(n - 1)],
        "src long, dst long",
    )
    stats: dict = {}
    got = {
        (r.id, r.comp)
        for r in connected_components(path, stats=stats).collect()
    }
    assert got == {(i, 0) for i in range(n)}
    assert stats["iterations"] <= 15  # region merges, not hop-by-hop


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Shape-agnostic ground truth: a seeded composite graph (sparse
    Erdős–Rényi blocks, disjoint permuted cycles, a caterpillar,
    self-loops, duplicate and reversed edges — all over scrambled
    sparse ids so label order carries no structure) compared exactly
    against a driver-side union-find. The two path tests pin the
    specific r8 failure modes; this pins the operator against graphs
    nobody designed."""
    import random

    from oculus_data_pipeline_spark.operators.graph_algo import (
        connected_components,
    )

    rng = random.Random(0xC0FFEE)
    # scrambled sparse ids: structure must come from edges alone
    ids = rng.sample(range(1, 10**9), 460)
    edges: list[tuple[int, int]] = []
    # three sparse ER blocks over disjoint id slices (m ≈ n → many
    # small components plus a giant one per block)
    for lo in (0, 100, 200):
        blk = ids[lo : lo + 100]
        edges += [
            (rng.choice(blk), rng.choice(blk)) for _ in range(100)
        ]  # self-loops allowed
    # two disjoint 60-node cycles with permuted ids (high diameter,
    # interior local minima everywhere)
    for lo in (300, 360):
        cyc = ids[lo : lo + 60]
        edges += [(cyc[i], cyc[(i + 1) % 60]) for i in range(60)]
    # a caterpillar: 20-node spine, 1 leaf per spine node
    spine, leaves = ids[420:440], ids[440:460]
    edges += [(spine[i], spine[i + 1]) for i in range(19)]
    edges += [(spine[i], leaves[i]) for i in range(20)]
    # duplicates and reversals must not change anything
    edges += [(b, a) for (a, b) in rng.sample(edges, 40)]
    edges += rng.sample(edges, 40)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp_min: dict[int, int] = {}
    for x in parent:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    expected = {(x, comp_min[find(x)]) for x in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    got = {
        (r.id, r.comp)
        for r in connected_components(df, stats=stats).collect()
    }
    assert got == expected
    assert stats["iterations"] <= 15  # O(log n) region merges


def test_connected_components_giant_component_skew(spark):
    """Late-round skew shape: ONE component owning every node, so the
    hook join's "comp" key degenerates toward a single value — the
    100 TB case the operator's skew note describes (one-row-per-key
    build side + AQE skew split). A 2,000-node sparse ring-plus-chords
    graph with scrambled ids must converge well under the cap and
    label every node with the global min."""
    import random

    from oculus_data_pipeline_spark.operators.graph_algo import (
        connected_components,
    )

    rng = random.Random(7)
    n = 2000
    ids = rng.sample(range(1, 10**12), n)
    edges = [(ids[i], ids[(i + 1) % n]) for i in range(n)]  # ring
    edges += [  # sparse chords keep it one component, diameter ~sqrt
        (rng.choice(ids), rng.choice(ids)) for _ in range(n // 4)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    got = connected_components(df, stats=stats)
    lo = min(ids)
    assert got.count() == n
    assert got.where(f"comp != {lo}").count() == 0
    assert stats["iterations"] <= 15


def test_connected_components_raises_rather_than_return_unconverged(spark):
    """The r8 contract change: exhausting max_iterations without
    quiescence RAISES — the scaling probe showed plain neighbor-min
    silently returning unconverged (wrong) components at the cap, and
    silence is the failure mode, not slowness."""
    import pytest as _pytest

    from oculus_data_pipeline_spark.operators.graph_algo import (
        connected_components,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iterations=1)
