"""Round-4 third wave: power iteration, IVF+PQ, count-min sketch.

Pins (a) the integer-exact power-iteration matvecs against an
arbitrary-precision NumPy replica of the same trunc-div arithmetic,
(b) convergence of the direction readout when the spectrum actually
has a dominant axis (the testdata embeddings are deliberately
isotropic, so convergence is pinned on planted data), (c) IVF+PQ
finding a planted near-duplicate through the full coarse→residual→
ADC path, and (d) the count-min grid's soundness + entrywise
mergeability — the property that makes it the incremental frequency
structure.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.operators.quantize import (
    ivf_pq_topk,
    power_iteration,
)
from oculus_data_pipeline_spark.operators.sketch import (
    cms_counters,
    cms_heavy_hitters,
)
from oculus_data_pipeline_spark.sources.tables import load_table


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division (Spark ``div`` / DuckDB ``//``)."""
    return a // b if a >= 0 else -((-a) // b)


def test_power_iteration_matches_exact_replica(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.i: int(r.iterate) for r in power_iteration(emb).collect()}
    V = np.array(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    Q = np.round(V * 1_000_000).astype(object)  # exact python ints
    d, n = V.shape[1], V.shape[0]
    G = Q.T @ Q
    ghat = np.array(
        [[_tdiv(int(G[i][j]), n) for j in range(d)] for i in range(d)], dtype=object
    )
    v2 = ghat @ ghat.sum(axis=1)
    assert got == {i: int(v2[i]) for i in range(d)}


def test_power_iteration_converges_on_planted_direction(spark):
    """With a genuinely dominant axis, two exact iterations already
    point at the top eigenvector (the isotropic testdata has a flat
    spectrum by construction, where no power method converges)."""
    rng = np.random.RandomState(7)
    d, n = 16, 200
    axis = rng.randn(d)
    axis /= np.linalg.norm(axis)
    X = 0.1 * rng.randn(n, d) + np.outer(rng.randn(n) * 3.0, axis)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    rows = power_iteration(df).orderBy("i").collect()
    v = np.array([float(r.iterate) for r in rows])
    top = np.linalg.eigh(X.T @ X)[1][:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99


def test_power_iteration_exact_tier_bounds_iters(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        power_iteration(emb, iters=3)


def test_ivf_pq_finds_planted_near_duplicate(spark):
    """End-to-end through coarse assignment → residual encoding → ADC:
    a vector that is a tiny perturbation of the query must land in the
    same coarse list, encode to the same (or adjacent) codes, and rank
    first among the query's neighbors."""
    rng = np.random.RandomState(11)
    d, n = 64, 60
    X = rng.randn(n, d)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    query = 9
    X[40] = X[query] + 1e-4 * rng.randn(d)  # planted near-dup of a query
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    # 8 subspaces × 16 centroids = 32-bit codes: enough resolution
    # that unrelated vectors don't code-collide with the planted pair
    res = ivf_pq_topk(df, n_queries=10, topk=5, n_subspaces=8, k=16).collect()
    mine = sorted(
        [r for r in res if r.query_id == query], key=lambda r: r.rank
    )
    assert mine and mine[0].neighbor_id == 40
    # identical residuals ⇒ identical codes ⇒ ADC distance equals the
    # query's own quantization distance; it must be the strict minimum
    assert all(m.adc_dist >= mine[0].adc_dist for m in mine[1:])


def test_cms_is_exact_when_grid_is_collision_free(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("k")
    )
    out = cms_heavy_hitters(df, "k", depth=3, width=4096, topk=10).collect()
    assert len(out) == 5
    for r in out:
        assert r.exact_n == 20
        assert r.est_n == 20 and r.overcount == 0 and r.sound


def test_cms_overcounts_but_never_undercounts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = cms_heavy_hitters(li, "l_partkey", depth=3, width=64, topk=50).collect()
    assert out
    assert all(r.sound for r in out)  # est >= exact for every key
    assert any(r.overcount > 0 for r in out)  # width 64 must collide


def test_cms_grid_merges_entrywise(spark, sf_dir):
    """sketch(A ∪ B) == sketch(A) + sketch(B) — the mergeability that
    makes the grid maintainable incrementally (per partition, per
    micro-batch, per day) without ever rescanning history."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    whole = {
        (r.d, r.bucket): r.cnt
        for r in cms_counters(li, "l_partkey", depth=2, width=128).collect()
    }
    merged: dict[tuple[int, int], int] = {}
    for part in (a, b):
        for r in cms_counters(part, "l_partkey", depth=2, width=128).collect():
            merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.cnt
    assert merged == whole


def test_count_sketch_is_exact_without_collisions(spark):
    df = spark.range(90).select((F.col("id") % 3).cast("string").alias("k"))
    from oculus_data_pipeline_spark.operators.sketch import count_sketch_estimates

    out = count_sketch_estimates(df, "k", depth=3, width=4096, topk=10).collect()
    assert len(out) == 3
    assert all(r.est_n == r.exact_n == 30 and r.err == 0 for r in out)


def test_count_sketch_requires_depth_three(spark, sf_dir):
    from oculus_data_pipeline_spark.operators.sketch import count_sketch_estimates

    li = load_table(spark, sf_dir, "lineitem")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        count_sketch_estimates(li, "l_partkey", depth=5)


def test_bloom_never_false_negative_and_bounded_fp(spark, sf_dir):
    from oculus_data_pipeline_spark.operators.sketch import bloom_membership_report

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # plant guaranteed-absent keys: at sf0.001 every customer has
    # orders, so the raw probe set would leave nothing to measure
    probe = cust.select("c_custkey").unionByName(
        cust.select((F.col("c_custkey") + 10_000_000).alias("c_custkey"))
    )
    row = bloom_membership_report(
        orders, probe, "o_custkey", "c_custkey", width_bits=8192, k_hashes=3
    ).collect()[0]
    assert row.false_negatives == 0  # the deterministic contract
    assert row.n_present > 0 and row.n_probed > row.n_present
    # sparse filter (≤ ~450 keys × 3 hashes in 8192 bits): the absent
    # side must mostly fail the filter — fp rate well under 50 %
    assert row.fp_rate_bp < 5000


def test_bloom_filter_merges_by_union(spark, sf_dir):
    from oculus_data_pipeline_spark.operators.sketch import bloom_filter_positions

    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderkey") % 2 == 0)
    b = orders.where(F.col("o_orderkey") % 2 == 1)
    whole = {
        r.pos for r in bloom_filter_positions(orders, "o_custkey").collect()
    }
    merged = {
        r.pos for r in bloom_filter_positions(a, "o_custkey").collect()
    } | {r.pos for r in bloom_filter_positions(b, "o_custkey").collect()}
    assert merged == whole


def test_hard_negatives_exclude_same_label(spark):
    """A planted same-label near-duplicate must NOT appear (positives
    are the dedup path's business); the top hard negative is the most
    similar different-label vector."""
    rng = np.random.RandomState(3)
    d, n = 16, 50
    X = rng.randn(n, d)
    X[20] = X[2] + 1e-6 * rng.randn(d)  # same-label twin of query 2
    rows = [(i, [float(x) for x in X[i]], int(i % 2)) for i in range(n)]
    rows[20] = (20, rows[20][1], rows[2][2])  # force same label as query 2
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    from oculus_data_pipeline_spark.operators.similarity import (
        hard_negative_mining,
    )

    res = hard_negative_mining(df, n_queries=5, k=3).collect()
    assert res
    for r in res:
        assert r.query_label != r.neighbor_label
    assert all(r.neighbor_id != 20 for r in res if r.query_id == 2)


def test_rotation_matches_numpy_matmul(spark):
    rng = np.random.RandomState(5)
    d, n = 16, 30
    X = rng.randn(n, d)
    # random orthogonal rotation via QR
    R, _ = np.linalg.qr(rng.randn(d, d))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    from oculus_data_pipeline_spark.operators.quantize import rotate_embeddings

    got = {
        r.vec_id: np.array(r.embedding)
        for r in rotate_embeddings(df, [list(row) for row in R]).collect()
    }
    for i in range(n):
        assert np.allclose(got[i], R @ X[i], atol=1e-12)


def test_opq_rotation_end_to_end_reduces_pq_error(spark):
    """The full OPQ-style calibration loop: power_iteration finds the
    dominant axis, a Householder rotation aligns it with e1 (isolating
    the high-variance direction inside ONE subspace), and re-encoding
    the rotated corpus with the same fixed-seed PQ yields a strictly
    smaller total quantization error than encoding raw — the measured
    payoff of the q148 → rotate → q138 pipeline."""
    from oculus_data_pipeline_spark.operators.quantize import (
        pq_encode,
        power_iteration,
        rotate_embeddings,
    )

    rng = np.random.RandomState(13)
    d, n = 16, 300
    axis = rng.randn(d)
    axis /= np.linalg.norm(axis)
    X = 0.05 * rng.randn(n, d) + np.outer(rng.randn(n) * 2.0, axis)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    # axis estimate from the exact tier (d rows — a bounded pull)
    rows = power_iteration(df).orderBy("i").collect()
    a = np.array([float(r.iterate) for r in rows])
    a /= np.linalg.norm(a)
    # Householder mapping a -> e1: R = I - 2uu^T, u = (a - e1)/|a - e1|
    e1 = np.zeros(d)
    e1[0] = 1.0
    if a[0] < 0:
        a = -a
    u = a - e1
    u /= np.linalg.norm(u)
    R = np.eye(d) - 2.0 * np.outer(u, u)
    assert np.allclose(R @ a, e1, atol=1e-9)

    def total_err(frame):
        return sum(
            r.sq_dist
            for r in pq_encode(frame, n_subspaces=4, k=8, dim=d).collect()
        )

    raw_err = total_err(df)
    rot_err = total_err(rotate_embeddings(df, [list(r) for r in R]))
    assert rot_err < raw_err  # deterministic end-to-end improvement


def test_pq_lloyd_update_descends(spark, sf_dir):
    """Lloyd's monotone-descent guarantee, per subspace: one exact
    assign→update→assign cycle never increases quantization error
    (and on this corpus strictly decreases it)."""
    from oculus_data_pipeline_spark.operators.quantize import pq_train_report

    emb = load_table(spark, sf_dir, "embeddings")
    rows = pq_train_report(emb).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.improved
        assert r.err_trained < r.err_init  # strict on this corpus


def test_full_eigenbasis_opq_rotation_wins_on_multicomponent_data(spark):
    """The case the Householder test cannot show: a MULTI-component
    spectrum whose independent signal directions straddle the PQ
    subspace boundaries. opq_rotation decorrelates with the full
    eigenbasis and BALANCES the components across subspaces (greedy
    log-eigenvalue allocation), so the fixed-seed PQ error drops
    decisively — and the rotation matrix comes from the exact
    distributed Gram with only a bounded d×d driver pull."""
    from oculus_data_pipeline_spark.operators.quantize import (
        opq_rotation,
        pq_encode,
        rotate_embeddings,
    )

    rng = np.random.RandomState(17)
    d, n, n_comp = 16, 400, 4
    basis, _ = np.linalg.qr(rng.randn(d, d))
    comps = basis[:, :n_comp]  # orthogonal signal directions
    weights = rng.randn(n, n_comp) * np.array([3.0, 2.0, 1.5, 1.0])
    X = weights @ comps.T + 0.02 * rng.randn(n, d)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    R = opq_rotation(df, n_subspaces=4)
    assert len(R) == d and len(R[0]) == d
    Rm = np.array(R)
    assert np.allclose(Rm @ Rm.T, np.eye(d), atol=1e-8)  # orthogonal

    def total_err(frame):
        return sum(
            r.sq_dist
            for r in pq_encode(frame, n_subspaces=4, k=8, dim=d).collect()
        )

    raw = total_err(df)
    rot = total_err(rotate_embeddings(df, R))
    assert rot < raw * 0.7  # a decisive, not marginal, improvement


def test_trained_ivf_pq_has_no_degenerate_zero_distances(spark, sf_dir):
    """q149's fixed-seed index ranks code-colliding vectors at ADC 0
    because raw data points ARE codebook entries; after Lloyd training
    (3 integer-grid steps per level since round 8) every centroid is a
    mean, so top-ranked ADC distances are strictly positive and the
    ranking discriminates."""
    from oculus_data_pipeline_spark.operators.quantize import (
        ivf_pq_trained_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = ivf_pq_trained_topk(emb).collect()
    assert len(rows) == 50
    assert all(r.adc_dist > 0 for r in rows)


def test_lpa_splits_bridged_cliques_that_cc_merges(spark):
    """Two 5-cliques joined by ONE bridge edge: connected components
    returns a single component (everything reachable), while
    deterministic LPA resolves two dense-core communities — the
    behavioral difference that makes q169 the near-dup bridge-pair
    splitter rather than a second q76."""
    from oculus_data_pipeline_spark.operators.graph_algo import (
        connected_components,
        label_propagation,
    )

    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 10)], "src long, dst long")
    cc = connected_components(edges)
    assert len({r.comp for r in cc.collect()}) == 1
    lpa = {r.id: r.community for r in label_propagation(edges).collect()}
    com1 = {lpa[i] for i in range(5)}
    com2 = {lpa[i] for i in range(10, 15)}
    assert len(com1) == 1 and len(com2) == 1 and com1 != com2
