"""Similarity search over embedding columns (array<float>).

Three tiers:

- ``brute_force_topk`` / ``cosine_pairs``: exact. The pairing is a
  join, the scoring is a JVM higher-order-function fold — fine when
  one side is small (query set, or a threshold prunes early). At 100 TB
  the query side is broadcast so the big side streams through codegen
  with no shuffle at all. ``cosine_pairs`` is an all-pairs theta join —
  quadratic, explicitly NOT the default pair path at scale.
- ``lsh_near_dup_pairs``: the DEFAULT near-dup pair path. Multi-table
  random-hyperplane LSH candidate generation (equi-join on short
  (table, bucket) keys, vectors never shuffled) + exact cosine
  verification of the candidates only — sub-quadratic end to end.
- ``lsh_ann_topk``: random-hyperplane LSH top-k. Each vector gets a
  small sign-bit bucket key; candidate generation is an equi-join on
  the bucket — sub-linear work per query at the cost of recall. Planes
  are derived from a fixed integer recurrence so the operator (and its
  SQL oracle) is fully deterministic with no stored model.

North-star addition (no reference instance; SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_from_norms, cosine_similarity, l2_norm


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    # float32 → float64 once, up front: products/sums then match the
    # DuckDB oracle bit-for-bit (both engines do IEEE double ops).
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def _with_norm(df: DataFrame, vec_col: str, norm_col: str) -> DataFrame:
    # L2 norm once per ROW, so the pair-verify stages below compute
    # only the dot fold per CANDIDATE (cosine_from_norms — bit-exact
    # vs inlining the norms, ~2x on the verify stage at sf0.1).
    return df.withColumn(norm_col, l2_norm(F.col(vec_col)))


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine similarity ≥ threshold."""
    e = _with_norm(
        _as_double(
            emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v"
        ),
        "v",
        "nrm",
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                cosine_from_norms(
                    F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")
                ),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-match).

    The query side is broadcast; ranking is a window partitioned by
    query id with a deterministic (sim desc, id) tie-break.
    """
    from pyspark.sql import Window as W

    q = _with_norm(
        _as_double(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
            ),
            "qv",
        ),
        "qv",
        "qnrm",
    )
    c = _with_norm(
        _as_double(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            ),
            "cv",
        ),
        "cv",
        "cnrm",
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_norms(
                    F.col("qv"), F.col("cv"), F.col("qnrm"), F.col("cnrm")
                ),
                6,
            ).alias("cos_sim"),
        )
        # NULL/mismatched-length vectors score a NULL cosine: drop them
        # BEFORE ranking, like every other tier does implicitly (the
        # pair tiers' threshold filter and the LSH tiers' NULL-bucket
        # equi-join both exclude NULLs). Without this a NULL QUERY
        # vector emits k all-NULL rows, and a NULL corpus vector can
        # enter the top-k of any query with < k real neighbors
        # (desc-nulls-last still assigns row_numbers) (r10 review).
        .where(F.col("cos_sim").isNotNull())
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-0.5, 0.5]^dim.

    Integer Weyl-style recurrence → exact in both Spark and any SQL
    oracle; no RNG, no stored model.
    """
    return [
        ((1 + (plane_idx * dim + d) * 2654435761) % 1000003) / 1000003.0 - 0.5
        for d in range(dim)
    ]


def _bucket_from_planes(vec_col: str, planes2d, n_planes: int):
    """Σ 2^j·[v·p_j > 0] over a P×dim plane-literal array, computed as
    nested higher-order functions (transform → per-plane zip_with left
    fold → weighted sign fold). The per-plane fold order is identical
    to the unrolled form and to the SQL oracle's explicit fold, so sign
    bits are bit-for-bit reproducible — but codegen emits LOOPS over
    the literal arrays instead of P unrolled 64-term expression trees,
    which cuts Catalyst analysis + whole-stage-codegen compile time
    ~5× at P·T = 24 (measured; at 2k vectors the query was
    compile-bound, not data-bound)."""
    dots = F.transform(
        planes2d,
        lambda p: F.aggregate(
            F.zip_with(F.col(vec_col), p, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    weights = F.array(*[F.lit(1 << j).cast("long") for j in range(n_planes)])
    return F.aggregate(
        F.zip_with(
            dots,
            weights,
            lambda d, w: F.when(d > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


# Plane-index stride between hash tables: table t's plane j is
# hyperplane(dim, t*PLANE_STRIDE + j). A FIXED stride (round 7;
# previously t*n_planes + j) makes each table's plane SET independent
# of the plane COUNT — the property that lets a static SQL oracle
# inline every possible plane and gate on a data-dependent P computed
# from COUNT(*) (see queries._gated_bucket_sql). 32 covers any
# realistic auto-sized P (P = 32 ⇒ 2^32 buckets ⇒ ~137 B vectors at
# the 32-per-bucket target); table 0 keeps indices 0..P-1 either way,
# so single-table consumers (q38/q202) were never affected by stride.
PLANE_STRIDE = 32


def _planes2d_expr(dim: int, n_planes: int, table: int = 0):
    """P×dim plane literal built as ONE parsed SQL expression instead of
    P·dim ``F.lit`` py4j round-trips — plan *construction* was ~1.9 s
    per call at P·T = 24 (measured), and the bench times construction.
    ``repr(float)`` is shortest-round-trip, so the parsed double is
    bit-identical to the Python value; the ``D`` suffix keeps the SQL
    parser from reading the literal as DECIMAL."""
    if n_planes > PLANE_STRIDE:
        raise ValueError(
            f"n_planes={n_planes} exceeds PLANE_STRIDE={PLANE_STRIDE}: "
            "per-table plane sets would overlap; raise PLANE_STRIDE "
            "(one constant, mirrored by the oracle builders' p_max)"
        )
    rows = ",".join(
        "array("
        + ",".join(f"{w!r}D" for w in hyperplane(dim, table * PLANE_STRIDE + j))
        + ")"
        for j in range(n_planes)
    )
    return F.expr(f"array({rows})")


def auto_planes(n: int, target_bucket_size: int = 32, p_max: int | None = None) -> int:
    """The plane-count policy: P = max(4, bit_length(N // target)) —
    one more plane per corpus doubling, holding expected bucket
    occupancy (and with it candidates-per-vector) constant as N grows.
    Exact integer math so any SQL engine reproduces it from COUNT(*)
    (DuckDB: ``length(bin(x))`` = bit_length for x ≥ 1). ``p_max``
    optionally clamps — oracle-checked registry queries pass the gated
    oracle's inlined plane budget (16); production callers leave it
    None. EVERY path additionally clamps to ``PLANE_STRIDE`` (the
    documented hard ceiling: plane index sets for adjacent tables
    would overlap past it, and ``_planes2d_expr`` would raise at
    plan-build time — that loud error is reserved for explicit
    ``n_planes`` overrides, so neither the auto policy at ~137 B
    vectors nor an oversized explicit ``p_max`` budget may reach
    it)."""
    p = max(4, (max(n, 1) // max(target_bucket_size, 1)).bit_length())
    return min(p, PLANE_STRIDE) if p_max is None else min(p_max, p, PLANE_STRIDE)


def lsh_bucket_expr(vec_col: str, dim: int, n_planes: int, table: int = 0):
    """Sign-bit bucket id for a vector column: Σ 2^j·[v·p_j > 0].

    ``table`` selects an independent plane set (plane indices
    ``table*PLANE_STRIDE + j``) so multiple hash tables can be derived
    from the one deterministic recurrence — table 0 reproduces the
    original single-table buckets exactly.
    """
    return _bucket_from_planes(vec_col, _planes2d_expr(dim, n_planes, table), n_planes)


def lsh_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 4,
    target_bucket_size: int = 32,
    p_max: int | None = None,
) -> DataFrame:
    """THE default near-dup pair path: multi-table hyperplane LSH
    candidates + exact cosine verification — sub-quadratic, unlike
    ``cosine_pairs`` (the exact all-pairs tier, kept for small inputs
    and as the recall baseline).

    Candidate generation shuffles only (id, table, bucket) triples —
    never the vectors — then the (small) verified candidate pair set
    joins back to the vector table twice for exact scoring, mirroring
    dedup.lsh_verified_near_dups. Recall at threshold t is
    1 − (1 − (1 − θ_t/π)^P)^T over T tables of P planes; more tables
    buy recall linearly in candidate volume, never quadratically.

    **Plane count must grow with the corpus.** A FIXED P gives 2^P
    buckets, so expected candidates are Σ n_b²/2 ≈ N²/2^(P+1) per
    table — quadratic with a small constant, which is exactly the
    failure mode that only shows up at 100× scale. The default
    (``n_planes=None``) therefore sizes P ≈ log2(N / target_bucket
    _size) from a one-pass count, holding expected bucket occupancy —
    and thus candidates-per-vector — constant as N grows: total work
    Θ(N·target_bucket_size·T). ``p_max`` clamps the auto-size when the
    caller's oracle has a fixed inlined plane budget (the registry
    queries pass 16; production leaves it None — the previous
    pinned-P=6 registry variant is gone since round 7, both engines
    now size P from COUNT(*)).
    """
    e = _as_double(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v"
    )
    if n_planes is None:
        # one cheap columnar count to size the index
        n_planes = auto_planes(e.count(), target_bucket_size, p_max)
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_expr("v", dim, n_planes, table=t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    # the (id, table, bucket) triples feed both sides of the self-join
    # WITHOUT a persist: recomputing the bucket projection per side is
    # scan-speed narrow work (loop-form folds, no shuffle), while a
    # persist would materialize N·T rows into executor memory on every
    # call and leak cache across invocations — measured a wash locally
    # and strictly worse at scale
    keyed = e.select("id", F.explode(tables).alias("tb")).select(
        "id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    en = _with_norm(e, "v", "nrm")
    ea = en.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    eb = en.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_from_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int | None = None,
    target_bucket_size: int = 32,
    p_max: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, then exact
    cosine re-rank within the bucket. Equi-join on the bucket key
    replaces the cross join — the scale path.

    Same plane-count policy as :func:`lsh_near_dup_pairs`: by default
    P is sized ≈ log2(|corpus| / target_bucket_size) so per-query
    candidate work stays ~constant as the corpus grows (a fixed P
    leaves buckets of N/2^P — linear per query). ``p_max`` clamps to
    an oracle's inlined plane budget (registry queries pass 16)."""
    from pyspark.sql import Window as W

    q = _as_double(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")), "qv"
    )
    c = _as_double(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")), "cv"
    )
    if n_planes is None:
        n_planes = auto_planes(c.count(), target_bucket_size, p_max)
    q = _with_norm(
        q.withColumn("bucket", lsh_bucket_expr("qv", dim, n_planes)), "qv", "qnrm"
    )
    c = _with_norm(
        c.withColumn("bucket", lsh_bucket_expr("cv", dim, n_planes)), "cv", "cnrm"
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_norms(
                    F.col("qv"), F.col("cv"), F.col("qnrm"), F.col("cnrm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_bipartite_matches(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 4,
    target_bucket_size: int = 32,
    p_max: int | None = None,
) -> DataFrame:
    """Cross-corpus embedding matches (corpus row ~ benchmark row with
    cosine ≥ threshold) via the multi-table LSH bucket join — the
    EMBEDDING-level train/test decontamination pass (the semantic
    sibling of the shingle-overlap check): a corpus document that
    collides with an eval-set document in any hash table and verifies
    above the threshold is flagged.

    Bipartite, not self-join: each side computes its (table, bucket)
    keys with the SAME plane sets, candidates are the bucket
    equi-join, and only candidates pay the exact-cosine verify. The
    benchmark side is typically tiny → its keyed triples broadcast,
    so the corpus never shuffles at all.
    Returns (corpus_id, bench_id, cos_sim).

    Plane count auto-sizes from the CORPUS count by default (round 7
    — the side whose bucket occupancy drives candidate volume; the
    bench side is small and rides whatever buckets the corpus uses).
    """
    if n_planes is None:
        n_planes = auto_planes(corpus.count(), target_bucket_size, p_max)

    def _keyed(df: DataFrame, out_id: str) -> DataFrame:
        e = _as_double(
            df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("v")), "v"
        )
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket_expr("v", dim, n_planes, table=t).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return e.select(out_id, F.explode(tables).alias("tb")).select(
            out_id, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
        )

    cand = (
        _keyed(corpus, "corpus_id")
        .join(F.broadcast(_keyed(bench, "bench_id")), ["tbl", "bucket"])
        .select("corpus_id", "bench_id")
        .distinct()
    )
    cv = _with_norm(
        _as_double(
            corpus.select(
                F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv")
            ),
            "cv",
        ),
        "cv",
        "cnrm",
    )
    bv = _with_norm(
        _as_double(
            bench.select(F.col(id_col).alias("bench_id"), F.col(vec_col).alias("bv")),
            "bv",
        ),
        "bv",
        "bnrm",
    )
    return (
        cand.join(cv, "corpus_id")
        .join(F.broadcast(bv), "bench_id")
        .select(
            "corpus_id",
            "bench_id",
            F.round(
                cosine_from_norms(
                    F.col("cv"), F.col("bv"), F.col("cnrm"), F.col("bnrm")
                ),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_recall_report(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 4,
    p_max: int | None = None,
) -> DataFrame:
    """Recall evaluation of the LSH near-dup path against exact ground
    truth: one row (n_exact, n_lsh, n_common, recall_bp) where
    recall_bp = n_common·10⁴ DIV n_exact (basis points, integer-exact).

    The exact side is the all-pairs tier — this is an EVALUATION
    operator for samples/QA gates, not a production pair path; run it
    on a capped sample at scale. Counts are assembled with aggregates
    and cross joins of three 1-row frames — no driver-side collect.
    """
    exact = cosine_pairs(emb, id_col, vec_col, threshold).select("id_a", "id_b")
    lsh = lsh_near_dup_pairs(
        emb, id_col, vec_col, threshold, dim, n_planes, n_tables, p_max=p_max
    ).select("id_a", "id_b")
    common = exact.join(lsh, ["id_a", "id_b"], "left_semi")
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(lsh.agg(F.count("*").alias("n_lsh")))
        .crossJoin(common.agg(F.count("*").alias("n_common")))
        .select(
            "n_exact",
            "n_lsh",
            "n_common",
            # pin NULL on a degenerate empty exact set in BOTH engines
            # (DuckDB's integer // by zero is engine/version dependent)
            F.expr(
                "CASE WHEN n_exact > 0 THEN n_common * 10000 div n_exact END"
            ).alias("recall_bp"),
        )
    )


def hard_negative_mining(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive/metric training data: per
    query vector, the top-k most-similar corpus vectors with a
    DIFFERENT label — the pairs that carry the most gradient signal in
    a triplet/InfoNCE objective and the standard companion to positive
    pair mining in embedding-model data pipelines.

    Exact tier (broadcast queries, corpus streams through codegen —
    same shape as brute_force_topk with the label-inequality predicate
    fused into the join). The 100 TB path swaps the cross join for
    lsh_ann_candidates and keeps the same label filter + re-rank;
    labels ride the (id, bucket) shuffle, vectors never leave the
    scan."""
    from pyspark.sql import Window as W

    q = _with_norm(
        _as_double(
            emb.where(F.col(id_col) < n_queries).select(
                F.col(id_col).alias("query_id"),
                F.col(label_col).alias("query_label"),
                F.col(vec_col).alias("qv"),
            ),
            "qv",
        ),
        "qv",
        "qnrm",
    )
    c = _with_norm(
        _as_double(
            emb.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(label_col).alias("neighbor_label"),
                F.col(vec_col).alias("cv"),
            ),
            "cv",
        ),
        "cv",
        "cnrm",
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("query_label") != F.col("neighbor_label")),
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        F.round(
            cosine_from_norms(F.col("qv"), F.col("cv"), F.col("qnrm"), F.col("cnrm")),
            6,
        ).alias("cos_sim"),
    ).where(
        # same NULL-cosine drop as brute_force_topk (r10 review)
        F.col("cos_sim").isNotNull()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "cos_sim",
            "rank",
        )
    )


def lsh_bucket_stats(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 4,
    target_bucket_size: int = 32,
    p_max: int | None = None,
) -> DataFrame:
    """Bucket-occupancy histogram of the hyperplane-LSH tables:
    (tbl, bucket_size, n_buckets) — the diagnostic that justifies the
    plane-count auto-sizing (candidate volume per table is
    Σ size·(size−1)/2, so a fat bucket IS the quadratic term; this is
    the statistic the production default P ≈ log2(N/bucket) keeps
    flat as N grows). Two bounded aggregations over (tbl, bucket)
    keys; vectors never shuffle — the bucket id is computed in the
    projection. By default the histogram reports the AUTO-SIZED index
    (the one production actually builds, round 7); pin ``n_planes``
    to diagnose a specific configuration."""
    e = _as_double(emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v")
    if n_planes is None:
        n_planes = auto_planes(e.count(), target_bucket_size, p_max)
    # all T bucket ids in ONE projection + a narrow explode — a
    # per-table union would rescan the corpus T times
    tagged = F.array(
        *[
            F.struct(
                F.lit(t).cast("long").alias("tbl"),
                lsh_bucket_expr("v", dim, n_planes, table=t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    buckets = e.select(F.explode(tagged).alias("tb")).select(
        F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )
    sizes = buckets.groupBy("tbl", "bucket").agg(
        F.count("*").alias("bucket_size")
    )
    return sizes.groupBy("tbl", "bucket_size").agg(
        F.count("*").alias("n_buckets")
    )
