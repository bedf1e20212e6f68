"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed as declarative DataFrame plans (no Python
in the hot path), each designed so the expensive comparison work is
*key-localized* — the property that makes them survive 100 TB:

- exact:   group on a content hash; one shuffle on a well-distributed
           md5 key, map-side partial aggregation for the counts.
- n-gram Jaccard: candidate pairs come from a self-join on *shared
           shingles* (inverted-index join), never a cross join. The
           shuffle key is the shingle; hot shingles are the skew risk,
           so extremely common shingles can be dropped (stop-shingles)
           without changing high-similarity semantics materially.
- MinHash+LSH: fixed-size signatures (num_perms ints per doc) replace
           the full shingle sets; the banded self-join touches only
           docs agreeing on a whole band — the classic sub-quadratic
           near-dup path for web-scale corpora.
- SimHash: one 32/64-bit fingerprint per doc; near-dup = small Hamming
           distance; here exposed as fingerprint computation (bucket
           joins on bit-slices compose on top).

Reference parity: the reference's dedup surface is set-based
first-wins tuple dedup (xml_to_json.py:24-44) and global distinct
terms (json_classification.py:322-335); ``exact_dedup`` generalizes
those; the rest are north-star additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import affine_hash, md5_int, minhash_params
from ..functions.text import normalize_term


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of a normalized text column — the ONE shared
    tokenizer (textstats._toks): empty-safe, so a blank/whitespace-only
    doc yields ``[]`` not ``['']``. Pre-r10 this was an independent
    unfiltered copy — blank docs contributed a phantom ``''`` token to
    OOV/diversity/collocation counts and a 1-token simhash while the
    textstats consumers were being fixed; one definition now serves
    both families (r9 review triage, fixed r10). Shingle paths are
    unchanged for n ≥ 2 (the ``size >= n`` guard already excluded
    blank docs)."""
    from .textstats import _toks

    return _toks(c)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups keyed by md5 of normalized text.

    Returns (content_hash, canonical_id, n_dups). One shuffle on the
    hash; partial min/count run map-side.
    """
    return (
        docs.select(F.md5(normalize_term(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dups"))
    )


def shingle_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Docs with fewer than ``n`` tokens produce no shingles (guarded —
    Spark's ``sequence`` would otherwise happily count backwards).
    """
    toks = F.col("toks")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        docs.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
        .where(F.size("toks") >= n)
        .select("id", F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    prefix_filter: bool = False,
    max_df: int | None = 5,
) -> DataFrame:
    """EXACT near-duplicate pairs by word-n-gram Jaccard ≥ threshold.

    The DEFAULT plan is the stop-shingle-guarded (``max_df=5``) linear
    tier; the unguarded all-pairs exact tier is the explicit opt-in
    ``max_df=None`` (QA/audit use — its inverted-index join is Σ df²,
    quadratic once the shingle vocabulary saturates; measured 6.6× at
    8× data on this testdata where the guarded plan reads 0.9×).
    Nobody gets the quadratic plan by accident.

    Default path: inverted-index self-join on the 48-bit shingle hash
    (int join keys: ~3-4× fewer shuffle bytes than the shingle
    strings), counting |∩| directly from the join output with map-side
    partial aggregation — one pass, no candidate materialization.

    ``prefix_filter=True`` switches to AllPairs-style lossless prefix
    pruning (docs' shingles ordered rarest-first; a qualifying pair
    must collide within each side's first |d| − ⌈t·|d|⌉ + 1 shingles).
    That wins on Zipfian vocabularies where rare shingles prune most
    pairs; on this testdata's adversarially uniform 35-word vocabulary
    it LOSES (measured 74× vs 35× at 8× data — every shingle is hot,
    so the filter pays its overhead and prunes nothing). Both paths
    return identical results; web-scale low-threshold dedup should use
    MinHash-LSH (minhash_candidate_pairs) instead, which measures
    sub-linear here.

    ``max_df`` is the stop-shingle skew guard: shingles appearing in
    more than ``max_df`` documents are dropped from BOTH the
    intersection and the per-doc set sizes, i.e. Jaccard is computed
    over the df-filtered shingle sets — a deterministic semantics an
    exact SQL oracle can mirror.  This caps the inverted-index join's
    per-key fanout at max_df·(max_df−1)/2 pairs, so total join work is
    O(#shingles · max_df²) — linear in corpus size — instead of
    Σ df² (quadratic once the vocabulary saturates, which is exactly
    what the 8× scaling probe shows for the unguarded exact tier).
    High-similarity pairs share their *rare* shingles, so a df cap
    well above the duplicate-cluster size preserves them; on this
    testdata max_df=5 reproduces the exact result pair-for-pair (the
    jaccard value itself can shift slightly on near-identical pairs
    whose shared hot shingles were dropped — filtered-set semantics).
    """
    sh = hashed_shingle_table(docs, text_col, id_col, n)
    if max_df is not None:
        hot = sh.groupBy("sh").agg(F.count("*").alias("df"))
        sh = sh.join(hot.where(F.col("df") <= max_df), "sh").select("id", "sh")
    sh = sh.persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    if not prefix_filter:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("n_inter"))
        )
        inter = (
            inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
            .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        )
    else:
        freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
        w_rank = W.partitionBy("id").orderBy(F.asc("df"), F.asc("sh"))
        ranked = sh.join(freq, "sh").select(
            "id",
            "sh",
            F.row_number().over(w_rank).alias("pos"),
            F.count("*").over(W.partitionBy("id")).alias("n_sh"),
        )
        prefix = ranked.where(
            F.col("pos")
            <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        ).select("id", "sh", "n_sh").persist()
        pa, pb = prefix.alias("a"), prefix.alias("b")
        cand = (
            pa.join(
                pb,
                (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.n_sh").alias("n_a"),
                F.col("b.n_sh").alias("n_b"),
            )
            .distinct()
        )
        sa = sh.withColumnsRenamed({"id": "id_a"})
        sb = sh.withColumnsRenamed({"id": "id_b"})
        inter = (
            cand.join(sa, "id_a")
            .join(sb, ["id_b", "sh"])
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count("*").alias("n_inter"))
        )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def hashed_shingle_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, sh): 48-bit int hash of each distinct shingle — the shared
    input of minhash signature generation AND exact-Jaccard
    verification, so composed operators build it once."""
    return shingle_table(docs, text_col, id_col, n).select(
        "id", md5_int("shingle").alias("sh")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    shingle_n: int = 3,
    hashed_shingles: DataFrame | None = None,
    with_size: bool = False,
) -> DataFrame:
    """Wide minhash signatures: (id, m0..m{P-1}).

    Shingles are hashed once (md5→int, cross-engine deterministic),
    each permutation is an affine universal hash, and all P mins are
    computed as P columns of ONE grouped aggregation — a single
    shuffle on the doc id with map-side partial mins, no row
    expansion. (A long-form unpivot would multiply the shingle rows
    ×P before the shuffle — 16× the shuffle volume for P=16.)

    ``hashed_shingles`` lets a composed operator (lsh_verified_near_
    dups) pass in an already-built (id, sh) table so the corpus is
    shingled exactly once. ``with_size`` adds an ``n_sh`` shingle
    count to the same aggregation — one extra partial count instead
    of a second full pass over the shingle table for callers that
    need set sizes for Jaccard verification.
    """
    sh = (
        hashed_shingles
        if hashed_shingles is not None
        else hashed_shingle_table(docs, text_col, id_col, shingle_n)
    )
    h = F.col("sh")
    perm_cols = [
        affine_hash(h, a, b).alias(f"p{j}")
        for j, (a, b) in enumerate(minhash_params(num_perms))
    ]
    hashed = sh.select("id", *perm_cols)
    aggs = [F.min(f"p{j}").alias(f"m{j}") for j in range(num_perms)]
    if with_size:
        aggs.append(F.count("*").alias("n_sh"))
    return hashed.groupBy("id").agg(*aggs)


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hashed_shingles: DataFrame | None = None,
    with_sizes: bool = False,
) -> DataFrame:
    """LSH banding: docs whose signatures agree on an entire band.

    Band signature is the '-'-joined, perm-ordered minhash values
    (built by plain concat from the wide signature — no extra
    shuffle); the candidate join shuffles on (band, band_sig) — a
    short, well-hashed key, so the quadratic blow-up is confined to
    true near-dup buckets. ``with_sizes`` threads each side's shingle
    count (``n_a``/``n_b``) through from the signature aggregation so
    verification needs no separate size table.
    """
    rows_per_band = num_perms // bands
    sig = minhash_signatures(
        docs,
        text_col,
        id_col,
        num_perms,
        shingle_n,
        hashed_shingles=hashed_shingles,
        with_size=with_sizes,
    )
    band_rows = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                "-",
                *[
                    F.col(f"m{band * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias("band_sig"),
        )
        for band in range(bands)
    ]
    size_cols = ["n_sh"] if with_sizes else []
    band_sigs = (
        sig.select("id", *size_cols, F.explode(F.array(*band_rows)).alias("b"))
        .select(
            "id",
            *size_cols,
            F.col("b.band").alias("band"),
            F.col("b.band_sig").alias("band_sig"),
        )
        .persist()  # feeds both sides of the candidate self-join
    )
    a, b = band_sigs.alias("a"), band_sigs.alias("b")
    out_cols = [F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")]
    if with_sizes:
        # n_a/n_b are functions of the pair key — carrying them through
        # the distinct is free and saves the post-hoc size joins
        out_cols += [F.col("a.n_sh").alias("n_a"), F.col("b.n_sh").alias("n_b")]
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(*out_cols)
        .distinct()
    )


def lsh_verified_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The production near-dup path: MinHash-LSH candidate generation
    (sub-quadratic, ~linear measured) + exact Jaccard verification on
    the candidates only. Returns (id_a, id_b, jaccard ≥ threshold).

    Recall is the LSH band recall (≈1 for J≥0.8 with 16 perms / 4
    bands); precision is exact — false candidates are filtered by the
    true Jaccard. The verification join touches |candidates| × shingle
    rows, not the quadratic all-pairs set.

    The hashed shingle table is built ONCE and persisted: it feeds
    both minhash signature generation (via ``hashed_shingles``) and
    the exact verification joins — one corpus scan + shingle explode
    instead of two. Set sizes ride along the signature aggregation
    (``with_sizes``) and through the candidate pairs, so there is no
    second pass over the shingle table and no post-hoc size joins —
    at 100 TB that removes one full-corpus shuffle and two joins.
    """
    sh = hashed_shingle_table(docs, text_col, id_col, shingle_n).persist()
    cand = minhash_candidate_pairs(
        docs,
        text_col,
        id_col,
        num_perms,
        bands,
        shingle_n,
        hashed_shingles=sh,
        with_sizes=True,
    )
    inter = (
        cand.join(sh.withColumnsRenamed({"id": "id_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b"}), ["id_b", "sh"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash fingerprint over distinct tokens.

    Computed as ``bits`` conditional-sum aggregates in one groupBy —
    no per-bit row explosion, fully codegen'd, one shuffle on doc id.
    """
    tok = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
        .where(F.length("tok") > 0)
        .distinct()
        .withColumn("h", md5_int("tok"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("id").agg(*bit_sums)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("id", fp.cast("long").alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
    n_bands: int = 2,
    max_hamming: int = 1,
) -> DataFrame:
    """Near-duplicate pairs via SimHash band-bucketing + exact Hamming
    verify — the SimHash scale path (q33 only computes fingerprints).

    Pigeonhole completeness: any pair with Hamming distance
    ``< n_bands`` agrees on at least one full band, so with
    ``max_hamming <= n_bands - 1`` the banded equi-join on
    (band_idx, band_val) loses no true pair — candidates come from
    short-key buckets (the MinHash-LSH join shape), never an
    all-pairs theta join. Verification is one JVM expression:
    ``bit_count(fp_a XOR fp_b)``.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    if max_hamming > n_bands - 1:
        raise ValueError("completeness needs max_hamming <= n_bands - 1")
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    fp = simhash(docs, text_col, id_col, bits)
    bands = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.band_idx"), F.col("b.band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()  # a pair can collide in several bands
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_pct: int = 80,
) -> DataFrame:
    """DIRECTED near-containment pairs: (id_a, id_b) where at least
    ``threshold_pct`` % of a's distinct n-gram shingles also occur in
    b. Asymmetric by design — catches "a is an excerpt/quote of b",
    which symmetric Jaccard misses when |b| ≫ |a| (the classic
    boilerplate / quoted-reply case in training-data dedup).

    Same inverted-index self-join shape as ngram_jaccard_pairs — the
    only differences are keeping both orderings (containment is
    directed) and thresholding on |∩| · 100 ≥ pct · |A| in exact
    integer arithmetic. Shares hashed_shingle_table with the
    minhash/LSH family, so composed plans build the shingles once.
    Exact tier: inherits the quadratic worst case on hot shingles;
    web-scale use should pre-bucket with minhash_candidate_pairs and
    feed the candidates through the same integer threshold.
    """
    sh = hashed_shingle_table(docs, text_col, id_col, n).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") != F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .where(F.col("n_inter") * 100 >= F.lit(threshold_pct) * F.col("n_a"))
        .select(
            "id_a",
            "id_b",
            F.round(F.col("n_inter") / F.col("n_a"), 6).alias("containment"),
        )
    )


def cross_overlap_pairs(
    sh_corpus: DataFrame,
    sh_bench: DataFrame,
    min_shared: int = 8,
) -> DataFrame:
    """Cross-corpus contamination pairs: (id_a from corpus, id_b from
    bench, n_shared distinct shingles) where n_shared ≥ ``min_shared``.
    The decontamination primitive for training pipelines — find
    training docs that leak evaluation/benchmark content.

    Inputs are two hashed_shingle_table outputs. Inverted-index
    equi-join on the 48-bit shingle hash with map-side partial
    counting; the benchmark side is typically tiny (thousands of eval
    docs vs billions of training docs), so AQE broadcasts it and the
    training side never shuffles.
    """
    a = sh_corpus.select(F.col("id").alias("id_a"), "sh")
    b = sh_bench.select(F.col("id").alias("id_b"), "sh")
    return (
        a.join(b, "sh")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
