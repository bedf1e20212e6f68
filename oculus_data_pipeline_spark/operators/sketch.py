"""Mergeable frequency sketches for heavy-hitter detection.

Count-min is the standard streaming/distributed answer to "what are
the hot keys?" when the key domain is too large to aggregate exactly:
a depth×width counter grid where each row hashes the key into one
bucket, updated with map-side partial sums (the grid is trivially
mergeable — entrywise addition — so partial sketches combine across
partitions, micro-batches, or days). The point estimate is the MIN
over the depth rows, which can only OVERcount (collisions add, never
subtract): est ≥ exact always, and est ≤ exact + εN with probability
1−δ for width = e/ε, depth = ln(1/δ).

Everything here is deterministic given the md5-derived hash rows, so
a DuckDB oracle replays the sketch bit-for-bit — same counters, same
estimates, same one-sided error attestation. Each row is hashed ONCE:
the depth-d buckets (and count-sketch signs) are disjoint spans of a
single md5 digest, not d separate salted hashes — at 100 TB the hash
is the sketch pass's dominant cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hex_span, key_digest


def _depth_buckets(dg: str, depth: int, width: int):
    """(d, bucket) structs over a digest column — ONE definition shared
    by the grid build and every probe, so a span-layout or modulus edit
    can never make build and probe hash differently (r9 review: the
    expression was hand-duplicated five times across this module, a
    silent-garbage-estimates hazard). Each depth's bucket is a disjoint
    5-hex-char span of the single md5 digest (20 bits ≥ any practical
    width): one hash per row, exploded as already-computed values."""
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                (hex_span(dg, 1 + 5 * d, 5) % width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def _signed_depth_buckets(dg: str, depth: int, width: int):
    """(d, bucket, sg) structs for count-sketch: the shared
    :func:`_depth_buckets` layout plus a ±1 sign from the parity of
    the single hex char at position 16+d."""
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                (hex_span(dg, 1 + 5 * d, 5) % width).alias("bucket"),
                (hex_span(dg, 16 + d, 1) % 2 * 2 - 1).alias("sg"),
            )
            for d in range(depth)
        ]
    )


def _bit_positions(dg: str, k_hashes: int, width_bits: int):
    """Bloom bit positions over a digest column — shared by the filter
    build and the membership probe (same duplication hazard as
    :func:`_depth_buckets`)."""
    return F.array(
        *[
            (hex_span(dg, 1 + 5 * h, 5) % width_bits)
            for h in range(k_hashes)
        ]
    )


def cms_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """The count-min grid: (d, bucket, cnt), depth·width rows total.

    Scale shape: ONE hash aggregation whose shuffle is bounded at
    depth·width rows per task regardless of input size (map-side
    partials collapse each partition to the grid first) — the same
    bounded-shuffle pattern as scd.table_fingerprint. The grid from
    two inputs merges by summing cnt entrywise, which is what makes
    this the incremental/streaming frequency structure. Keys hash via
    the null-safe prefix code (functions/hashing.key_digest), so NULL
    is a real, countable key."""
    dg = df.select(key_digest(F.col(key_col).cast("string")).alias("dg"))
    return (
        dg.select(F.explode(_depth_buckets("dg", depth, width)).alias("x"))
        .select(F.col("x.d").alias("d"), F.col("x.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def count_sketch_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
    topk: int = 20,
) -> DataFrame:
    """Count-sketch (signed) frequency estimates next to
    :func:`cms_heavy_hitters`'s count-min: each depth row hashes the
    key to a bucket AND a ±1 sign, so collisions cancel in expectation
    instead of always adding — the estimator median(sign·counter) is
    UNBIASED where count-min's min is one-sided. The price: signed
    counters can under- as well as over-estimate, so the attestation
    reports the signed error instead of a soundness bit.

    Output: (key, exact_n, est_n, err) for the top-k keys by exact
    count. With depth = 3 the median is the middle of three signed
    reads — closed-form, so a DuckDB oracle replays it exactly.

    Scale shape: identical to the CMS grid — one bounded hash
    aggregation (≤ depth·width rows per task), entrywise-mergeable
    (signed sums add), broadcast to the probe side."""
    if depth != 3:
        raise ValueError(
            "the closed-form median (sum − min − max) is depth-3-specific"
        )
    keyed = df.select(F.col(key_col).cast("string").alias("key"))

    def spans():
        return F.explode(_signed_depth_buckets("dg", depth, width))

    grid = (
        keyed.withColumn("dg", key_digest(F.col("key")))
        .select(spans().alias("x"))
        .select(
            F.col("x.d").alias("d"),
            F.col("x.bucket").alias("bucket"),
            F.col("x.sg").alias("sg"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("sg").alias("cnt"))
    )
    exact = keyed.groupBy("key").agg(F.count("*").alias("exact_n"))
    probe = (
        exact.withColumn("dg", key_digest(F.col("key")))
        .select("key", "exact_n", spans().alias("x"))
        .select(
            "key",
            "exact_n",
            F.col("x.d").alias("d"),
            F.col("x.bucket").alias("bucket"),
            F.col("x.sg").alias("sg"),
        )
    )
    reads = probe.join(F.broadcast(grid), ["d", "bucket"]).select(
        "key", "exact_n", (F.col("sg") * F.col("cnt")).alias("read")
    )
    est = reads.groupBy("key", "exact_n").agg(
        # median of 3 = sum − min − max (closed-form, oracle-exact)
        (
            F.sum("read") - F.min("read") - F.max("read")
        ).alias("est_n")
    )
    return (
        est.orderBy(F.desc("exact_n"), F.asc("key"))
        .limit(topk)
        .select(
            "key",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("err"),
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
    topk: int = 20,
) -> DataFrame:
    """Top-k keys by count-min estimate, attested against exact counts:
    (key, exact_n, est_n, overcount, sound) where
    sound = est_n ≥ exact_n — the sketch's one-sided guarantee, which
    holds deterministically for every key under any merge order.

    The exact side exists to attest the sketch (this is the
    q134/q147-style closed-form companion pattern); the production
    path at 100 TB queries the broadcast grid for candidate keys only
    and never materializes exact counts. Scale shape: the grid is
    depth·width rows broadcast to the probe side; the only full-data
    shuffles are the two bounded aggregations (grid + exact counts)."""
    grid = cms_counters(df, key_col, depth, width)
    exact = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("exact_n"))
    )
    probe = exact.withColumn("dg", key_digest(F.col("key"))).select(
        "key",
        "exact_n",
        F.explode(_depth_buckets("dg", depth, width)).alias("x"),
    ).select("key", "exact_n", F.col("x.d").alias("d"), F.col("x.bucket").alias("bucket"))
    est = (
        probe.join(F.broadcast(grid), ["d", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return (
        est.orderBy(F.desc("est_n"), F.asc("key"))
        .limit(topk)
        .select(
            "key",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
            (F.col("est_n") >= F.col("exact_n")).alias("sound"),
        )
    )


def bloom_filter_positions(
    df: DataFrame,
    key_col: str,
    width_bits: int = 2048,
    k_hashes: int = 3,
) -> DataFrame:
    """The Bloom filter as a relation: the DISTINCT set bit positions
    (≤ width_bits rows) from hashing every build-side key k_hashes
    times. Mergeable by union+distinct (bitwise OR), broadcastable to
    any probe side, and cross-engine deterministic via the md5 hash
    family. One bounded aggregation: map-side distinct caps each
    task's output at width_bits rows regardless of build size."""
    return (
        df.select(key_digest(F.col(key_col).cast("string")).alias("dg"))
        .select(
            F.explode(_bit_positions("dg", k_hashes, width_bits)).alias(
                "pos"
            )
        )
        .distinct()
    )


def bloom_membership_report(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    width_bits: int = 2048,
    k_hashes: int = 3,
) -> DataFrame:
    """Probe a key set against a Bloom filter of the build side and
    attest the filter's contract: NO false negatives (every present
    key passes — deterministic, not probabilistic) and a measured
    false-positive rate for the absent keys. One summary row:
    (n_probed, n_present, n_pass, false_negatives, false_positives,
    fp_rate_bp).

    This is the semi-join pruning primitive behind runtime bloom-join
    filters (sinks/layout.py uses Spark's built-in injection; this
    operator is the explicit, attestable form). Scale shape: the
    filter is ≤ width_bits rows broadcast to the probe; the probe
    side needs one aggregation. The exact present/absent join exists
    only for the attestation — production pruning uses the filter
    alone."""
    filt = bloom_filter_positions(build, build_key, width_bits, k_hashes)
    pkeys = probe.select(F.col(probe_key).cast("string").alias("key")).distinct()
    bkeys = build.select(F.col(build_key).cast("string").alias("key")).distinct()
    probed = (
        pkeys.withColumn("dg", key_digest(F.col("key")))
        .select(
            "key",
            F.explode(_bit_positions("dg", k_hashes, width_bits)).alias(
                "pos"
            ),
        )
        .join(F.broadcast(filt.withColumn("set_", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg((F.count("set_") == k_hashes).alias("passes"))
    )
    # present is decided null-safely: a NULL probe key against a build
    # side containing NULL is PRESENT — a plain equi-join would mark
    # it absent and miscount a false negative as a true negative,
    # breaking the no-false-negatives contract (r9 review; the
    # positions side is already null-safe via key_digest)
    b = bkeys.select(
        F.col("key").alias("__bkey"), F.lit(True).alias("present")
    )
    marked = probed.join(
        F.broadcast(b), F.col("key").eqNullSafe(F.col("__bkey")), "left"
    ).select(
        "key", "passes", F.coalesce("present", F.lit(False)).alias("present")
    )
    return marked.groupBy().agg(
        F.count("*").alias("n_probed"),
        F.sum(F.col("present").cast("long")).alias("n_present"),
        F.sum(F.col("passes").cast("long")).alias("n_pass"),
        F.sum((F.col("present") & ~F.col("passes")).cast("long")).alias(
            "false_negatives"
        ),
        F.sum((~F.col("present") & F.col("passes")).cast("long")).alias(
            "false_positives"
        ),
        F.expr(
            "sum(CAST((NOT present AND passes) AS LONG)) * 10000"
            " div GREATEST(sum(CAST(NOT present AS LONG)), 1)"
        ).alias("fp_rate_bp"),
    )
