"""Change-history operators: SCD type 2 application and CDC
changelog collapse, without a transactional table format.

With Delta/Iceberg on the classpath these are ``MERGE INTO``s; here
they are emulated exactly with classic set operations (the guide's
sanctioned fallback): anti-join + union for SCD2, max_by-per-key for
CDC. Idempotent given the same inputs, shuffle only on the business
key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    change_date_col: str = "change_date",
) -> DataFrame:
    """Apply ``updates`` (key, attrs..., change_date) to an SCD2
    ``current`` (key, attrs..., valid_from, valid_to).

    Only open rows can be closed; a row is open when valid_to is
    OPEN_END **or NULL** (the common NULL-means-open convention — a
    plain ``!=`` comparison would put NULL-valid_to rows in NEITHER
    branch and silently drop them from the returned history; r9
    review). Untouched NULL-open rows pass through with their NULL
    intact.

    Multiple updates per key form a version CHAIN (batched CDC feeds
    deliver several changes between applies): per key in change_date
    order, the old open row closes at the FIRST change date, each
    update's valid_to is the NEXT update's change date, and the last
    update stays open — the pre-r9 single-shot form closed the open
    row once PER update row, emitting duplicate closed copies and
    several simultaneous open versions. ``change_date`` must be
    unique per key (same contract as cdc_apply's seq_col). The
    per-key window touches only the (small) updates side, never the
    history. Returns the new full history table.
    """
    attr_cols = [c for c in current.columns if c not in (key, "valid_from", "valid_to")]
    upd = updates.select(
        key,
        *[c for c in updates.columns if c not in (key, change_date_col)],
        F.col(change_date_col).alias("__chg"),
    )
    upd_keys = upd.select(key)

    is_open = F.col("valid_to").isNull() | (F.col("valid_to") == OPEN_END)
    open_rows = current.where(is_open)
    closed_rows = current.where(~is_open)

    # close the open row of every updated key at its FIRST change date
    first_chg = upd.groupBy(key).agg(F.min("__chg").alias("__chg"))
    closed_now = open_rows.join(first_chg, key).select(
        key, *attr_cols, "valid_from", F.col("__chg").alias("valid_to")
    )
    untouched_open = open_rows.join(upd_keys, key, "left_anti")
    nxt = F.lead("__chg").over(W.partitionBy(key).orderBy("__chg"))
    new_versions = upd.withColumn("__nxt", nxt).select(
        key,
        *attr_cols,
        F.col("__chg").alias("valid_from"),
        F.coalesce(F.col("__nxt"), F.lit(OPEN_END)).alias("valid_to"),
    )
    return (
        closed_rows.unionByName(closed_now)
        .unionByName(untouched_open)
        .unionByName(new_versions)
    )


def cdc_apply(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse an ordered insert/update/delete changelog (a CDC
    stream) to its latest snapshot: the highest-``seq_col`` row per
    key wins, and keys whose winning op is ``delete_op`` disappear.

    ``max_by(struct(*), seq)`` instead of a row_number window on
    purpose: the aggregate runs a map-side partial, so each shuffle
    partition ships ONE candidate row per key instead of the window
    sort's every-changelog-row shuffle — the difference between
    shuffling the snapshot and shuffling the full history at 100 TB.
    ``seq_col`` must be unique per key (a CDC LSN / commit sequence).

    The delete filter is null-safe: a NULL op is NOT a delete, so keys
    whose winning row carries op=NULL (CDC feeds that only tag
    deletes) appear in the snapshot — a plain ``!=`` made the filter
    NULL and silently dropped those keys (r9 review).
    """
    payload = F.struct(*[F.col(c) for c in changelog.columns])
    latest = changelog.groupBy(*key_cols).agg(
        F.max_by(payload, F.col(seq_col)).alias("__r")
    )
    rest = [c for c in changelog.columns if c not in key_cols]
    return latest.select(
        *key_cols, *[F.col(f"__r.{c}").alias(c) for c in rest]
    ).where(~F.col(op_col).eqNullSafe(F.lit(delete_op)))


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    key: str,
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Temporal (point-in-time) join: each fact row matches the ONE
    dimension version whose [valid_from, valid_to) interval covers the
    fact timestamp — the correctness-critical lookup against an SCD2
    dimension (training-data joins against feature snapshots have the
    same shape; skew/leakage bugs come from getting this wrong).

    The join is an EQUI-join on the business key with the interval
    predicate alongside — per key there are few versions, so this is
    shuffle-partitioned on the key and never a nested loop. ``ts_col``
    must be comparable with the validity bounds (ISO date strings
    compare lexicographically).
    """
    cond = (
        (facts[key] == dim_history[key])
        & (facts[ts_col] >= dim_history["valid_from"])
        & (facts[ts_col] < dim_history["valid_to"])
    )
    return facts.join(dim_history, cond, how).drop(dim_history[key])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Table-version diff — which rows were added, removed, or changed
    between two snapshots of the same keyed table (the audit/validation
    pass behind lakehouse time travel, incremental backfills, and
    regenerated-dataset QA; complements cdc_apply, which goes the other
    direction changelog → snapshot).

    Returns one row per differing key: (*keys, status ∈
    {added, removed, changed}, old_<c>, new_<c> for each compare col).
    Unchanged rows are filtered before anything leaves the join — at
    100 TB the diff output is the (small) change set, never the table.

    Scale shape: ONE full-outer equi-join, hash-partitioned on the key
    in both inputs (co-partitioned: AQE plans a shuffle on each side
    keyed identically; bucketed snapshots make it exchange-free). The
    per-column compare is a narrow null-safe projection. Keys must be
    non-null."""
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"__ok_{key_cols[0]}").isNotNull()
    in_new = F.col(f"__nk_{key_cols[0]}").isNotNull()
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = ne if changed is None else (changed | ne)
    if changed is None:
        # empty compare_cols = a legitimate added/removed-only diff;
        # F.when(None, ...) would raise at plan build (r9 review)
        changed = F.lit(False)
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status") != "unchanged")
        .select(
            *[
                F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
                for k in key_cols
            ],
            "status",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )


def table_fingerprint(
    df: DataFrame,
    key: str,
    digest_cols: Sequence,
    n_buckets: int = 256,
) -> DataFrame:
    """Merkle-style partition checksums: (bucket, n_rows, digest) where
    digest = Σ md5(row) over an order-independent sum — the cheap
    replica/backfill validation pass that tells you WHERE two copies of
    a 100 TB table diverge (then :func:`snapshot_diff` on the few dirty
    buckets tells you WHAT). One hash aggregation with map-side
    partials; the shuffle is ``n_buckets`` rows per task regardless of
    table size, and two runs compare by diffing 256 rows.

    ``digest_cols`` must already be cross-engine string-deterministic
    (integers, strings, pre-scaled decimals — never raw doubles or
    timestamps, whose text formatting differs by engine). Each column
    is length-prefix encoded before the join — NULL → ``N``, value v →
    ``V<len>:<v>`` — so column boundaries are unambiguous: under the
    old bare ``concat_ws('|', coalesce(…,'<NULL>'))``, rows
    ``('a|b','c')`` and ``('a','b|c')`` serialized identically and a
    real replica divergence hashed clean (r9 review); the length
    prefix also distinguishes NULL from a literal ``'<NULL>'`` or
    ``'N'`` string. The digest is the order-independent sum of 48-bit
    row hashes reduced mod 2^61-1 and emitted as BIGINT: the
    DECIMAL(38,0) accumulator stays internal (exact to ~10^24 rows per
    bucket) and the readout is a plain int64 — DECIMAL final columns
    render engine-differently in downstream hash pipelines even when
    values match (r5 lesson), and an unreduced BIGINT sum would
    overflow past ~10^9 rows anyway. Merge partial fingerprints with
    :func:`merge_fingerprints` (sum counts, sum-then-remod digests per
    bucket)."""
    from ..functions.hashing import md5_int

    def _enc(c):
        v = (F.col(c) if isinstance(c, str) else c).cast("string")
        return F.when(v.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(v).cast("string"), F.lit(":"), v)
        )

    row_str = F.concat_ws("|", *[_enc(c) for c in digest_cols])
    return (
        df.select(
            (md5_int(F.col(key).cast("string")) % n_buckets).alias("bucket"),
            md5_int(row_str).alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.pmod(
                F.sum(F.col("h").cast("decimal(38,0)")),
                F.lit(FINGERPRINT_MOD).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("digest"),
        )
    )


# Mersenne prime 2^61-1: modular digests stay BIGINT-safe, and a
# pairwise merge sum (< 2^62) still fits int64 before the re-mod.
FINGERPRINT_MOD = (1 << 61) - 1


def merge_fingerprints(parts: DataFrame) -> DataFrame:
    """Fold a union of :func:`table_fingerprint` partials into one grid:
    counts add, digests add mod 2^61-1 (sum in DECIMAL so arbitrarily
    many partials per bucket can't overflow before the re-mod). This is
    the incremental-load path — update checksums without rescanning
    history, then diff 256 rows."""
    return parts.groupBy("bucket").agg(
        F.sum("n_rows").alias("n_rows"),
        F.pmod(
            F.sum(F.col("digest").cast("decimal(38,0)")),
            F.lit(FINGERPRINT_MOD).cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("digest"),
    )
