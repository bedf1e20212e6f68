"""Deterministic dataset splitting for training pipelines.

Train/val/test assignment must be a pure function of a stable row key
— never RNG — so the same document lands in the same split on every
run, engine, cluster size, and incremental refresh (otherwise eval
data leaks into training between runs). The assignment here buckets a
cross-engine-deterministic content hash (md5-prefix, see
functions/hashing.py) into integer weight ranges, exactly as DuckDB's
oracle recomputes it.

No shuffle at all: the split label is a pure Column expression on the
scan, so downstream per-split filters push straight into parquet and
a 100 TB table is split in a single pass. North-star addition — the
reference has no dataset-splitting surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, md5_int_sql
from ..functions.text import normalize_term


def split_col(
    key: Column | str,
    weights: dict[str, int] | None = None,
) -> Column:
    """Split-name Column from integer ``weights`` (e.g. train 8 / val 1
    / test 1 buckets out of their sum). Deterministic in the key text.
    """
    weights = weights or {"train": 8, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = md5_int(key) % total
    items = list(weights.items())
    expr, lo = None, 0
    for name, w in items[:-1]:
        cond = bucket < F.lit(lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    if expr is None:
        return F.lit(items[-1][0])
    return expr.otherwise(F.lit(items[-1][0]))


def split_col_sql(key_expr: str, weights: dict[str, int] | None = None) -> str:
    """The DuckDB-equivalent CASE expression for :func:`split_col`."""
    weights = weights or {"train": 8, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = f"({md5_int_sql(key_expr)}) % {total}"
    arms, lo = [], 0
    items = list(weights.items())
    for name, w in items[:-1]:
        arms.append(f"WHEN {bucket} < {lo + w} THEN '{name}'")
        lo += w
    return f"CASE {' '.join(arms)} ELSE '{items[-1][0]}' END"


def hash_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Attach the deterministic split label as ``out_col``."""
    return df.withColumn(out_col, split_col(key, weights))


def stratified_split(
    df: DataFrame,
    stratum_col: str,
    key: Column | str,
    train_pct: int = 80,
    val_pct: int = 10,
    out_col: str = "split",
) -> DataFrame:
    """Exact-quota stratified split: within each stratum, rows are
    ordered by their md5 key hash (deterministic, content-addressed —
    no RNG) and the first ⌊n·train%⌋ become train, the next ⌊n·val%⌋
    val, the rest test. Unlike :func:`hash_split` (expected fractions,
    zero shuffle), this guarantees the per-stratum proportions exactly
    — the standard requirement when strata are small (per-language or
    per-source eval sets).

    The rank — position in per-stratum (hash, key) order — is a
    prefix COUNT, so it runs on the two-pass distributed scan
    (prefixsum.py, round 6) instead of a stratum-keyed window: a
    giant stratum no longer pins its whole membership to one sort
    task (pre-round-6 this was documented as "the wrong tool for a
    million-row stratum"), the assignment stays a pure function of
    (stratum, key) at any parallelism, and the stratum sizes ride a
    null-safe groupBy join-back (AQE broadcasts when small). A NULL
    stratum is a real stratum — it gets its own exact quota rather
    than being dropped, matching the pre-round-6 window semantics
    (``W.partitionBy`` groups NULLs together)."""
    from .prefixsum import grouped_prefix_sum

    # same refuse-loudly contract as grouped_prefix_sum: a caller
    # column named like a working column would be silently replaced
    clash = sorted(
        set(df.columns) & {"_h", "_k", "_one", "_rn0", "_n", "_sz_stratum", out_col}
    )
    if clash:
        raise ValueError(
            f"stratified_split: input column(s) {clash} collide with "
            f"internal working columns or the output column {out_col!r} "
            "— rename them before calling"
        )
    k = F.col(key) if isinstance(key, str) else key
    ranked = grouped_prefix_sum(
        df.withColumn("_h", md5_int(k.cast("string")))
        .withColumn("_k", k)
        .withColumn("_one", F.lit(1).cast("long")),
        stratum_col,
        ["_h", "_k"],
        "_one",
        out="_rn0",
    )
    sizes = (
        df.groupBy(stratum_col)
        .agg(F.count("*").alias("_n"))
        .withColumnRenamed(stratum_col, "_sz_stratum")
    )
    n = F.col("_n")
    rn = F.col("_rn0") + 1
    n_train = F.floor(n * train_pct / 100)
    n_val = F.floor(n * val_pct / 100)
    return (
        ranked.join(
            sizes, F.col(stratum_col).eqNullSafe(F.col("_sz_stratum"))
        )
        .drop("_sz_stratum")
        .withColumn(
            out_col,
            F.when(rn <= n_train, "train")
            .when(rn <= n_train + n_val, "val")
            .otherwise("test"),
        )
        .drop("_h", "_k", "_one", "_rn0", "_n")
    )


def group_aware_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Contamination-safe split: every exact-duplicate group lands in
    ONE split. Splitting by row key (:func:`hash_split`) leaks a
    duplicated document across the train/test boundary — the eval set
    then contains verbatim training text and benchmark numbers inflate.
    Here the split key is the group's canonical id (min id per
    normalized-content hash), so duplicates inherit one assignment.

    Shape at 100 TB: ONE corpus scan — the (hash → canonical) map is
    derived from the same hashed projection with a bounded groupBy
    (the pre-r9 form called dedup.exact_dedup, scanning, normalizing
    and md5-ing the full corpus a second time for a map already
    computable from the first pass; r9 review) — and one hash-keyed
    join back on the compact content-hash key; AQE picks the join
    strategy, and near-unique corpora degrade gracefully to a plain
    equi-join. NULL text hashes to the non-hex sentinel ``#null``
    (md5 output is pure hex, so no real group can collide): NULL-text
    docs form one dedup group with one split assignment instead of
    being silently dropped by the NULL-keyed equi-join (r9 review).
    Returns (doc_id, canonical_id, split).
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.md5(normalize_term(text_col)), F.lit("#null")
        ).alias("content_hash"),
    )
    groups = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_id")
    )
    return hashed.join(groups, "content_hash").select(
        "doc_id",
        "canonical_id",
        split_col(F.col("canonical_id").cast("string"), weights).alias("split"),
    )
