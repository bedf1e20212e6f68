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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, md5_int_sql


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
