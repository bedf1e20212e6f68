"""Slowly-changing-dimension (SCD type 2) application without a
transactional table format.

With Delta/Iceberg on the classpath this is a single ``MERGE INTO``;
here it is emulated exactly with the classic anti-join + union shape
(the guide's sanctioned fallback): matched current rows are closed
(valid_to = change date), incoming versions are appended open-ended,
untouched rows pass through. Pure set operations — idempotent given
the same inputs, shuffle only on the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    Only open rows (valid_to = OPEN_END) can be closed. Returns the
    new full history table.
    """
    attr_cols = [c for c in current.columns if c not in (key, "valid_from", "valid_to")]
    upd = updates.select(
        key, *[c for c in updates.columns if c not in (key, change_date_col)],
        F.col(change_date_col),
    )
    upd_keys = upd.select(key)

    open_rows = current.where(F.col("valid_to") == OPEN_END)
    closed_rows = current.where(F.col("valid_to") != OPEN_END)

    # close the open row of every updated key
    closed_now = (
        open_rows.join(
            upd.select(key, F.col(change_date_col).alias("__chg")), key
        )
        .select(key, *attr_cols, "valid_from", F.col("__chg").alias("valid_to"))
    )
    untouched_open = open_rows.join(upd_keys, key, "left_anti")
    new_versions = upd.select(
        key,
        *[c for c in attr_cols],
        F.col(change_date_col).alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
    )
    return (
        closed_rows.unionByName(closed_now)
        .unionByName(untouched_open)
        .unionByName(new_versions)
    )
