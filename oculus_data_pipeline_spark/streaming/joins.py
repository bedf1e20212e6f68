"""Stream-stream joins with watermark-bounded state.

The canonical clickstream attribution shape: purchases joined to the
same user's views within a bounded event-time window. Both sides are
watermarked and the join condition carries the time bound, so each
side's state store retains only the watermark horizon — bounded state
at any stream rate (the property that matters at 100 TB/day; an
unbounded stream-stream join would grow state forever).

No reference instance (the reference is batch-only, SURVEY.md §2.12);
north-star streaming addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_views(
    events: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join: each purchase with every view by the same user in
    the preceding ``max_gap``. Works identically on batch and
    streaming inputs (tested equal)."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    if purchases.isStreaming:
        purchases = purchases.withWatermark("p_ts", watermark)
        views = views.withWatermark("v_ts", watermark)
    gap = F.expr(f"INTERVAL {max_gap}")
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - gap),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        "purchase_value",
    )
