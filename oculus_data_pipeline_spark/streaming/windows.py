"""Event-time window transforms — written once, run in BOTH batch and
Structured Streaming (the same DataFrame expressions are valid in
either mode; the batch queries q14–q16 and the streaming tests share
these functions).

Streaming is ABSENT in the reference (SURVEY.md §2.12) — its closest
analogue is "process every XML file in a directory"
(run_pipeline.py:97-102). These are the north-star additions: event
time + watermarks + tumbling/sliding/session windows + in-stream
dedup, designed so state stays bounded at 100 TB/day rates (watermark
bounds state retention; keys are (window, group) — well distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec_sum(col: str, scale: int = 6):
    return F.sum(F.col(col).cast(f"decimal(22,{scale})")).cast("double")


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window count + exact sum. With ``watermark`` set (and a
    streaming input) late data beyond the bound is dropped and window
    state is finalized — append-mode safe."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    keys = [F.window(ts_col, window).alias("w"), *(group_cols or [])]
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_events"), _dec_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *(group_cols or []),
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), _dec_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (dynamic length, closed after ``gap`` of
    inactivity per key). In streaming, requires a watermark so sessions
    can finalize."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"), _dec_sum("value").alias("total_value"))
        .select(
            key_col,
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """In-stream exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key only until the
    watermark passes it — the streaming form of exact_dedup."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
