"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.12); this is the
north-star "custom stateful operator" slot: a per-key running profile
(event count, value sum, last-seen timestamp) maintained across
micro-batches with explicit state, emitting one updated row per key
per batch. State is per-key and O(1) — bounded regardless of stream
length, the property that matters at 100 TB/day.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", StringType()),
    ]
)


def _update_user_profile(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n,
                "total_value": total,
                "last_seen": str(pd.Timestamp(last_us, unit="us")),
            }
        ]
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) stream → continuously-updated per-user
    profile rows (one per key per micro-batch)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEBOUNCE_STATE_SCHEMA = StructType([StructField("prev_sec", LongType())])

DEBOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _debounce(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    prev_sec = state.get[0] if state.exists else None
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    # epoch-second floors, matching the batch query's ts.cast(long)
    secs = (batch["ts"].astype("int64") // 1_000_000_000).tolist()
    keep = []
    for i, sec in enumerate(secs):
        if prev_sec is None or sec - prev_sec > gap_s:
            keep.append(i)
        prev_sec = sec
    state.update((prev_sec,))
    if keep:
        out = batch.iloc[keep]
        yield pd.DataFrame(
            {
                "event_id": out["event_id"].astype("int64"),
                "user_id": out["user_id"].astype("int64"),
                "event_type": out["event_type"],
                "value": out["value"].astype("float64"),
            }
        )


def debounce_stream(events: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Streaming event debounce — the stateful twin of the batch q173:
    drop an event when the previous RAW event of the same
    (user, event_type) is at most ``gap_s`` seconds older. State per
    key is ONE long (the last raw epoch-second) — bounded regardless
    of stream length; rows within a micro-batch apply the same
    sequential lag semantics in (ts, event_id) order, so a stream
    replayed through any batch slicing emits exactly the batch
    query's survivors as long as files arrive time-ordered."""
    import functools

    fn = functools.partial(_debounce, gap_s=gap_s)
    return (
        events.select("event_id", "user_id", "event_type", "ts", "value")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
