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


# ---------------------------------------------------------------------------
# Streaming interval-union coverage — the stateful twin of batch q198
# ---------------------------------------------------------------------------

COVERAGE_STATE_SCHEMA = StructType(
    [
        StructField("open_start", LongType()),
        StructField("open_end", LongType()),
        StructField("closed_islands", LongType()),
        StructField("closed_covered", LongType()),
        StructField("first_start", LongType()),
        StructField("n_seen", LongType()),
    ]
)

COVERAGE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_islands", LongType()),
        StructField("covered_s", LongType()),
        StructField("first_start_s", LongType()),
        StructField("last_end_s", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def _fold_coverage(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        o_s, o_e, n_cl, cov, first, seen = state.get
    else:
        o_s, o_e, n_cl, cov, first, seen = None, None, 0, 0, None, 0
    # concatenate the WHOLE micro-batch for this key before sorting —
    # sorting each Arrow chunk independently would fold later-chunk
    # intervals with earlier start times out of order (same pattern as
    # _debounce's pd.concat)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["s", "e"])
        seen += len(pdf)
        for s, e in zip(pdf["s"].astype("int64"), pdf["e"].astype("int64")):
            s, e = int(s), int(e)
            if first is None:
                first = s
            if o_s is None:
                o_s, o_e = s, e
            elif s > o_e:
                n_cl += 1
                cov += o_e - o_s
                o_s, o_e = s, e
            else:
                o_e = max(o_e, e)
    state.update((o_s, o_e, n_cl, cov, first, seen))
    total_cov = cov + ((o_e - o_s) if o_s is not None else 0)
    total_islands = n_cl + (1 if o_s is not None else 0)
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_islands": total_islands,
                "covered_s": total_cov,
                "first_start_s": first,
                "last_end_s": o_e,
                "n_seen": seen,
            }
        ]
    )


def interval_coverage_stream(events: DataFrame) -> DataFrame:
    """Streaming exact union-of-intervals coverage per user — the
    stateful twin of batch q198 (same leases: 60 + 30·k seconds from
    the event's JSON props). State per key is SIX longs — the open
    island plus closed-island totals — bounded regardless of stream
    length, which is what lets it run forever at 100 TB/day where the
    batch sweep line would re-sort history every run. Each micro-batch
    folds its (sorted) intervals into the open island exactly as the
    batch window pass does; like debounce_stream, exact batch parity
    holds for event-time-ordered replay (out-of-order arrival needs a
    watermark buffer in front — documented limitation, not silent).
    Emits the cumulative per-user coverage row each batch; `n_seen`
    is the monotone emission version, so the latest row per key is
    max(n_seen)."""
    import pyspark.sql.functions as F

    iv = events.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (
            F.col("ts").cast("long")
            + 60
            + F.get_json_object("props", "$.k").cast("long") * 30
        ).alias("e"),
    )
    return iv.groupBy("user_id").applyInPandasWithState(
        _fold_coverage,
        outputStructType=COVERAGE_OUTPUT_SCHEMA,
        stateStructType=COVERAGE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
