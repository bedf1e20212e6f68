"""Multi-resolution time rollup (hypertable-style continuous
aggregate lattice).

The raw event stream is aggregated ONCE at the finest resolution;
every coarser resolution is re-aggregated FROM the next-finer level,
never from the raw data. At 100 TB that is the difference between one
full-corpus shuffle plus a chain of tiny aggregate-to-aggregate
shuffles, and re-scanning the corpus once per resolution — the same
reason TimescaleDB continuous aggregates and Druid rollup segments
exist.

Only decomposable aggregates ride the lattice: COUNT and SUM compose
by summation, MIN/MAX by min/max. SUM is carried as an exact decimal
through every level so the cascade is bit-identical to a direct
aggregation regardless of grouping order (the repo-wide decimal-sum
rule; see queries.py ``dsum``).

Reference parity: the reference has no time aggregation at all
(SURVEY §2.7 — its only aggregate is a request count,
json_classification.py:115-152); this is a north-star §2.13/streaming
addition over the driver's ``events`` table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# resolution name -> date_trunc unit, ordered finest → coarsest
_UNITS = ("minute", "hour", "day", "week", "month")


def multires_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    value_col: str = "value",
    resolutions: Sequence[str] = ("minute", "hour", "day"),
    decimal_scale: int = 6,
) -> DataFrame:
    """Cascaded rollup of ``events`` at every requested resolution.

    Returns one long table
    ``(resolution, bucket_ts, *dims, n_events, total_value,
    min_value, max_value)`` where ``bucket_ts`` is the truncated
    timestamp formatted ``yyyy-MM-dd HH:mm:ss`` (string: stable
    cross-engine, safe to union across resolutions).

    ``resolutions`` must be ordered finest → coarsest; each level is
    re-aggregated from the COARSEST ALREADY-COMPUTED level that nests
    into it — that nesting is what makes aggregate-of-aggregate exact.
    Weeks do NOT nest into months (a week can span two months;
    truncating a week bucket to month would mis-assign its cross-month
    rows — r11 review), so ``month`` cascades from ``day`` or finer
    and ``("week", "month")`` with no finer level raises rather than
    silently mis-bucketing.
    """
    order = [r for r in _UNITS if r in resolutions]
    if not resolutions or list(resolutions) != order:
        raise ValueError(f"resolutions must be ordered finest→coarsest from {_UNITS}")

    dims = list(dims)
    # finest level: the ONLY aggregation that touches raw rows. Each
    # level is persisted because it feeds TWO consumers — its own
    # output slice of the union and the next-coarser aggregation —
    # and Spark does not share subplans across union branches: without
    # the persist every branch would independently re-scan and
    # re-aggregate the raw data (verified in the plan test), which is
    # exactly what this operator exists to avoid.
    finest = resolutions[0]
    level = (
        events.groupBy(F.date_trunc(finest, ts_col).alias("bucket"), *dims)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast(f"decimal(22,{decimal_scale})")).alias("_tv"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .persist()
    )

    def emit(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            *dims,
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
            "min_value",
            "max_value",
        )

    levels: dict[str, DataFrame] = {finest: level}
    out = emit(level, finest)
    for res in resolutions[1:]:
        # aggregate-of-aggregate: shuffles only the source level's
        # rows (already ~|buckets×dims|, orders of magnitude smaller
        # than the raw data). Source = coarsest computed level that
        # NESTS into res — for "month" that excludes "week".
        candidates = [
            u for u in _UNITS[: _UNITS.index(res)]
            if u in levels and not (res == "month" and u == "week")
        ]
        if not candidates:
            raise ValueError(
                f"resolution {res!r} has no computed finer level that "
                f"nests into it (weeks do not nest into months) — "
                f"include 'day' or finer in resolutions"
            )
        src = levels[candidates[-1]]
        level = (
            src.groupBy(F.date_trunc(res, "bucket").alias("bucket"), *dims)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_tv").alias("_tv"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .persist()
        )
        levels[res] = level
        out = out.unionByName(emit(level, res))
    return out
