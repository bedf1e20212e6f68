"""Distributed per-group prefix sum (exclusive running total).

A ``W.partitionBy(group).orderBy(order)`` running sum puts EVERY row of
a group into one task — fine when groups are small, a wall when one
group is a large corpus fraction (the pack-manifest case: one source =
trillions of tokens at 100 TB). This is the classic two-pass
distributed scan instead:

1. range-repartition on ``(group, *order)`` and sort within
   partitions — each partition then holds a contiguous slice of the
   global (group, order) ordering;
2. per-(partition, group) partial sums: a map-side-combined aggregate.
   Because the data is sorted, each partition BOUNDARY cuts at most
   one group, so only ≤ #partitions (partition, group) pairs need a
   nonzero carry — the collect is bounded by the partition count, the
   same bounded-driver-pull contract as the IVF centroid loops
   (operators/ivf.py);
3. one Arrow ``mapInPandas`` pass re-reads the SAME shuffle output
   (stage reuse — partition ids are stable across the two jobs, no
   persist of the fact table needed) and adds the broadcast carry to
   the within-partition exclusive cumsum.

The result is row-identical to the single-task window for any
partition count: a prefix sum over a fixed total order does not depend
on where the slices fall. Values must be integral (the carry and the
cumsum are exact int64 arithmetic; Python ints in the carry map never
overflow).

Reference semantics: none (the reference's single-process scripts get
running offsets for free from serial iteration, e.g. json_to_db.py's
per-document txn loop); this exists so the same loader-facing offsets
survive the jump to a cluster.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def grouped_prefix_sum(
    df: DataFrame,
    group: str,
    order: list[str],
    value: str,
    out: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out`` = exclusive running sum of ``value`` per ``group``
    in ``(group, *order)`` order, scalable past one task per group."""
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    d = (
        df.repartitionByRange(n_part, group, *order)
        .sortWithinPartitions(group, *order)
        .withColumn("_pid", F.spark_partition_id())
    )

    # Pass 1: per-(partition, group) totals — tiny after map-side
    # combine; ordering by _pid in the driver builds each spanning
    # group's carry chain.
    partials = (
        d.groupBy("_pid", group)
        .agg(F.sum(F.col(value).cast("long")).alias("_s"))
        .collect()
    )
    by_group: dict = {}
    for r in partials:
        by_group.setdefault(r[group], []).append((r["_pid"], r["_s"]))
    carry: dict = {}
    for g, parts in by_group.items():
        parts.sort()
        run = 0
        for pid, s in parts:
            if run:
                carry[(pid, g)] = run
            run += s

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(out, LongType(), False)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Pass 2: within-partition exclusive cumsum + broadcast carry,
        # fully vectorized per Arrow batch (pandas groupby-cumsum +
        # a per-group base map — per-GROUP python work, per-ROW numpy).
        # State persists across batches — they arrive in the
        # partition's sorted order.
        run: dict = {}
        pid = None
        for b in batches:
            if len(b) == 0:
                continue
            if pid is None:
                pid = int(b["_pid"].iloc[0])
            v64 = b[value].astype("int64")
            base = {
                g: run.get(g, carry.get((pid, g), 0))
                for g in pd.unique(b[group])
            }
            excl = (
                v64.groupby(b[group], sort=False).cumsum().to_numpy()
                - v64.to_numpy()
            )
            ob = b[in_cols].copy()
            ob[out] = excl + b[group].map(base).to_numpy(dtype="int64")
            for g, tot in v64.groupby(b[group], sort=False).sum().items():
                run[g] = base[g] + int(tot)
            yield ob

    return d.mapInPandas(scan, schema=out_schema)
