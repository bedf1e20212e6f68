"""Distributed per-group prefix sum (exclusive running total).

A ``W.partitionBy(group).orderBy(order)`` running sum puts EVERY row of
a group into one task — fine when groups are small, a wall when one
group is a large corpus fraction (the pack-manifest case: one source =
trillions of tokens at 100 TB). This is the classic two-pass
distributed scan instead, kept entirely JVM-side:

1. range-repartition on ``(group, *order)`` — each partition then
   holds a contiguous slice of the global (group, order) ordering,
   which is what makes per-partition carries meaningful;
2. per-(partition, group) partial sums: a map-side-combined aggregate.
   Because slices are contiguous, each partition BOUNDARY cuts at most
   one group, so at most #partitions−1 groups SPAN a boundary — and
   only spanning groups can need a carry. The aggregate is filtered to
   those groups (count-per-group > 1 over the tiny partials table)
   BEFORE the collect, so the driver pull is ≤ 2·#partitions rows
   regardless of group cardinality — the same bounded-driver-pull
   contract as the IVF centroid loops (operators/ivf.py). (Round 7:
   previously the filter was driver-side, so a high-cardinality group
   column — reachable via stratified_split's arbitrary stratum_col —
   made the collect O(#groups); the bound is now enforced in the
   plan.);
3. the within-slice running sum is a window over the HIGH-CARDINALITY
   ``(partition_id, group)`` composite (parallelism #partitions ×
   #groups, never one task per group) plus a broadcast left join of
   the tiny carry table — whole-stage codegen end to end, no Python
   pass.

The range-partitioned data is materialized ONCE via a lazy
``localCheckpoint`` before either pass reads it: Spark's range
partitioner samples its bounds with an RDD-id-derived seed, so two
independent executions of the same plan may split rows differently —
carries keyed by pass-1 partition ids would silently mis-offset
pass-2 rows. Small inputs mask this (the bound sample is exhaustive);
the sf0.1 oracle harness caught it. Storage cost is one copy of the
projected columns — callers select only what they need first.

The result is row-identical to the single-task window for any
partition count: a prefix sum over a fixed total order does not depend
on where the slices fall. ``(group, *order)`` must totally order each
group's rows (the same requirement the plain window has — value ties
would make any running sum order-dependent). Values must be integral;
the carry arithmetic is exact int64 (Python ints driver-side, BIGINT
in the plan). NULLs are first-class: a NULL group key is a real group
(the carry join is null-safe, matching the window semantics of
``W.partitionBy`` which also groups NULLs together), and an all-NULL
value slice contributes a 0 partial rather than poisoning the carry
chain.

Reference semantics: none (the reference's single-process scripts get
running offsets for free from serial iteration, e.g. json_to_db.py's
per-document txn loop); this exists so the same loader-facing offsets
survive the jump to a cluster.

An Arrow ``mapInPandas`` pass 3 (in-partition pandas cumsum instead of
the window exchange) measured a wash at sf0.1 (±0.2 s on each of the
four consumers, same-session A/B, round 6); this JVM form is kept
because its correctness is purely relational — no reliance on Arrow
batch iteration order — and it adds no Python-worker memory at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


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
    # internal working columns would silently OVERWRITE same-named
    # caller columns (withColumn replaces) and the final
    # select(*df.columns) would then emit partition ids / carries in
    # place of the user's data — refuse loudly instead (r9 review)
    clash = sorted(set(df.columns) & {"_pid", "_cpid", "_cgrp", "_carry", out})
    if clash:
        raise ValueError(
            f"grouped_prefix_sum: input column(s) {clash} collide with "
            f"internal working columns or the output column {out!r} — "
            "rename them before calling"
        )
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # CRITICAL: materialize the range partitioning ONCE. Spark's range
    # partitioner samples its bounds with a seed derived from the RDD
    # id, so two separate actions over the same plan can land rows in
    # DIFFERENT partitions — pass-1 carries keyed by pass-1 pids would
    # then be applied to pass-2 pids. Small inputs hide this (the
    # sample sees every row, so bounds coincide); at scale it is a
    # silent-wrong-offsets bug. The lazy localCheckpoint pins one
    # partitioning that both the carry collect and the window job
    # read; its storage cost is one pass of the PROJECTED columns —
    # callers should select the columns they need before calling.
    d = (
        df.repartitionByRange(n_part, group, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    # Pass 1: per-(partition, group) totals — tiny after map-side
    # combine. Only groups that SPAN a partition boundary can need a
    # carry, and range partitioning bounds those at #partitions−1, so
    # the collect is filtered to spanning groups IN THE PLAN (a window
    # count over the already-tiny partials table) — the driver pull is
    # ≤ 2·#partitions rows even when the group column is
    # high-cardinality (stratified_split routes arbitrary stratum
    # columns here). Sums are coalesced to 0 so an all-NULL value
    # slice can't poison the int carry chain; NULL group keys are kept
    # (they're a real group, ordered first by the range partitioner).
    # Ordering by _pid in the driver builds each spanning group's
    # carry chain (range partitioning makes pid order agree with the
    # (group, order) order inside each group).
    partials = (
        d.groupBy("_pid", group)
        .agg(
            F.coalesce(F.sum(F.col(value).cast("long")), F.lit(0).cast("long")).alias(
                "_s"
            )
        )
        .withColumn("_nspan", F.count(F.lit(1)).over(W.partitionBy(group)))
        .where(F.col("_nspan") > 1)
        .select("_pid", group, "_s")
        .collect()
    )
    by_group: dict = {}
    for r in partials:
        by_group.setdefault(r[group], []).append((r["_pid"], r["_s"]))
    carry_rows = []
    for g, parts in by_group.items():
        parts.sort()
        run = 0
        for pid, s in parts:
            if run:
                carry_rows.append((pid, g, run))
            run += s

    # Pass 2: window over the high-cardinality (_pid, group) composite
    # + broadcast carry join — all codegen, no Python. The join is
    # null-safe on the group column so a NULL group spanning a
    # boundary still receives its carry (a plain equi-join would
    # silently leave those rows un-offset).
    w = (
        W.partitionBy("_pid", group)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = d.withColumn(
        out, F.coalesce(F.sum(F.col(value).cast("long")).over(w), F.lit(0))
    )
    if carry_rows:
        gtype = dict(df.dtypes)[group]
        carries = spark.createDataFrame(
            carry_rows, f"_cpid int, _cgrp {gtype}, _carry long"
        )
        local = (
            local.join(
                F.broadcast(carries),
                (F.col("_pid") == F.col("_cpid"))
                & F.col(group).eqNullSafe(F.col("_cgrp")),
                "left",
            )
            .withColumn(out, F.col(out) + F.coalesce(F.col("_carry"), F.lit(0)))
            .drop("_cpid", "_cgrp", "_carry")
        )
    return local.select(*df.columns, out)
