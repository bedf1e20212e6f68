"""Storage layout for scale: bucketed tables and partitioned writes.

The reference has no storage layout at all (one JSON file per document,
json_to_db.py loads row-at-a-time), so this module is pure scale
engineering per SURVEY.md §4's Spark mapping:

- **Bucketing** pre-shuffles a table ONCE at write time. Every later
  join or aggregation on the bucket key reads co-located buckets and
  skips its Exchange entirely — at 100 TB this converts the dominant
  recurring cost (a full shuffle of the fact table per query) into a
  one-time write cost. tests/test_layout.py pins the plan: a join of
  two same-bucketed tables contains NO Exchange.
- **Partitioned writes** (hive-style ``col=value`` directories) give
  partition pruning: a filter on the partition column becomes a
  directory listing, not a scan. tests/test_layout.py pins that the
  scan's partition count drops accordingly.

- **Z-order clustering** interleaves the bits of several columns into
  one sort key, so files are tight bounding boxes in EVERY clustered
  dimension instead of only the leading sort column. Parquet min/max
  row-group stats then skip data for predicates on ANY of the
  dimensions — the multi-dimensional analogue of sorting, and what
  Delta ``OPTIMIZE ZORDER BY`` does. tests/test_layout.py measures
  per-file bounding boxes: z-ordered files cover a small slice of the
  secondary dimension where a linear sort covers its full range.

All are plain ``DataFrameWriter`` surface — kept thin on purpose; the
value is the documented, plan-verified pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table.

    Joins/aggregations between tables bucketed on the same keys with
    the same bucket count run shuffle-free; sorting within buckets
    additionally removes the Sort below a SortMergeJoin. Bucket count
    should be sized so one bucket of the LARGEST co-bucketed table
    fits an executor's memory at target scale.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet hive-partitioned by ``partition_cols`` (low-
    cardinality columns only — each distinct value is a directory).
    Filters on these columns prune at planning time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def zorder_key(cols: list[tuple[Column, float, float]], bits: int = 8) -> Column:
    """Morton (z-curve) key from ``(column, lo, hi)`` triples.

    Each column is range-bucketed to ``2**bits`` levels with
    ``width_bucket`` (lo/hi come from a cheap min/max agg or domain
    knowledge — sample-derived bounds are fine, outliers just saturate
    the NEAREST edge bucket: below-lo clamps to 0, above-hi to the top
    bucket. Pre-r11 a below-lo value became bucket −1, whose two's-
    complement bits are ALL ONES — it z-sorted to the far top corner
    of every dimension instead of the low edge), then the bucket bits
    are interleaved column-major so nearby z-values are nearby in
    every dimension. Pure JVM expressions: bits*len(cols)
    shift-and-mask terms.
    """
    levels = 1 << bits
    bucketed = [
        F.greatest(
            F.lit(0).cast("long"),
            (
                F.width_bucket(
                    c.cast("double"), F.lit(lo), F.lit(hi), F.lit(levels - 1)
                )
                - 1
            ).cast("long"),
        )
        for c, lo, hi in cols
    ]
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for i, b in enumerate(bucketed):
            pos = bit * len(bucketed) + i
            key = key + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), pos
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the z-curve of ``cols``.

    One min/max agg for the bucket bounds, one range repartition +
    within-partition sort on the z-key (the same one-time cost as a
    linear sort), then plain parquet — every file becomes a bounding
    box in all ``cols``, so min/max stats skip row groups for
    predicates on any clustered column, not just the first.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    key = zorder_key(
        [(F.col(c), bounds[f"lo_{c}"], bounds[f"hi_{c}"]) for c in cols], bits
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (for plan assertions)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
