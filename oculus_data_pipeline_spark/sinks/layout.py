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

Both are plain ``DataFrameWriter`` surface — kept thin on purpose; the
value is the documented, plan-verified pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (for plan assertions)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
