"""Parquet table sources for the driver testdata star schema.

At scale these reads are plain columnar scans — Catalyst pushes filters
and prunes columns into the parquet reader, and partition discovery /
split planning is Spark-native. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins.
SMALL_DIMS = {"region", "nation", "supplier", "part", "customer"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-time TIMESTAMP (session tz is
    pinned to UTC, so wall-clock values are unchanged).

    The driver's parquet carries timestamps without UTC adjustment, which
    Spark 4 reads as TIMESTAMP_NTZ; NTZ forbids direct numeric casts
    (``cast(ts as bigint)`` → DATATYPE_MISMATCH), breaking epoch math in
    as-of joins / sessionization. One metadata-only projection here keeps
    every query engine-legal with zero scan cost.
    """
    from pyspark.sql import functions as F

    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # timestamp rendering (date_format) is session-timezone-dependent;
    # the engine's semantics are defined in UTC, and the caller's
    # session (e.g. the external driver's) may not be. Runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has been parquet TIMESTAMP(NANOS) in some driver
        # generations, which Spark's reader rejects. Read nanos as long,
        # then integer-divide to micros (double division would lose
        # precision at ~1.7e18 ns).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(path))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
