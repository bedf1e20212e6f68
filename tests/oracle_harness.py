"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count, column names, and order-insensitive values EXACTLY.

Stricter than the driver (exact value equality, not hash equality) so
any cross-engine numeric drift is caught here first.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from oculus_data_pipeline_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return conn


def decimal_columns(spark_df) -> list[str]:
    """Spark-side mirror of the oracle LIMIT-0 type audit: names of any
    DecimalType final columns. DECIMAL outputs render engine-differently
    in the driver's hash pipeline even when values match (r5 q145/q148)
    — final columns must be BIGINT/DOUBLE/VARCHAR/BOOL/DATE/TIMESTAMP."""
    from pyspark.sql.types import DecimalType

    return [f.name for f in spark_df.schema.fields if isinstance(f.dataType, DecimalType)]


def _norm(v):
    """Normalize a value for cross-engine comparison. Integral Decimals
    stay exact ints (a float coercion here is precisely the driver-side
    bug class that let the q145/q148 DECIMAL(38,0) drift pass locally —
    ~6e16 digests exceed float53); fractional Decimals compare as float
    against Spark doubles."""
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return int(v)
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, conn, sql: str, name: str = "?") -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_cols = sorted(spark_df.columns)
    spark_rows = [
        tuple(_norm(row[c]) for c in spark_cols) for row in spark_df.collect()
    ]
    res = conn.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_all = res.fetchall()
    duck_cols = sorted(duck_cols_raw)
    idx = [duck_cols_raw.index(c) for c in duck_cols]
    duck_rows = [tuple(_norm(r[i]) for i in idx) for r in duck_all]

    if spark_cols != duck_cols:
        problems.append(f"{name}: columns differ: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(
            f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
        )
    s_sorted = sorted(spark_rows, key=repr)
    d_sorted = sorted(duck_rows, key=repr)
    if s_sorted != d_sorted:
        diff_s = [r for r in s_sorted if r not in set(d_sorted)][:3]
        diff_d = [r for r in d_sorted if r not in set(s_sorted)][:3]
        problems.append(
            f"{name}: values differ (cols={spark_cols}); "
            f"spark-only sample={diff_s}; duck-only sample={diff_d}"
        )
    return problems
