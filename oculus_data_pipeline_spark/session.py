"""SparkSession factory tuned for this engine.

Local test profile: single JVM, ``local[N]``. The same builder settings
(AQE, shuffle partitions sized to the cluster, Arrow enabled, UTC) are
what we would ship on a 1000-executor cluster — only master/memory and
``spark.sql.shuffle.partitions`` change with deployment size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "oculus_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join
      splitting, dynamic broadcast selection — the knobs that make one
      logical plan survive a 100× scale-up.
    - shuffle.partitions sized to cores locally; on a real cluster this
      would be ~2-3× total executor cores (AQE coalesces down).
    - UTC session timezone so timestamp semantics match the DuckDB
      oracle and any other engine.
    - Arrow on for the pandas_udf / mapInPandas slow paths.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
