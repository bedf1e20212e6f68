"""One-shot cross-engine compare of the auto-sized LSH family at a
plane count the fixture SFs never reach.

The fixture corpora auto-size to P = 4 (N = 500) and P = 6 (N = 2000);
this replicates sf0.1 embeddings ×8 with rotated vectors (the scaling
probe's replication, so no manufactured identity pairs) to N = 16 000
⇒ P = 9, then runs the REGISTERED q51 (multi-table, the stride case)
and q38 (single-table) Spark plans against their REGISTERED DuckDB
oracles on the same parquet — the same exact-value compare the test
suite uses. Complements tests/test_gated_bucket_parity.py (bucket-id
equality at forced high P) with full candidate-join/verify parity at
an auto-derived high P.

Run ad hoc at round close; results are recorded in LOCAL_HARNESS.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
from pyspark.sql import functions as F

from oculus_data_pipeline_spark.operators.similarity import auto_planes
from oculus_data_pipeline_spark.queries import ORACLE, QUERIES
from oculus_data_pipeline_spark.session import get_spark
from oculus_data_pipeline_spark.sources.tables import load_table
from tests.oracle_harness import compare

SRC = "/root/testdata/sf0.1"
K = 8
CHECKS = ["q51_cosine_near_dup_pairs", "q38_lsh_ann_topk", "q39_lsh_bucket_stats"]


def build_embeddings(spark, out_dir: str) -> None:
    src = load_table(spark, SRC, "embeddings")
    parts = []
    for i in range(K):
        df = src.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        if i > 0:
            dim = F.size("embedding")
            df = df.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), F.lit(i + 1), dim - i),
                    F.slice(F.col("embedding"), 1, i),
                ),
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    spark = get_spark("highp-check")
    tmp = tempfile.mkdtemp(prefix="highp_")
    try:
        build_embeddings(spark, tmp)
        n = spark.read.parquet(os.path.join(tmp, "embeddings.parquet")).count()
        p = auto_planes(n, 32, 16)
        print(f"N={n} -> auto-sized P={p}")
        conn = duckdb.connect()
        conn.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp}/embeddings.parquet/*.parquet'"
        )
        rc = 0
        for name in CHECKS:
            df = QUERIES[name](spark, tmp)
            errs = compare(df, conn, ORACLE[name], name)
            if errs:
                rc = 1
                print(f"{name}: FAIL {errs[:3]}")
            else:
                print(f"{name}: pass rows={df.count()}")
        sys.exit(rc)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
