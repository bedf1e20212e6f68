"""Micro-probe: higher-order-function vector kernels vs unrolled
fixed-dim expressions (guide §4.1 — prefer codegen'd built-ins; HOF
lambda evaluation is interpreted per element and allocates per row).

Times three forms of the pairwise cosine stage over the sf0.1
embeddings table joined to itself on an LSH bucket (the exact shape of
q202/q97/q193's verify stage):

  hof       — current kernel: zip_with + aggregate for dot and both norms
  unrolled  — dot as sum(a[i]*b[i]) over literal indices, norms unrolled
  prenorm   — unrolled dot + per-ROW norms computed before the join

Prints one JSON line with the three medians (s) so the before/after
claim in OPTIMIZATION_r11.md is reproducible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from oculus_data_pipeline_spark.functions.vectors import cosine_similarity
from oculus_data_pipeline_spark.operators.similarity import (
    _as_double,
    auto_planes,
    lsh_bucket_expr,
)
from oculus_data_pipeline_spark.session import get_spark
from oculus_data_pipeline_spark.sources.tables import load_table

DIM = 64


def unrolled_dot(a, b, dim=DIM):
    acc = a[0] * b[0]
    for i in range(1, dim):
        acc = acc + a[i] * b[i]
    return acc


def unrolled_sq(a, dim=DIM):
    acc = a[0] * a[0]
    for i in range(1, dim):
        acc = acc + a[i] * a[i]
    return acc


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("hof-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    e = _as_double(emb.select("vec_id", "embedding"), "embedding")
    n_planes = auto_planes(e.count(), 32, 16)
    b = e.withColumn("bucket", lsh_bucket_expr("embedding", DIM, n_planes))

    def pairs():
        return (
            b.alias("a")
            .join(
                b.alias("c"),
                (F.col("c.bucket") == F.col("a.bucket"))
                & (F.col("c.vec_id") != F.col("a.vec_id")),
            )
        )

    av, cv = F.col("a.embedding"), F.col("c.embedding")

    def hof():
        return pairs().select(
            F.col("a.vec_id"), F.round(cosine_similarity(av, cv), 6).alias("s")
        )

    def unrolled():
        denom = F.sqrt(unrolled_sq(av)) * F.sqrt(unrolled_sq(cv))
        cos = F.when(denom == 0, F.lit(0.0)).otherwise(unrolled_dot(av, cv) / denom)
        return pairs().select(F.col("a.vec_id"), F.round(cos, 6).alias("s"))

    def prenorm():
        bn = b.withColumn("nrm", F.sqrt(unrolled_sq(F.col("embedding"))))
        p = bn.alias("a").join(
            bn.alias("c"),
            (F.col("c.bucket") == F.col("a.bucket"))
            & (F.col("c.vec_id") != F.col("a.vec_id")),
        )
        denom = F.col("a.nrm") * F.col("c.nrm")
        cos = F.when(denom == 0, F.lit(0.0)).otherwise(unrolled_dot(av, cv) / denom)
        return p.select(F.col("a.vec_id"), F.round(cos, 6).alias("s"))

    # warm
    hof().write.format("noop").mode("overwrite").save()
    out = {}
    for name, fn in [("hof", hof), ("unrolled", unrolled), ("prenorm", prenorm)]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[name] = round(sorted(ts)[1], 3)
    # equivalence spot-check: identical result sets (bit-exact after round6)
    d1 = hof().exceptAll(unrolled()).count()
    d2 = hof().exceptAll(prenorm()).count()
    out["diff_unrolled"] = d1
    out["diff_prenorm"] = d2
    print(json.dumps(out))


if __name__ == "__main__":
    main()
