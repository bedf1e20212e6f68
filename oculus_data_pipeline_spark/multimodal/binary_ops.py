"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The actual codec work is STUBBED (the
image/audio libraries are not in this container): ``decode_images``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the content hash) stands in so
the distributed plumbing can be exercised end-to-end.

Scale design: binary payloads stay in executor memory only for the
duration of one Arrow batch (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch); feature outputs are
small fixed-width columns, so the shuffle after extraction carries
features, never bytes. Repartition by content hash before decode to
spread large objects evenly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_sha string, "
    f"features array<float>"
)

DECODED_SCHEMA = (
    "media_id long, width int, height int, pixel_format string, "
    "decoded_ok boolean"
)


def make_media_table(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic fake media table from the documents table
    (binary payload = utf-8 text bytes) — test scaffolding for the
    plumbing; real deployments read binary columns from parquet."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode("text", "utf-8").alias("content"),
    )


def extract_image_features(media: DataFrame, repartition: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Deterministic: features are derived from the sha256 of the bytes
    (16 pseudo-random floats in [0,1)) — a stand-in with the same
    dataflow shape as a real embedding model (bytes in → fixed-width
    vector out). Fully distributed; nothing touches the driver.
    """
    if repartition:
        media = media.repartition(repartition, "media_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                digest = hashlib.sha256(content).hexdigest()
                feats = [
                    int(digest[(4 * i) % 60 : (4 * i) % 60 + 4], 16) / 65536.0
                    for i in range(FEATURE_DIM)
                ]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(content),
                        "content_sha": digest[:16],
                        "features": feats,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def decode_images(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary image content to (width, height, pixel_format).

    STUB: real decoding needs an image codec library (PIL/opencv),
    which this container does not ship. ``fake=True`` substitutes a
    deterministic fake decode (dimensions derived from the content
    hash) so the mapInPandas plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec library (e.g. PIL); "
            "not available in this environment — pass fake=True for the "
            "deterministic stand-in"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                h = int(hashlib.sha256(content).hexdigest()[:8], 16)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": 64 + h % 1920,
                        "height": 64 + (h // 1920) % 1080,
                        "pixel_format": "rgb24",
                        "decoded_ok": len(content) > 0,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample_video(
    media: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Sample frames from video content at a fixed period → one row per
    sampled frame (media_id, frame_idx, ts_ms, frame_sha).

    STUB decode as above; the row-expansion dataflow (one in → many
    out via mapInPandas) is the real part.
    """
    if not fake:
        raise NotImplementedError(
            "video frame sampling requires a codec library; "
            "pass fake=True for the deterministic stand-in"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                # fake duration: 1 ms per byte
                duration = len(content)
                for i, ts in enumerate(range(0, duration, every_ms)):
                    frame_sha = hashlib.sha256(
                        content + ts.to_bytes(8, "little")
                    ).hexdigest()[:16]
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "ts_ms": ts,
                            "frame_sha": frame_sha,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "ts_ms", "frame_sha"]
            )

    return media.mapInPandas(
        batches, schema="media_id long, frame_idx int, ts_ms long, frame_sha string"
    )
