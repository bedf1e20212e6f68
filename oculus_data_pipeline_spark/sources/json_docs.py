"""JSON document source/sink — the reference's inter-stage format.

The reference materializes nested JSON between every stage
(xml_to_json.py:130-131 writes; json_classification.py:310-311,
generate_uri.py:78-79, json_to_db.py:142-143 read). In-engine those
boundaries are gone (one lazy DAG), but the format remains useful as
an interchange/checkpoint surface, so it's supported first-class:

- ``write_documents_json``: one JSON object per line (Spark's native
  layout — splittable, parallel, no 100-TB single-file bottleneck,
  unlike the reference's indented single-document files).
- ``read_documents_json``: schema-pinned read (no inference — shape
  drift fails loudly instead of silently changing types,
  vs the reference's ad-hoc isinstance checks,
  json_classification.py:248-250).

Also the JSONL batch-task tables (S4: json_classification.py:11-37,
:195-212) — plain ``spark.read.json`` with the fixture schemas used
by MockReplayClassifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Canonical document schema (the plans/pipeline.py output shape).
DOCUMENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField(
            "project_info",
            T.StructType(
                [
                    T.StructField("publication_name", T.StringType()),
                    T.StructField("series_name", T.StringType()),
                    T.StructField("volume_info", T.StringType()),
                    T.StructField("publisher", T.StringType()),
                    T.StructField("formats", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("recipients", T.ArrayType(T.StringType())),
        T.StructField("date_from", T.StringType()),
        T.StructField("date_to", T.StringType()),
        T.StructField("location_name", T.StringType()),
        T.StructField("repositories", T.ArrayType(T.StringType())),
        T.StructField(
            "indexing",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("main", T.StringType()),
                        T.StructField("midsub", T.StringType()),
                        T.StructField("sub", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def write_documents_json(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    docs.write.mode(mode).json(path)


def read_documents_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(DOCUMENT_JSON_SCHEMA).json(path)


def read_documents_multiline_json(spark: SparkSession, path: str) -> DataFrame:
    """The reference's indented whole-file JSON layout (one document
    array per file) — supported for ingest compatibility; multiLine
    files are NOT splittable, so this path is for small legacy files
    only (the engine re-emits JSONL)."""
    # a top-level JSON array yields one row per element
    return (
        spark.read.schema(DOCUMENT_JSON_SCHEMA).option("multiLine", True).json(path)
    )
