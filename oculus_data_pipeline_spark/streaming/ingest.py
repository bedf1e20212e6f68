"""Streaming sources + the streaming form of the reference pipeline.

The reference's directory mode (run_pipeline.py:97-102 — "process all
*.xml in the dir") maps exactly to a file-source stream; with
``trigger(availableNow=True)`` it drains the current directory and
stops — the reference's batch behavior — while the same query left
running is continuous ingest. The per-batch work reuses the batch DAG
via foreachBatch, so the LLM-classification operator (and its
distinct→anti-join→infer shape) is shared verbatim between modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.classify import Classifier
from ..plans.pipeline import (
    DOCUMENT_XML_SCHEMA,
    build_document_graph,
    classify_document_terms,
    extract_terms,
    known_entities_from_docs,
)

def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of the events table.

    The driver's parquet has shipped ``ts`` as either TIMESTAMP(NANOS)
    (readable only as int64 via the nanosAsLong legacy flag) or plain
    TIMESTAMP_NTZ micros, depending on generation. A streaming file
    source needs an explicit schema, so probe the footer with a batch
    read (metadata-only) and normalize either encoding to session-time
    TIMESTAMP — same contract as sources/tables.load_table.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(path)
    ts_type = dict(probe.dtypes).get("ts")
    reader = spark.readStream.schema(probe.schema).option("maxFilesPerTrigger", 1)
    if path.endswith(".parquet"):
        # file source wants a directory; select the one file via glob
        import os

        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    if ts_type == "bigint":  # nanos-as-long → integer-divide to micros
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_xml_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming XML document source over a landing directory —
    the reference's ingest loop as a stream."""
    raw = (
        spark.readStream.format("xml")
        .option("rowTag", "document")
        .schema(DOCUMENT_XML_SCHEMA)
        .load(landing_dir)
    )
    # same canonicalization as the batch reader
    return raw.select(
        F.col("documentID").alias("doc_id"),
        F.col("documentTitle").alias("title"),
        F.struct(
            F.col("projectInfo.publicationName").alias("publication_name"),
            F.col("projectInfo.seriesName").alias("series_name"),
            F.col("projectInfo.volumeInfo").alias("volume_info"),
            F.col("projectInfo.publisher").alias("publisher"),
            F.coalesce(F.col("projectInfo.formats.type"), F.array()).alias("formats"),
        ).alias("project_info"),
        F.coalesce(F.col("authors.author"), F.array()).alias("authors"),
        F.coalesce(F.col("recipients.recipient"), F.array()).alias("recipients"),
        F.col("dates.`date-from`").alias("date_from"),
        F.col("dates.`date-to`").alias("date_to"),
        F.col("location.placeName").alias("location_name"),
        F.coalesce(F.col("repositories.repository"), F.array()).alias("repositories"),
        F.coalesce(F.col("indexing.indexTerm"), F.array()).alias("indexing"),
    )


def stream_pipeline_to_graph(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    classifier: Classifier,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous (or drain-once) XML→graph ingest.

    foreachBatch reuses the exact batch pipeline per micro-batch and
    appends to the graph parquet tables; MERGE-style idempotency —
    including for a micro-batch retried after a partial write — comes
    from downstream dedup at read/compaction time, on (label, key)
    for nodes and (src, dst, rel_type) for edges, the same keys
    write_graph_parquet dedups on (Delta MERGE INTO when a
    transactional table format is available).
    """
    docs_stream = read_xml_stream(spark, landing_dir)

    def process_batch(docs: DataFrame, epoch_id: int) -> None:
        if not docs.head(1):
            return
        docs = docs.cache()
        terms = extract_terms(docs)
        known = known_entities_from_docs(docs)
        classified = classify_document_terms(terms, known, classifier)
        nodes, edges = build_document_graph(docs, classified)
        nodes.write.mode("append").parquet(f"{out_dir}/nodes")
        edges.write.mode("append").parquet(f"{out_dir}/edges")
        docs.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of the documents table (schema probed from
    the parquet footer, same normalization contract as load_table).
    Stateless curation operators (PII scrub, quality scoring, lang-id,
    chunking) are narrow maps, so the SAME batch Column expressions
    run unchanged on this stream — pinned by the batch/stream parity
    tests."""
    probe = spark.read.parquet(path)
    reader = spark.readStream.schema(probe.schema).option("maxFilesPerTrigger", 1)
    if path.endswith(".parquet"):
        import os

        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)
