"""Per-stage CLI — the reference's resumable stage invocation surface.

Mirrors README.md:54-75 of the reference (each pipeline script runnable
individually, plus the run_pipeline.py master command):

    python -m oculus_data_pipeline_spark ingest   XML_PATH   OUT_DIR
    python -m oculus_data_pipeline_spark classify DOCS_DIR   OUT_DIR [--classifier echo|mock] [--requests F --responses F]
    python -m oculus_data_pipeline_spark uri      DOCS_DIR   OUT_DIR
    python -m oculus_data_pipeline_spark graph    DOCS_DIR   OUT_DIR
    python -m oculus_data_pipeline_spark all      XML_PATH   OUT_DIR

Stage boundaries are splittable JSONL directories (canonical documents
after ``ingest``, the reference's updated-JSON shape after
``classify``/``uri``); ``graph`` writes nodes/edges parquet tables.
The fused single-DAG path (plans/pipeline.py run_pipeline) remains the
fast path when no intermediate checkpoints are needed — exactly the
reference's trade-off between run_pipeline.py and stage-by-stage runs.
"""

from __future__ import annotations

import argparse
import sys

from .operators.classify import (
    EchoClassifier,
    MockReplayClassifier,
    OpenAIBatchClassifier,
)


def _make_classifier(args):
    if args.classifier == "echo":
        return EchoClassifier()
    if args.classifier == "mock":
        if not (args.requests and args.responses):
            raise SystemExit("--classifier mock requires --requests and --responses")
        return MockReplayClassifier(args.requests, args.responses)
    if args.classifier == "openai":
        return OpenAIBatchClassifier(
            model=args.model, audit_dir=args.audit_dir
        )
    raise SystemExit(f"unknown classifier {args.classifier!r}")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m oculus_data_pipeline_spark",
        description="Run reference-pipeline stages on Spark.",
    )
    sub = parser.add_subparsers(dest="stage", required=True)

    def add(name: str, src_help: str):
        p = sub.add_parser(name)
        p.add_argument("src", help=src_help)
        p.add_argument("out", help="output directory")
        p.add_argument("--classifier", default="echo",
                       choices=["echo", "mock", "openai"])
        p.add_argument("--requests", help="mock: request JSONL fixture")
        p.add_argument("--responses", help="mock: response JSONL fixture")
        p.add_argument("--model", default="gpt-4o-mini")
        p.add_argument("--audit-dir", help="openai: K3/K4 audit JSONL directory")
        p.add_argument("--cpus", type=int, default=None)
        return p

    add("ingest", "XML file/dir/glob")
    add("classify", "canonical documents JSONL dir (ingest output)")
    add("uri", "enriched documents JSONL dir (classify output)")
    add("graph", "enriched+uri documents JSONL dir (uri output)")
    add("all", "XML file/dir/glob")
    args = parser.parse_args(argv)

    from .plans import stages
    from .session import get_spark
    from .sinks.graph_sink import write_graph_parquet
    from .sources.json_docs import read_documents_json

    spark = get_spark(f"oculus-stage-{args.stage}", cpus=args.cpus)

    def read_enriched(path: str):
        return spark.read.schema(stages.ENRICHED_DOCUMENT_SCHEMA).json(path)

    if args.stage == "ingest":
        stages.ingest_stage(spark, args.src).write.mode("overwrite").json(args.out)
    elif args.stage == "classify":
        docs = read_documents_json(spark, args.src)
        stages.classify_stage(docs, _make_classifier(args)).write.mode(
            "overwrite"
        ).json(args.out)
    elif args.stage == "uri":
        stages.uri_stage(read_enriched(args.src)).write.mode("overwrite").json(
            args.out
        )
    elif args.stage == "graph":
        nodes, edges = stages.graph_stage(read_enriched(args.src))
        write_graph_parquet(nodes, edges, args.out)
    elif args.stage == "all":
        import os

        docs_dir = os.path.join(args.out, "documents")
        enriched_dir = os.path.join(args.out, "classified")
        uri_dir = os.path.join(args.out, "with_uris")
        graph_dir = os.path.join(args.out, "graph")
        stages.ingest_stage(spark, args.src).write.mode("overwrite").json(docs_dir)
        docs = read_documents_json(spark, docs_dir)
        stages.classify_stage(docs, _make_classifier(args)).write.mode(
            "overwrite"
        ).json(enriched_dir)
        stages.uri_stage(read_enriched(enriched_dir)).write.mode("overwrite").json(
            uri_dir
        )
        nodes, edges = stages.graph_stage(read_enriched(uri_dir))
        write_graph_parquet(nodes, edges, graph_dir)
    print(f"stage {args.stage} complete → {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
