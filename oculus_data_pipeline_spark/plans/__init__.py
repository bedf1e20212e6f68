from .pipeline import (
    DOCUMENT_XML_SCHEMA,
    build_document_graph,
    extract_terms,
    known_entities_from_docs,
    read_documents_xml,
    run_pipeline,
)

__all__ = [
    "DOCUMENT_XML_SCHEMA",
    "build_document_graph",
    "extract_terms",
    "known_entities_from_docs",
    "read_documents_xml",
    "run_pipeline",
]
