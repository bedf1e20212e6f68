from .graph_sink import write_graph_parquet, write_graph_neo4j

__all__ = ["write_graph_parquet", "write_graph_neo4j"]
