from .graph_sink import (
    write_graph_delta_merge,
    write_graph_neo4j,
    write_graph_parquet,
)

__all__ = [
    "write_graph_delta_merge",
    "write_graph_neo4j",
    "write_graph_parquet",
]
