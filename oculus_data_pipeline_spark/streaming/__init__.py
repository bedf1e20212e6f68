from .ingest import read_events_stream, read_xml_stream, stream_pipeline_to_graph
from .windows import (
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "read_xml_stream",
    "stream_pipeline_to_graph",
    "session_window_agg",
    "sliding_window_agg",
    "stream_dedup",
    "tumbling_window_agg",
]
