from .replay import StreamingDistributedReplay
from .sessions import response_latency, session_stats, sessionize
from .stream import (
    stream_edge_induction,
    streaming_exact_dedup,
    windowed_decayed_indegree,
    windowed_edge_counts,
)

__all__ = [
    "StreamingDistributedReplay",
    "sessionize",
    "response_latency",
    "session_stats",
    "stream_edge_induction",
    "streaming_exact_dedup",
    "windowed_decayed_indegree",
    "windowed_edge_counts",
]
