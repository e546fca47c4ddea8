from .replay import StreamingDistributedReplay
from .sessions import session_stats, sessionize
from .stream import (
    stream_edge_induction,
    streaming_exact_dedup,
    windowed_decayed_indegree,
    windowed_edge_counts,
)

__all__ = [
    "StreamingDistributedReplay",
    "sessionize",
    "session_stats",
    "stream_edge_induction",
    "streaming_exact_dedup",
    "windowed_decayed_indegree",
    "windowed_edge_counts",
]
