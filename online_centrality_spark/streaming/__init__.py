from .replay import StreamingDistributedReplay
from .stream import (
    stream_edge_induction,
    streaming_exact_dedup,
    windowed_decayed_indegree,
    windowed_edge_counts,
)

__all__ = [
    "StreamingDistributedReplay",
    "stream_edge_induction",
    "streaming_exact_dedup",
    "windowed_decayed_indegree",
    "windowed_edge_counts",
]
