from .replay import StreamingDistributedReplay
from .stream import (
    stream_edge_induction,
    windowed_decayed_indegree,
    windowed_edge_counts,
)

__all__ = [
    "StreamingDistributedReplay",
    "stream_edge_induction",
    "windowed_decayed_indegree",
    "windowed_edge_counts",
]
