from .edges import (
    actor_transition_counts,
    age_degree_profile,
    add_global_seq,
    edges_from_events,
    edges_from_transcripts,
)
from .layout import write_edges_bucketed
from .transcripts import (
    conversation_stats,
    dialogue_pairs,
    generate_transcripts,
    read_transcripts,
)

__all__ = [
    "generate_transcripts",
    "conversation_stats",
    "dialogue_pairs",
    "read_transcripts",
    "edges_from_transcripts",
    "edges_from_events",
    "add_global_seq",
    "actor_transition_counts",
    "age_degree_profile",
    "write_edges_bucketed",
]
