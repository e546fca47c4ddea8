"""Snapshot boundary semantics, expressed declaratively.

The reference's replay loop (``graph_simulator.py:41-109``) has three
load-bearing quirks the engine must reproduce without replaying row by
row:

1. **Inactive intervals** — a boundary with no edges still emits a
   snapshot (scores decay-read-out at the boundary time).
2. **Trailing flush** (epoch mode) — if the stream ends strictly inside
   interval ``J+1`` (and ``J+1 > 1``), that partial interval *is*
   emitted, read out at its full boundary time
   (``graph_simulator.py:74-77``).
3. **Termination caps** — ``max_index`` and the final boundary stop
   emission; edges beyond the last emitted boundary are never applied.

Each emitted snapshot becomes a half-open edge-window predicate
``lo < key <= hi`` over event time (epoch mode) or the stable global
edge rank ``seq`` (index mode) — plain range filters, so Catalyst
partition pruning applies.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SnapshotInterval:
    interval_id: int
    boundary: int  # read-out time (epoch or edge index)
    lo: float  # window predicate: lo < key <= hi  (key = t or seq)
    hi: float


def epoch_schedule(
    boundaries: list[int], t_max: int, max_index: int | None = None
) -> list[SnapshotInterval]:
    """Emitted snapshots for epoch-mode replay over data ending at ``t_max``."""
    if not boundaries:
        return []
    stop_i = len(boundaries) - 1
    if max_index is not None:
        stop_i = min(stop_i, max_index - 1)
    # last boundary actually reached by the data
    reached = -1
    for i, b in enumerate(boundaries):
        if b <= t_max:
            reached = i
        else:
            break
    out: list[SnapshotInterval] = []
    last_loop = min(reached, stop_i)
    for i in range(last_loop + 1):
        lo = float("-inf") if i == 0 else float(boundaries[i - 1])
        out.append(SnapshotInterval(i, boundaries[i], lo, float(boundaries[i])))
    if reached < stop_i:
        # trailing flush: stream ends inside interval reached+1
        j = reached + 1
        if j > 1 and t_max > boundaries[j - 1] and t_max < boundaries[j]:
            out.append(
                SnapshotInterval(
                    j, boundaries[j], float(boundaries[j - 1]), float(boundaries[j])
                )
            )
    return out


def index_schedule(
    boundaries: list[int], num_edges: int, max_index: int | None = None
) -> list[SnapshotInterval]:
    """Emitted snapshots for index-mode replay (``graph_simulator.py:80-109``).

    Time is the 1-based global edge rank; the stream is cut at
    ``T_cap = min(num_edges, max_index, boundaries[-1])``. A boundary not
    reached by ``T_cap`` still emits one final (partial) snapshot whose
    read-out time is the *full* boundary value.
    """
    if not boundaries:
        return []
    t_cap = num_edges
    if max_index is not None:
        t_cap = min(t_cap, max_index)
    t_cap = min(t_cap, boundaries[-1])
    if t_cap < 1:
        return []
    out: list[SnapshotInterval] = []
    for i, b in enumerate(boundaries):
        lo = 0.0 if i == 0 else float(boundaries[i - 1])
        if b <= t_cap:
            out.append(SnapshotInterval(i, b, lo, float(b)))
            if b == t_cap:
                break
        else:
            if t_cap > lo:
                # partial final interval, read out at the full boundary
                out.append(SnapshotInterval(i, b, lo, float(t_cap)))
            break
    return out
