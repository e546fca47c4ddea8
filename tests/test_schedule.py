"""Snapshot boundary semantics: declarative schedule == oracle replay loop.

The engine derives emitted snapshots + window predicates declaratively
(plans/snapshots.py); the oracle replays the reference's loop verbatim
(graph_simulator.py:41-109). They must agree on which intervals emit,
at which boundary, and which edges fall in each window — including
inactive intervals, trailing flush, and max_index/num_edges termination.
"""

import numpy as np
import pytest

from online_centrality_spark.plans.snapshots import epoch_schedule, index_schedule
from tests.oracle.reference_oracle import OracleReplay


def random_stream(seed, n_edges=200, n_nodes=12, t_span=1000):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, t_span, n_edges))
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return [(int(t), int(s), int(d)) for t, s, d in zip(ts, src, dst)]


def window_edges_by_predicate(edges, lo, hi, key="t"):
    if key == "t":
        return [(s, d) for t, s, d in edges if lo < t <= hi]
    return [
        (s, d) for i, (t, s, d) in enumerate(edges, start=1) if lo < i <= hi
    ]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("max_index", [None, 3])
def test_epoch_schedule_matches_oracle(seed, max_index):
    edges = random_stream(seed)
    t0 = edges[0][0]
    delta = 90 + seed * 13
    boundaries = [t0 + delta * (i + 1) for i in range(15)]
    oracle = OracleReplay(edges, "epoch").run(boundaries, [], max_index=max_index)
    t_max = max(t for t, _, _ in edges)
    sched = epoch_schedule(boundaries, t_max, max_index)
    assert [s.interval_id for s in sched] == [o["interval_id"] for o in oracle]
    assert [s.boundary for s in sched] == [o["boundary"] for o in oracle]
    for s, o in zip(sched, oracle):
        assert window_edges_by_predicate(edges, s.lo, s.hi, "t") == o["interval_edges"]


def test_epoch_gap_and_trailing_flush():
    # gaps spanning several boundaries + stream ending mid-interval
    edges = [(10, 0, 1), (12, 1, 2), (500, 2, 3), (505, 3, 4), (730, 4, 5)]
    boundaries = [100, 200, 300, 400, 600, 700, 800, 900]
    oracle = OracleReplay(edges, "epoch").run(boundaries, [])
    sched = epoch_schedule(boundaries, 730, None)
    assert [s.interval_id for s in sched] == [o["interval_id"] for o in oracle]
    # intervals 1-3 are inactive but still emitted
    assert [o["interval_edges"] for o in oracle][1:4] == [[], [], []]
    # trailing flush: data ends inside interval 7 -> emitted at boundary 800
    assert sched[-1].boundary == 800
    for s, o in zip(sched, oracle):
        assert window_edges_by_predicate(edges, s.lo, s.hi, "t") == o["interval_edges"]


def test_epoch_no_flush_when_interval_le_1():
    # stream ends inside interval 1: reference quirk — no flush (interval_id > 1 required)
    edges = [(10, 0, 1), (150, 1, 2)]
    boundaries = [100, 200, 300]
    oracle = OracleReplay(edges, "epoch").run(boundaries, [])
    sched = epoch_schedule(boundaries, 150, None)
    assert len(oracle) == len(sched) == 1
    assert sched[0].boundary == 100


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("max_index", [None, 77])
def test_index_schedule_matches_oracle(seed, max_index):
    edges = random_stream(seed, n_edges=150)
    boundaries = [25 * (i + 1) for i in range(10)]
    oracle = OracleReplay(edges, "index").run(boundaries, [], max_index=max_index)
    sched = index_schedule(boundaries, len(edges), max_index)
    assert [s.interval_id for s in sched] == [o["interval_id"] for o in oracle]
    assert [s.boundary for s in sched] == [o["boundary"] for o in oracle]
    for s, o in zip(sched, oracle):
        assert (
            window_edges_by_predicate(edges, s.lo, s.hi, "seq")
            == o["interval_edges"]
        )


def test_index_partial_final_interval():
    edges = random_stream(3, n_edges=60)
    boundaries = [25, 50, 75, 100]
    oracle = OracleReplay(edges, "index").run(boundaries, [])
    sched = index_schedule(boundaries, 60, None)
    assert [s.boundary for s in sched] == [o["boundary"] for o in oracle]
    # final snapshot is partial: 10 edges, read out at boundary 75
    assert sched[-1].hi == 60 and sched[-1].boundary == 75
