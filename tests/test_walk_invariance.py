"""Property-style invariants for the walk path (SURVEY §5.3).

Exp-decay factorization means scores must be independent of HOW the
replay is sliced: interval batching granularity, cache block size, and
chain-closed partitioning must all produce identical read-outs. Seeded
regimes cover hub-heavy targets, timestamp ties, and empty intervals.
"""

import numpy as np
import pytest

from online_centrality_spark.functions.weights import ExponentialWeighter
from online_centrality_spark.operators.temporal_katz import TemporalKatz

# bounded at the streams' hub in-rate (~0.11 edges/s): branching
# beta * rate * norm / ln2 stays < ~0.5 for both params
PARAMS = [
    (0.02, ExponentialWeighter(norm=150.0, base=0.5)),
    (0.01, ExponentialWeighter(norm=300.0, base=0.5)),
]


def _stream(seed, n=14, E=600, span=4000.0, hub=True, ties=False):
    rng = np.random.default_rng(seed)
    w = np.ones(n)
    if hub:
        w[:2] = 15.0  # hub-heavy targets
    dst = rng.choice(n, E, p=w / w.sum())
    src = rng.integers(0, n, E)
    t = np.sort(rng.uniform(0, span, E)).astype(np.int64)
    if ties:
        t = (t // 250) * 250  # heavy timestamp ties; seq breaks them
    return t, src, dst


def _df(spark, t, src, dst):
    rows = [
        (float(tt), int(s), int(d), i + 1)
        for i, (tt, s, d) in enumerate(zip(t, src, dst))
    ]
    return spark.createDataFrame(rows, "key double, src long, dst long, seq long")


def _replay(spark, t, src, dst, boundaries, chunksize, **kw):
    n = int(max(src.max(), dst.max())) + 1
    tk = TemporalKatz(PARAMS, n, path="walk", **kw)
    df = _df(spark, t, src, dst)
    outs = {}
    ivs = [(i, float(b), float(b)) for i, b in enumerate(boundaries)]
    for s in range(0, len(ivs), chunksize):
        outs.update(tk.run_batch(df, ivs[s : s + chunksize]))
    return outs


def _canon(outs):
    return {
        i: {
            (p, int(n)): float(s)
            for p, n, s in zip(pdf["param_id"], pdf["node_id"], pdf["score"])
        }
        for i, pdf in outs.items()
    }


def _assert_equal(a, b, rtol=1e-9):
    assert set(a) == set(b)
    for i in a:
        assert set(a[i]) == set(b[i]), i
        for k, v in a[i].items():
            assert b[i][k] == pytest.approx(v, rel=rtol, abs=1e-12), (i, k)


@pytest.mark.parametrize("seed,ties", [(1, False), (2, True), (3, False)])
def test_walk_invariant_to_slicing(spark, seed, ties):
    t, src, dst = _stream(seed, ties=ties)
    # boundaries include an empty leading interval and a trailing one
    boundaries = [200.0, 900.0, 1800.0, 2700.0, 3600.0, 4200.0]
    base = _canon(_replay(spark, t, src, dst, boundaries, chunksize=6))
    one_by_one = _canon(_replay(spark, t, src, dst, boundaries, chunksize=1))
    tiny_blocks = _canon(
        _replay(spark, t, src, dst, boundaries, chunksize=6, walk_block=37)
    )
    _assert_equal(base, one_by_one)
    _assert_equal(base, tiny_blocks)


def test_walk_seq_order_at_timestamp_ties(spark):
    # chained edges at ONE tied timestamp, presented key-sorted but
    # seq-REVERSED: the presorted fast path must detect lexicographic
    # (key, seq) disorder, not just key disorder, or the chain is applied
    # out of the reference's stable seq order (ADVICE r01, medium)
    rows = [
        (100.0, 0, 1, 1),
        (100.0, 1, 2, 2),
        (100.0, 2, 3, 3),
        (100.0, 3, 4, 4),
    ]
    schema = "key double, src long, dst long, seq long"
    ivs = [(0, 200.0, 200.0)]
    outs = []
    for data in (rows, rows[::-1]):
        tk = TemporalKatz(PARAMS, 5, path="walk")
        outs.append(
            _canon(tk.run_batch(spark.createDataFrame(data, schema), ivs))
        )
    _assert_equal(outs[0], outs[1])
    # ground truth: the chain must actually have propagated (node 4 sees
    # a length-4 walk term, strictly greater than the single-edge inject)
    beta, w = PARAMS[0]
    pid = "tk_b%0.2f_%s" % (beta, w)
    single = beta * w.weight(100.0)
    assert outs[0][0][(pid, 4)] > single * (1 + beta * 0.5)


def test_walk_invariant_to_partitioning(spark):
    # two disjoint node blocks -> closure partitioning must not change
    # anything vs the single-task run
    t1, s1, d1 = _stream(7, n=6)
    t2, s2, d2 = _stream(8, n=6)
    t = np.concatenate([t1, t2])
    src = np.concatenate([s1, s2 + 6])
    dst = np.concatenate([d1, d2 + 6])
    o = np.argsort(t, kind="stable")
    t, src, dst = t[o], src[o], dst[o]
    boundaries = [1000.0, 2500.0, 4200.0]
    single = _canon(_replay(spark, t, src, dst, boundaries, chunksize=3))
    comp = _canon(
        _replay(
            spark, t, src, dst, boundaries, chunksize=3,
            walk_layout="components", walk_partitions=5,
        )
    )
    _assert_equal(single, comp)
