"""Property tests (hypothesis) for the round-4 exact-arithmetic graph
operators — rich_club, butterfly_count, edge_persistence agree with
python brute force on arbitrary small graphs (the
test_property_pipeline style: few examples, the property carries the
weight)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from online_centrality_spark.operators import (
    butterfly_count,
    edge_persistence,
    rich_club,
)

pytestmark = pytest.mark.filterwarnings("ignore")

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
    ),
    min_size=0,
    max_size=40,
)


@given(edges=edge_lists)
@SLOW
def test_rich_club_property(spark, edges):
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    deg = {}
    for h, l in es:
        deg[h] = deg.get(h, 0) + 1
        deg[l] = deg.get(l, 0) + 1
    want = {}
    for k in range(1, max(deg.values(), default=1)):
        rich = {n for n, d in deg.items() if d > k}
        if len(rich) < 2:
            continue
        ek = sum(1 for h, l in es if h in rich and l in rich)
        want[k] = (
            len(rich),
            ek,
            round(2.0 * ek / (len(rich) * (len(rich) - 1)), 6),
        )
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    got = {
        r["k"]: (r["n_rich_nodes"], r["n_rich_edges"], r["phi"])
        for r in rich_club(df).collect()
    }
    assert got == want
    # structural properties: phi bounded, survivors shrink with k
    ks = sorted(got)
    for k in ks:
        assert 0.0 <= got[k][2] <= 1.0
    for a, b in zip(ks, ks[1:]):
        assert got[b][0] <= got[a][0]


@given(edges=edge_lists)
@SLOW
def test_butterfly_property(spark, edges):
    from itertools import combinations

    es = {(a, b) for a, b in edges}
    by_r = {}
    for u, r in es:
        by_r.setdefault(r, set()).add(u)
    wedges = sum(len(us) * (len(us) - 1) // 2 for us in by_r.values())
    c = {}
    for us in by_r.values():
        for u1, u2 in combinations(sorted(us), 2):
            c[(u1, u2)] = c.get((u1, u2), 0) + 1
    bf = sum(v * (v - 1) // 2 for v in c.values())
    df = spark.createDataFrame(list(es) or [(0, 0)], "src long, dst long")
    got = butterfly_count(df).collect()[0]
    want_edges = len(es) if es else 1
    assert got["n_edges"] == want_edges
    if es:
        assert (got["n_wedges"], got["n_butterflies"]) == (wedges, bf)
        assert got["n_butterflies"] <= wedges * (wedges - 1) // 2 + wedges


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=40,
    )
)
@SLOW
def test_edge_persistence_property(spark, rows):
    day_us = 86_400_000_000
    data = [(a, b, d * day_us + 7) for a, b, d in rows if a != b]
    by_day = {}
    for a, b, t in data:
        by_day.setdefault(t // day_us, set()).add((min(a, b), max(a, b)))
    want = {}
    for day in sorted(by_day):
        if day + 1 not in by_day:
            continue
        cur, nxt = by_day[day], by_day[day + 1]
        inter = len(cur & nxt)
        want[day] = (
            len(cur),
            len(nxt),
            inter,
            round(inter / (len(cur) + len(nxt) - inter), 6),
        )
    df = spark.createDataFrame(data or [(0, 0, 0)], "src long, dst long, t long")
    got = {
        r["day"]: (r["n_edges"], r["n_next"], r["n_common"], r["jaccard"])
        for r in edge_persistence(df).collect()
    }
    assert got == want
