"""Round-4 additions, batch s: edge neighborhood overlap (tie
strength / local bridges) and per-community conductance — each against
an independent in-Python oracle."""

import random

from online_centrality_spark.operators.community import community_conductance
from online_centrality_spark.operators.triangles import edge_overlap


def test_edge_overlap_matches_brute(spark):
    rng = random.Random(109)
    edges = [(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(55)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["a"], r["b"]): (r["cn"], r["overlap"], r["is_local_bridge"])
        for r in edge_overlap(df).collect()
    }
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    adj = {}
    for h, l in es:
        adj.setdefault(h, set()).add(l)
        adj.setdefault(l, set()).add(h)
    want = {}
    for h, l in es:
        a, b = l, h
        cn = len(adj[a] & adj[b])
        denom = len(adj[a]) + len(adj[b]) - cn - 2
        ov = None if denom <= 0 else round(cn / denom, 6)
        want[(a, b)] = (cn, ov, 1 if cn == 0 else 0)
    assert got == want


def test_edge_overlap_triangle_and_bridge(spark):
    # triangle 0-1-2 plus a pendant bridge 2-9
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 9)], "src long, dst long"
    )
    got = {(r["a"], r["b"]): r for r in edge_overlap(df).collect()}
    assert got[(0, 1)]["overlap"] == 1.0  # only common neighbor is the union
    assert got[(2, 9)]["is_local_bridge"] == 1
    assert got[(2, 9)]["overlap"] == 0.0


def test_community_conductance_matches_brute(spark):
    rng = random.Random(113)
    edges = [(rng.randint(0, 11), rng.randint(0, 11)) for _ in range(40)]
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    nodes = {n for e in es for n in e}
    lab = {n: n % 3 for n in nodes}
    df = spark.createDataFrame(list(es), "src long, dst long")
    ldf = spark.createDataFrame(list(lab.items()), "node_id long, label long")
    got = {
        r["label"]: (r["n_nodes"], r["vol"], r["cut"], r["conductance"])
        for r in community_conductance(df, ldf).collect()
    }
    deg = {}
    for h, l in es:
        deg[h] = deg.get(h, 0) + 1
        deg[l] = deg.get(l, 0) + 1
    m2 = 2 * len(es)
    want = {}
    for c in set(lab.values()):
        members = [n for n in nodes if lab[n] == c]
        vol = sum(deg[n] for n in members)
        cut = sum(1 for h, l in es if (lab[h] == c) != (lab[l] == c))
        den = min(vol, m2 - vol)
        want[c] = (len(members), vol, cut, None if den <= 0 else round(cut / den, 6))
    assert got == want


def test_community_conductance_perfect_split(spark):
    # two disjoint triangles labeled by component: zero cut everywhere
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    labels = [(n, 0) for n in (0, 1, 2)] + [(n, 1) for n in (10, 11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ldf = spark.createDataFrame(labels, "node_id long, label long")
    for r in community_conductance(df, ldf).collect():
        assert r["cut"] == 0 and r["conductance"] == 0.0


# --------------------------------------------------------- session flows


def test_session_flows_matches_brute(spark):
    import random

    from pyspark.sql import functions as F

    from online_centrality_spark.streaming.sessions import session_flows

    rng = random.Random(131)
    rows = []
    eid = 0
    for u in range(6):
        t = 1_000_000_000_000
        for _ in range(rng.randint(2, 25)):
            t += rng.choice([60, 600, 2400]) * 1_000_000  # 1m / 10m / 40m
            rows.append((u, t, eid, "abcd"[rng.randint(0, 3)]))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, event_id long, event_type string"
    ).select(
        "user_id", F.timestamp_micros("t_us").alias("ts"), "event_id", "event_type"
    )
    got = {
        (r["entry_type"], r["exit_type"]): r["n_sessions"]
        for r in session_flows(df, gap_minutes=30.0).collect()
    }
    want = {}
    by_u = {}
    for u, t, e, tp in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_u.setdefault(u, []).append((t, e, tp))
    for u, evs in by_u.items():
        sessions, cur = [], [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[0] - prev[0] > 30 * 60 * 1_000_000:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for s in sessions:
            key = (s[0][2], s[-1][2])
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_session_flows_counts_match_sessionize(spark):
    from pyspark.sql import functions as F

    from online_centrality_spark.streaming.sessions import session_flows, sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_flow = (
        session_flows(ev, gap_minutes=30.0)
        .agg(F.sum("n_sessions"))
        .collect()[0][0]
    )
    n_sess = sessionize(ev, gap_minutes=30.0, value_col=None).count()
    assert n_flow == n_sess
