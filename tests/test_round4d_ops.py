"""Round-4 additions, batch d: hop-distance distribution / effective
diameter, strict-order conversion funnel, event-type trigram motifs —
each against an independent in-Python oracle."""

import datetime
import random
from collections import Counter, deque

import pytest

from online_centrality_spark.operators.bfs import hop_distribution
from online_centrality_spark.sources.edges import event_type_trigrams
from online_centrality_spark.streaming.sessions import conversion_funnel


# ----------------------------------------------------------- hop distribution


def _hopdist_brute(pairs, directed=False):
    adj = {}
    nodes = set()
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
        nodes.update((s, d))
    hist = Counter()
    for v in nodes:
        dist = {v: 0}
        q = deque([v])
        while q:
            u = q.popleft()
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    hist[dist[w]] += 1
                    q.append(w)
    return hist


def test_hop_distribution_matches_bfs(spark):
    rng = random.Random(17)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(50)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = hop_distribution(edges).toPandas().sort_values("d")
    exp = _hopdist_brute(pairs)
    assert dict(zip(got["d"], got["n_pairs"])) == dict(exp)
    total = sum(exp.values())
    cum = 0
    eff = None
    for d in sorted(exp):
        cum += exp[d]
        frac = cum / total
        row = got[got["d"] == d].iloc[0]
        assert row["cum_frac"] == pytest.approx(round(frac, 6), abs=1e-9)
        if eff is None and frac >= 0.9:
            eff = d
    assert (got["eff_diameter"] == eff).all()


def test_hop_distribution_path_graph(spark):
    # path 0-1-2-3: distances 1 (x3 pairs, doubled), 2 (x2), 3 (x1)
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = {
        r["d"]: r["n_pairs"] for r in hop_distribution(edges).collect()
    }
    assert got == {1: 6, 2: 4, 3: 2}


def test_hop_distribution_directed(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        r["d"]: r["n_pairs"]
        for r in hop_distribution(edges, directed=True).collect()
    }
    assert got == {1: 2, 2: 1}


# --------------------------------------------------------------------- funnel


def _funnel_brute(rows, stages):
    # rows: (user, etype, t); earliest-completion strict-order semantics
    done_prev = None
    out = []
    for k, stage in enumerate(stages):
        done = {}
        for u, e, t in sorted(rows, key=lambda r: r[2]):
            if e != stage:
                continue
            if k > 0 and (done_prev is None or u not in done_prev):
                continue
            if k > 0 and t <= done_prev[u]:
                continue
            if u not in done:
                done[u] = t
        out.append(len(done))
        done_prev = done
    return out


def test_funnel_matches_brute(spark):
    rng = random.Random(23)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (
            rng.randrange(12),
            rng.choice(types),
            1_500_000_000_000_000 + rng.randrange(10**9),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [
            (u, e, datetime.datetime.utcfromtimestamp(t / 1e6))
            for u, e, t in rows
        ],
        "user_id long, event_type string, ts timestamp",
    )
    got = (
        conversion_funnel(df, ["view", "click", "purchase"])
        .orderBy("stage_idx")
        .collect()
    )
    exp = _funnel_brute(rows, ["view", "click", "purchase"])
    assert [r["n_users"] for r in got] == exp
    assert got[0]["frac"] == pytest.approx(1.0)
    for r in got:
        assert r["frac"] == pytest.approx(
            round(r["n_users"] / exp[0], 6), abs=1e-9
        )


def test_funnel_strict_order(spark):
    # purchase BEFORE click must not count at stage 2
    base = datetime.datetime(2020, 1, 1)
    rows = [
        (1, "view", base),
        (1, "purchase", base + datetime.timedelta(seconds=1)),
        (1, "click", base + datetime.timedelta(seconds=2)),
        (2, "view", base),
        (2, "click", base + datetime.timedelta(seconds=1)),
        (2, "purchase", base + datetime.timedelta(seconds=2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r["stage"]: r["n_users"]
        for r in conversion_funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 2, "click": 2, "purchase": 1}


# ------------------------------------------------------------------- trigrams


def test_event_trigrams_matches_brute(spark):
    rng = random.Random(31)
    types = ["a", "b", "c"]
    rows = []
    eid = 0
    for u in range(8):
        t = 1_500_000_000_000_000
        for _ in range(rng.randrange(5, 25)):
            t += rng.randrange(0, 7200) * 1_000_000
            rows.append((eid, u, rng.choice(types), t))
            eid += 1
    df = spark.createDataFrame(
        [
            (e, u, ty, datetime.datetime.utcfromtimestamp(t / 1e6))
            for e, u, ty, t in rows
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    gap_us = 3600 * 1_000_000
    exp = Counter()
    by_user = {}
    for e, u, ty, t in sorted(rows):
        by_user.setdefault(u, []).append((t, e, ty))
    for u, seq in by_user.items():
        seq.sort()
        for i in range(2, len(seq)):
            (ta, _, a), (tb, _, b), (tc, _, c) = seq[i - 2], seq[i - 1], seq[i]
            if tc - tb <= gap_us and tb - ta <= gap_us:
                exp[f"{a}>{b}>{c}"] += 1
    got = {
        r["trigram"]: r["n"]
        for r in event_type_trigrams(df, gap_seconds=3600.0, top_k=100).collect()
    }
    assert got == dict(exp)


def test_event_trigrams_gap_excludes(spark):
    base = datetime.datetime(2020, 1, 1)
    rows = [
        (0, 1, "a", base),
        (1, 1, "b", base + datetime.timedelta(minutes=10)),
        (2, 1, "c", base + datetime.timedelta(hours=3)),  # gap too big
        (3, 1, "a", base + datetime.timedelta(hours=3, minutes=5)),
        (4, 1, "b", base + datetime.timedelta(hours=3, minutes=10)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r["trigram"]: r["n"]
        for r in event_type_trigrams(df, gap_seconds=3600.0).collect()
    }
    assert got == {"c>a>b": 1}


# ---------------------------------------------------------------- bpe merges


def test_bpe_merges_matches_brute(spark):
    from online_centrality_spark.text.analysis import bpe_merges

    docs = [
        (0, "aba abab x"),
        (1, "aba cd cd cd"),
        (2, "abab ef"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["pair"]: r["n"] for r in bpe_merges(sdf, top_k=50).collect()}
    from collections import Counter

    exp = Counter()
    words = Counter()
    for _, t in docs:
        words.update(t.split())
    for w, f in words.items():
        for i in range(len(w) - 1):
            exp[w[i : i + 2]] += f
    assert got == {p: n for p, n in exp.items()}


def test_bpe_merges_top_k_deterministic(spark):
    from online_centrality_spark.text.analysis import bpe_merges

    docs = [(i, "aa bb cc dd ee") for i in range(5)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = [r["pair"] for r in bpe_merges(sdf, top_k=3).collect()]
    # all pairs tie at n=5 -> lexicographic tiebreak selects aa, bb, cc
    assert got == ["aa", "bb", "cc"]


# ------------------------------------------------------------- trending nodes


def test_trending_nodes_brute(spark, tmp_path, monkeypatch):
    # build a tiny events parquet and compare against a dict replay of
    # the induction + half-split movers
    import pandas as pd

    import __spark_entry__ as entry_mod

    rows = []
    t0 = 1_500_000_000
    # one event_type stream: user sequence with a burst by user 9 late
    seq = [1, 2, 1, 3, 2, 9, 9, 9, 9, 2]
    for i, u in enumerate(seq):
        rows.append((i, pd.Timestamp(t0 + i * 10, unit="s"), u, "click", 1.0, ""))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    out = entry_mod.q_trending_nodes(spark, str(d)).collect()
    # induction: consecutive same-type events within 60s -> prev -> cur
    pairs = [
        (a, b, t0 * 10**6 + (i + 1) * 10 * 10**6)
        for i, (a, b) in enumerate(zip(seq, seq[1:]))
        if a != b
    ]
    mid = (pairs[0][2] + pairs[-1][2]) // 2
    from collections import Counter

    nf, ns = Counter(), Counter()
    for _, dst, t in pairs:
        (nf if t <= mid else ns)[dst] += 1
    exp = {}
    for n in set(nf) | set(ns):
        exp[n] = (nf.get(n, 0), ns.get(n, 0), ns.get(n, 0) - nf.get(n, 0))
    got = {r["node_id"]: (r["n_first"], r["n_second"], r["delta"]) for r in out}
    assert got == exp
