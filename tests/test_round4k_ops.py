"""Round-4 additions, batch k: graph summary report, domain KL
divergence, transition entropy — each against an independent in-Python
oracle built from the same exact-count + scaled-int-sum definitions."""

import math
import random

from online_centrality_spark.operators.summary import graph_summary
from online_centrality_spark.streaming.sessions import transition_entropy
from online_centrality_spark.text.analysis import domain_divergence


def _scaled_sum(terms):
    # the operators sum round(term*1e12) as int64 — mirror that exactly
    def _round_half_up(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    return sum(_round_half_up(t * 1e12) for t in terms)


# ---------------------------------------------------------- graph summary


def test_graph_summary_matches_brute(spark):
    rng = random.Random(43)
    edges = [(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = graph_summary(df).collect()[0]
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    deg = {}
    for h, l in es:
        deg[h] = deg.get(h, 0) + 1
        deg[l] = deg.get(l, 0) + 1
    n, m = len(deg), len(es)
    assert (got["n_nodes"], got["n_edges"]) == (n, m)
    assert got["density"] == round(m * 2.0 / (n * (n - 1.0)), 6)
    assert got["mean_degree"] == round(2 * m / n, 6)
    assert got["molloy_reed"] == round(
        sum(d * d for d in deg.values()) / (2 * m), 6
    )
    hist = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1
    ent = _scaled_sum((c / n) * math.log(c / n) for c in hist.values())
    assert got["degree_entropy"] == round(-ent / 1e12, 6)
    ln2d = _scaled_sum(math.log(2.0 * d) for d in deg.values())
    assert got["powerlaw_alpha"] == round(1.0 + n / (ln2d / 1e12), 6)


# ------------------------------------------------------ domain divergence


def test_domain_divergence_matches_brute(spark):
    docs = [
        (1, "alpha beta beta gamma", "en", "web"),
        (2, "alpha alpha delta", "en", "web"),
        (3, "beta beta beta epsilon", "en", "chat"),
        (4, "gamma delta delta", "en", "chat"),
        (5, "alpha beta gamma delta epsilon", "en", "books"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string")
    got = {r["source"]: (r["n_tokens"], r["kl"]) for r in domain_divergence(df).collect()}
    cdw, cw = {}, {}
    for _, text, _, src in docs:
        for w in text.split():
            cdw[(src, w)] = cdw.get((src, w), 0) + 1
            cw[w] = cw.get(w, 0) + 1
    n = sum(cw.values())
    want = {}
    for src in {s for s, _ in cdw}:
        nd = sum(c for (s, _), c in cdw.items() if s == src)
        terms = [
            (c / nd) * math.log((c / nd) / (cw[w] / n))
            for (s, w), c in cdw.items()
            if s == src
        ]
        want[src] = (nd, round(_scaled_sum(terms) / 1e12, 6))
    assert got == want


def test_domain_divergence_identical_domains_is_zero(spark):
    docs = [
        (1, "x y z", "en", "a"),
        (2, "x y z", "en", "b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string")
    for r in domain_divergence(df).collect():
        assert r["kl"] == 0.0


# ----------------------------------------------------- transition entropy


def test_transition_entropy_deterministic_chain_is_zero(spark):
    rows = [(1, i, "ab"[i % 2]) for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    r = transition_entropy(df).collect()[0]
    assert r["entropy_rate"] == 0.0
    assert r["n_states"] == 2 and r["n_transitions"] == 19


def test_transition_entropy_matches_brute(spark):
    rng = random.Random(47)
    rows = []
    eid = 0
    for u in range(5):
        for _ in range(rng.randint(5, 40)):
            rows.append((u, eid, "abcd"[rng.randint(0, 3)]))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    got = transition_entropy(df).collect()[0]
    cij, by_user = {}, {}
    for u, e, t in sorted(rows, key=lambda r: (r[0], r[1])):
        if u in by_user:
            cij[(by_user[u], t)] = cij.get((by_user[u], t), 0) + 1
        by_user[u] = t
    ci = {}
    for (a, _), c in cij.items():
        ci[a] = ci.get(a, 0) + c
    n = sum(cij.values())
    terms = [(c / n) * math.log(c / ci[a]) for (a, _), c in cij.items()]
    states = {a for a, _ in cij} | {b for _, b in cij}
    assert got["n_transitions"] == n
    assert got["n_states"] == len(states)
    assert got["entropy_rate"] == round(-_scaled_sum(terms) / 1e12, 6)
