"""Round-4 additions, batch t: higher-order motif census against an
itertools brute force and K5/C4 closed forms."""

import random
from itertools import combinations

from online_centrality_spark.operators.triangles import higher_motifs


def _census(es):
    adj = {}
    nodes = set()
    for h, l in es:
        adj.setdefault(h, set()).add(l)
        adj.setdefault(l, set()).add(h)
        nodes |= {h, l}
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in nodes)
    tris = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    c4 = 0
    for quad in combinations(sorted(nodes), 4):
        # count distinct 4-cycles on the quad: 3 pairings, each a cycle
        # iff its two diagonal pairs are the NON-edges of the pairing
        a, b, c, d = quad
        for cyc in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            w, x, y, z = cyc
            if (
                x in adj[w]
                and y in adj[x]
                and z in adj[y]
                and w in adj[z]
            ):
                c4 += 1
    diamonds = 0
    for h, l in es:
        cn = len(adj[h] & adj[l])
        diamonds += cn * (cn - 1) // 2
    k4 = sum(
        1
        for q in combinations(sorted(nodes), 4)
        if all(y in adj[x] for x, y in combinations(q, 2))
    )
    return wedges, tris, c4, diamonds, k4


def test_higher_motifs_matches_brute(spark):
    rng = random.Random(127)
    edges = [(rng.randint(0, 11), rng.randint(0, 11)) for _ in range(40)]
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    df = spark.createDataFrame(list(es), "src long, dst long")
    r = higher_motifs(df).collect()[0]
    w, t, c4, dm, k4 = _census(es)
    assert (
        r["n_edges"],
        r["n_wedges"],
        r["n_triangles"],
        r["n_four_cycles"],
        r["n_diamonds"],
        r["n_k4"],
    ) == (len(es), w, t, c4, dm, k4)


def test_higher_motifs_k5_closed_form(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = higher_motifs(df).collect()[0]
    assert (
        r["n_edges"],
        r["n_wedges"],
        r["n_triangles"],
        r["n_four_cycles"],
        r["n_diamonds"],
        r["n_k4"],
    ) == (10, 30, 10, 15, 30, 5)


def test_higher_motifs_plain_cycle(spark):
    # C4 itself: 4 edges, 4 wedges, no triangles, one 4-cycle
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long")
    r = higher_motifs(df).collect()[0]
    assert (r["n_triangles"], r["n_four_cycles"], r["n_diamonds"], r["n_k4"]) == (
        0,
        1,
        0,
        0,
    )
