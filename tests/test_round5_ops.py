"""Round-5 additions: ADVICE fixes (input validation, node-universe
hygiene, loud oracle guards) and the scale escape hatches (sampled
all-sources BFS, LSH mutual-kNN candidates)."""

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------- ADVICE


def test_random_failure_rejects_bad_percents(spark):
    from online_centrality_spark.operators.robustness import random_failure

    e = _edges(spark, [(1, 2), (2, 3)])
    with pytest.raises(ValueError, match="integers"):
        random_failure(e, percents=[0, 12.5])
    with pytest.raises(ValueError, match="integers"):
        random_failure(e, percents=[-1, 10])
    with pytest.raises(ValueError, match="integers"):
        random_failure(e, percents=[101])
    # integer-valued floats are fine (int(p) == p)
    assert random_failure(e, percents=[0, 50.0]).count() >= 1


def test_clustering_by_degree_ignores_selfloop_only_nodes(spark):
    """A self-loop-only endpoint has no simple-graph degree: it must not
    create a spurious k=0 class (the SQL oracle's node universe comes
    from the deduped simple edge list and never emits one)."""
    from online_centrality_spark.operators.summary import clustering_by_degree

    tri = [(1, 2), (2, 3), (1, 3), (9, 9)]  # triangle + self-loop-only node 9
    out = clustering_by_degree(_edges(spark, tri)).collect()
    ks = {r["k"] for r in out}
    assert 0 not in ks
    assert ks == {2}
    row = out[0]
    assert row["n_nodes"] == 3 and abs(row["ck"] - 1.0) < 1e-9


def test_msf_oracle_guards_fire():
    """The MSF oracle must fail LOUD (DuckDB error()) instead of
    returning a wrong forest when the BIGINT key order breaks (node id
    >= 1e5) or the doubling closure has not converged."""

    import duckdb

    import __spark_entry__ as entry_mod

    sql = entry_mod.oracle_sql()["msf"]

    # embeddings crafted so every pair clears the cosine threshold:
    # a 100001-id row breaks the key order -> guard must raise
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(100001, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [1.0, 0.2])"
        ") t(vec_id, embedding)"
    )
    with pytest.raises(Exception, match="key order"):
        con.sql(sql).fetchall()

    # a 12-node chain in embedding space (v_i = e_i + 0.5*e_{i+1}:
    # adjacent cosine 0.4 >= COS_TH, non-adjacent 0) with the closure
    # truncated to ONE doubling round (2-hop paths) -> convergence
    # guard must raise instead of emitting a wrong forest
    trunc = entry_mod._msf_sql(rounds=1)
    n = 12
    vecs = []
    for i in range(n):
        v = [0.0] * (n + 1)
        v[i] = 1.0
        v[i + 1] = 0.5
        vecs.append(f"({i}, {v})")
    con2 = duckdb.connect()
    con2.sql(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        + ", ".join(vecs)
        + ") t(vec_id, embedding)"
    )
    with pytest.raises(Exception, match="not converged"):
        con2.sql(trunc).fetchall()
