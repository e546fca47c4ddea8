"""S5/S6/S7 score & graph I/O and L2-L7 labeling operators vs plain
pandas/python oracles (reference semantics cited in the modules)."""

import math

import numpy as np
import pandas as pd

from online_centrality_spark.labeling import (
    assign_interval_labels,
    daily_labels,
    daily_participants,
    epoch_to_date,
    match_names,
    prediction_metrics,
)
from online_centrality_spark.sources.scores_io import (
    export_score_files,
    load_score_map,
    read_real_graph,
)

from pyspark.sql import functions as F


def test_score_file_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "param_id": ["a"] * 3 + ["b"] * 2,
            "snapshot_id": [0, 0, 1, 0, 0],
            "node_id": [1, 2, 3, 1, 9],
            "score": [0.5, 1.25, 3.0, 0.125, 7.5],
        }
    )
    scores = spark.createDataFrame(pdf)
    files = export_score_files(scores, str(tmp_path), prefix="tk")
    assert sorted(f.split(str(tmp_path) + "/")[1] for f in files) == [
        "a/tk_0.csv",
        "a/tk_1.csv",
        "b/tk_0.csv",
    ]
    # headerless space-separated node_id score (base_computer.py:7-10)
    raw = open(f"{tmp_path}/a/tk_0.csv").read().splitlines()
    assert raw == ["1 0.5", "2 1.25"]
    back = load_score_map(spark, f"{tmp_path}/a/tk_0.csv").toPandas()
    assert dict(zip(back["node_id"], back["score"])) == {1: 0.5, 2: 1.25}
    # epsilon + include/exclude semantics (eval_utils.py:10-28)
    eps = load_score_map(
        spark, f"{tmp_path}/a/tk_0.csv", epsilon=0.1, excluded_ids=[2]
    ).toPandas()
    assert dict(zip(eps["node_id"], eps["score"])) == {1: 0.6}
    only = load_score_map(
        spark, f"{tmp_path}/a/tk_0.csv", restricted_ids=[2]
    ).toPandas()
    assert dict(zip(only["node_id"], only["score"])) == {2: 1.25}


def test_read_real_graph(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("[100] 1 2\n[101] 2 2\nnot a line\n[102] 3 1\n103 4 5\n")
    got = (
        read_real_graph(spark, str(p))
        .orderBy("t")
        .toPandas()
        .values.tolist()
    )
    # self-loop (2,2) and malformed line dropped; bare "103 4 5" accepted
    assert got == [[100, 1, 2], [102, 3, 1], [103, 4, 5]]


def test_epoch_to_date_tz(spark):
    df = spark.range(1).select(
        epoch_to_date(F.lit(1495584000)).alias("utc"),
        epoch_to_date(F.lit(1495584000), "Europe/Paris").alias("paris"),
    )
    row = df.collect()[0]
    assert row["utc"] == "2017-05-24"
    assert row["paris"] == "2017-05-24"
    # near-midnight rollover differs by timezone
    df2 = spark.range(1).select(
        epoch_to_date(F.lit(1495583999)).alias("utc"),
        epoch_to_date(F.lit(1495583999), "Pacific/Auckland").alias("nz"),
    )
    r2 = df2.collect()[0]
    assert r2["utc"] == "2017-05-23"
    assert r2["nz"] == "2017-05-24"


def test_match_names_multi_hit(spark):
    refs = spark.createDataFrame(
        [(1, "Roger Federer"), (2, "Xx Yy")], "rk long, rname string"
    )
    cands = spark.createDataFrame(
        [(10, "rogerfederer"), (11, "roger federer!"), (12, "zzzz")],
        "ck long, cname string",
    )
    got = (
        match_names(refs, cands, "rk", "rname", "ck", "cname")
        .orderBy("rk", "ck")
        .toPandas()
    )
    # ref 1: both 10 (dist 0) vs 11 (dist 1) -> only the min (10)
    sub1 = got[got["rk"] == 1]
    assert sub1["ck"].tolist() == [10]
    assert sub1["dist"].tolist() == [0]
    # ref 2 matches its own minimum (multi-hit keeps all at the min)
    assert len(got[got["rk"] == 2]) >= 1


def test_daily_participants_and_labels(spark):
    sched = spark.createDataFrame(
        [
            ("2017-05-24", "fed", "nad"),
            ("2017-05-24", "djo", "mur"),
            ("2017-05-25", "fed", "djo"),
        ],
        "d string, winner string, loser string",
    )
    parts = daily_participants(sched, "d", ["winner", "loser"])
    got = {r["date"]: set(r["participants"]) for r in parts.collect()}
    assert got == {
        "2017-05-24": {"fed", "nad", "djo", "mur"},
        "2017-05-25": {"fed", "djo"},
    }
    emap = spark.createDataFrame(
        [("fed", 100), ("djo", 200), ("nad", 300)],
        "participant string, entity_id long",
    )
    labels = daily_labels(emap, parts).toPandas()
    day1 = labels[labels["date"] == "2017-05-25"]
    assert set(day1["entity_id"]) == {100, 200}
    graded = daily_labels(emap, parts, include_adjacent_days=True).toPandas()
    g24 = graded[graded["date"] == "2017-05-24"].set_index("entity_id")["label"]
    # fed and djo also play on the 25th -> 2.0; nad only on the 24th -> 1.0
    assert g24[100] == 2.0 and g24[200] == 2.0 and g24[300] == 1.0


def test_assign_interval_labels_range_join(spark):
    labels = spark.createDataFrame(
        [(0, 7, 1.0), (1, 8, 1.0)], "day_index long, entity_id long, label double"
    )
    intervals = spark.range(0, 6).withColumnRenamed("id", "interval_id")
    out = assign_interval_labels(
        labels, intervals, intervals_per_day=3, lookback_intervals=1
    ).toPandas()
    by_entity = {
        e: sorted(out[out["entity_id"] == e]["interval_id"])
        for e in out["entity_id"].unique()
    }
    # day 0 window: [-1, 3) -> 0,1,2 ; day 1 window: [2, 6) -> 2,3,4,5
    assert by_entity == {7: [0, 1, 2], 8: [2, 3, 4, 5]}


def test_prediction_metrics_matches_numpy_ndcg(spark):
    rng = np.random.default_rng(3)
    rows = []
    for snap in range(3):
        for node in range(12):
            rows.append(("m", "p0", snap, node, float(rng.random())))
    scores = spark.createDataFrame(
        rows, "measure string, param_id string, snapshot_id long, node_id long, score double"
    )
    lab_rows = [
        (snap, node, 1.0) for snap in range(3) for node in (2, 5, 7)
    ]
    labels = spark.createDataFrame(
        lab_rows, "snapshot_id long, node_id long, label double"
    )
    got = prediction_metrics(scores, labels, k=5).toPandas()
    sc = {
        (r[2], r[3]): r[4] for r in rows
    }
    for snap in range(3):
        order = sorted(range(12), key=lambda n: (-sc[(snap, n)], n))
        rel = [1.0 if n in (2, 5, 7) else 0.0 for n in order]
        dcg = sum(r / math.log(i + 2) for i, r in enumerate(rel[:5]))
        ideal = sorted(rel, reverse=True)
        idcg = sum(r / math.log(i + 2) for i, r in enumerate(ideal[:5]))
        want = dcg / idcg
        have = float(got[got["snapshot_id"] == snap]["ndcg"].iloc[0])
        assert abs(have - want) < 1e-9, (snap, have, want)
