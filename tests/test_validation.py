"""Fixtures for the data-quality validation layer (validation.py):
table profiling semantics by hand, the HLL profile path, and
constraint-check counting rules."""

import datetime

import pytest

from online_centrality_spark.validation import integrity_checks, table_profile

TS = datetime.datetime


def test_table_profile_by_hand(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 2.0, TS(2024, 1, 1, 0, 0, 0)),
            (2, "b", 1.5, TS(2024, 1, 2, 0, 0, 0)),
            (2, None, None, None),
        ],
        "id long, s string, x double, t timestamp",
    )
    prof = {r["column"]: r for r in table_profile(df).collect()}
    assert set(prof) == {"id", "s", "x", "t"}
    r = prof["id"]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (3, 0, 2)
    assert (r["min_num"], r["max_num"]) == (1.0, 2.0)
    assert r["min_str"] is None and r["max_str"] is None
    r = prof["s"]
    assert (r["n_nulls"], r["n_distinct"]) == (1, 2)
    assert (r["min_str"], r["max_str"]) == ("a", "b")
    assert r["min_num"] is None
    r = prof["x"]
    assert (r["n_nulls"], r["min_num"], r["max_num"]) == (1, 1.5, 2.0)
    r = prof["t"]
    assert r["n_nulls"] == 1
    # epoch micros of 2024-01-01T00:00:00Z
    assert r["min_num"] == 1704067200.0 * 1e6


def test_table_profile_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    assert table_profile(df, ["s"]).count() == 1
    with pytest.raises(ValueError, match="unknown columns"):
        table_profile(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        table_profile(df, [])


def test_table_profile_approx_path(spark):
    """exact=False swaps HLL cardinalities in; on a tiny frame the HLL
    estimate is exact, and the plan must NOT contain the Expand the
    exact multi-distinct pass needs."""
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(20)], "id long, s string"
    )
    prof = table_profile(df, exact=False)
    got = {r["column"]: r["n_distinct"] for r in prof.collect()}
    assert got == {"id": 20, "s": 3}
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_integrity_checks_by_hand(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k long, v string"
    )
    out = {
        r["check"]: (r["n_rows"], r["n_violations"])
        for r in integrity_checks(
            foreign_keys=[("child.fk", child, "fk", parent, "pk")],
            unique_keys=[("dup.k", dup, ["k"])],
        ).collect()
    }
    # NULL fk rows are excluded from the check entirely
    assert out == {"fk:child.fk": (3, 1), "unique:dup.k": (3, 1)}


def test_integrity_checks_requires_a_check(spark):
    with pytest.raises(ValueError, match="no checks"):
        integrity_checks()


def test_data_quality_report_job(spark, tmp_path):
    from jobs.data_quality_report import run_report

    out = str(tmp_path / "dq")
    metrics = run_report(spark, "/root/testdata/sf0.001", out)
    assert set(metrics) == {"profiles", "integrity", "readability", "gopher"}
    assert all(m["rows"] >= 1 for m in metrics.values()), metrics
    prof = spark.read.parquet(f"{out}/metric=profiles")
    assert {"table", "column", "n_rows", "n_nulls", "n_distinct"} <= set(
        prof.columns
    )
    # every declared table profiled
    assert prof.select("table").distinct().count() == 9
    integ = spark.read.parquet(f"{out}/metric=integrity")
    rows = {r["check"]: r["n_violations"] for r in integ.collect()}
    assert len(rows) == 10 and all(v == 0 for v in rows.values())
    # resume skips every committed family
    m2 = run_report(spark, "/root/testdata/sf0.001", out, resume=True)
    assert all(m.get("resumed") for m in m2.values()), m2
