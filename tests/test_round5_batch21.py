"""Hand-computed fixtures for the round-5 batch-21 contract queries:
the three previously-unwitnessed physical shapes (LeftSemi EXISTS,
LeftAnti NOT-EXISTS + scalar subquery, ROLLUP/Expand) and the JSON
tool co-occurrence projection. All four are exercised through the
contract callables on parquet fixture dirs, plus plan-shape pins that
the intended physical operator actually appears."""

import datetime

import pytest

import __spark_entry__ as entry

D = datetime.date
TS = datetime.datetime

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate date, o_orderpriority string"
)
LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate date"
)
CUSTOMER_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
    "c_mktsegment string"
)


def _li_row(okey, flag):
    return (okey, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, flag, "O", D(2024, 1, 1))


def test_returned_priority_by_hand(spark, tmp_path):
    """Orders 1 (two returned items) and 2 (one) qualify ONCE each;
    order 3 has only non-returned items, order 4 has no items at all.
    Priorities: 1->'1-URGENT', 2->'2-HIGH', 3/4->'2-HIGH'."""
    orders = spark.createDataFrame(
        [
            (1, 1, "F", 10.0, D(2024, 1, 1), "1-URGENT"),
            (2, 1, "F", 10.0, D(2024, 1, 1), "2-HIGH"),
            (3, 1, "F", 10.0, D(2024, 1, 1), "2-HIGH"),
            (4, 1, "F", 10.0, D(2024, 1, 1), "2-HIGH"),
        ],
        ORDERS_SCHEMA,
    )
    li = spark.createDataFrame(
        [_li_row(1, "R"), _li_row(1, "R"), _li_row(2, "R"), _li_row(3, "N")],
        LINEITEM_SCHEMA,
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["o_orderpriority"]: r["n_orders"]
        for r in entry.q_returned_priority(spark, str(tmp_path)).collect()
    }
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_returned_priority_plan_has_semi_join(spark, tmp_path):
    orders = spark.createDataFrame(
        [(1, 1, "F", 10.0, D(2024, 1, 1), "1-URGENT")], ORDERS_SCHEMA
    )
    li = spark.createDataFrame([_li_row(1, "R")], LINEITEM_SCHEMA)
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    plan = entry.q_returned_priority(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def _dormant_fixture(spark, tmp_path):
    """4 customers, balances 100/200/300/400 (avg 250, cents exact):
    3 and 4 are above average; 4 ordered in 2001 (active), 3's only
    order is 1999 (dormant). 1 and 2 are below average regardless."""
    cust = spark.createDataFrame(
        [
            (1, "a", 0, 100.0, "SEG_A"),
            (2, "b", 0, 200.0, "SEG_A"),
            (3, "c", 0, 300.0, "SEG_B"),
            (4, "d", 0, 400.0, "SEG_B"),
        ],
        CUSTOMER_SCHEMA,
    )
    orders = spark.createDataFrame(
        [
            (1, 3, "F", 10.0, D(1999, 5, 1), "1-URGENT"),
            (2, 4, "F", 10.0, D(2001, 5, 1), "1-URGENT"),
        ],
        ORDERS_SCHEMA,
    )
    cust.write.parquet(str(tmp_path / "customer.parquet"))
    orders.write.parquet(str(tmp_path / "orders.parquet"))


def test_dormant_customers_by_hand(spark, tmp_path):
    _dormant_fixture(spark, tmp_path)
    rows = entry.q_dormant_customers(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["c_mktsegment"], r["n_cust"], r["total_bal"]) == (
        "SEG_B",
        1,
        300.0,
    )


def test_dormant_customers_plan_has_anti_join(spark, tmp_path):
    _dormant_fixture(spark, tmp_path)
    plan = entry.q_dormant_customers(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def _rollup_fixture(spark, tmp_path):
    """One region with two nations (10+20 / 5) and a second region
    with one nation (40): 4 nation rows collapse into 2 region
    subtotals and one 75.0 grand total."""
    region = spark.createDataFrame(
        [(0, "R1"), (1, "R2")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "N1", 0), (1, "N2", 0), (2, "N3", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    cust = spark.createDataFrame(
        [(1, "a", 0, 0.0, "S"), (2, "b", 1, 0.0, "S"), (3, "c", 2, 0.0, "S")],
        CUSTOMER_SCHEMA,
    )
    orders = spark.createDataFrame(
        [
            (1, 1, "F", 10.0, D(2024, 1, 1), "p"),
            (2, 1, "F", 20.0, D(2024, 1, 1), "p"),
            (3, 2, "F", 5.0, D(2024, 1, 1), "p"),
            (4, 3, "F", 40.0, D(2024, 1, 1), "p"),
        ],
        ORDERS_SCHEMA,
    )
    for name, df in [
        ("region", region),
        ("nation", nation),
        ("customer", cust),
        ("orders", orders),
    ]:
        df.write.parquet(str(tmp_path / f"{name}.parquet"))


def test_revenue_rollup_by_hand(spark, tmp_path):
    _rollup_fixture(spark, tmp_path)
    got = {
        (r["region"], r["nation"]): (r["revenue"], r["n_orders"])
        for r in entry.q_revenue_rollup(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("R1", "N1"): (30.0, 2),
        ("R1", "N2"): (5.0, 1),
        ("R2", "N3"): (40.0, 1),
        ("R1", "ALL"): (35.0, 3),
        ("R2", "ALL"): (40.0, 1),
        ("ALL", "ALL"): (75.0, 4),
    }


def test_revenue_rollup_plan_has_expand(spark, tmp_path):
    _rollup_fixture(spark, tmp_path)
    plan = entry.q_revenue_rollup(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan


def test_tool_cooccurrence_by_hand(spark, tmp_path):
    """Tools 1 and 2 co-occur for convs u1..u5 (>= min_shared=5);
    tool 3 appears with them only for u1 (below threshold). Duplicate
    (conv, tool) events count once."""
    rows = []
    eid = 0
    for u in ["u1", "u2", "u3", "u4", "u5"]:
        for k in [1, 2]:
            for _ in range(2):  # duplicates must not inflate 'shared'
                eid += 1
                rows.append(
                    (eid, TS(2024, 1, 1, 0, 0, eid), u, "view", 1.0,
                     '{"k": %d}' % k)
                )
    eid += 1
    rows.append((eid, TS(2024, 1, 1, 1, 0, 0), "u1", "view", 1.0, '{"k": 3}'))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    got = [
        (r["tool_a"], r["tool_b"], r["n_convs"])
        for r in entry.q_tool_cooccurrence(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 2, 5)]


def test_tool_cooccurrence_null_props_dropped(spark, tmp_path):
    """Rows whose props lack the key (or are malformed JSON) extract
    to NULL and must not form a 'null tool' node."""
    ev = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1), "u1", "view", 1.0, '{"other": 1}'),
            (2, TS(2024, 1, 1), "u1", "view", 1.0, "not json"),
            (3, TS(2024, 1, 1), "u1", "view", 1.0, '{"k": 7}'),
        ],
        "event_id long, ts timestamp, user_id string, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    from online_centrality_spark.operators import bipartite_projection
    from pyspark.sql import functions as F

    e = spark.read.parquet(str(tmp_path / "events.parquet")).select(
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("tool"),
        F.col("user_id").alias("conv"),
    )
    assert e.filter(F.col("tool").isNull()).count() == 2
    out = bipartite_projection(
        e.filter(F.col("tool").isNotNull()),
        left_col="tool",
        right_col="conv",
        min_shared=1,
    )
    assert out.count() == 0
