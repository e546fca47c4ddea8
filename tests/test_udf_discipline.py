"""UDF discipline: no row-at-a-time Python eval in any query plan.

BASELINE.md's acceptance criterion: every Python kernel in the engine is
Arrow-vectorized (``MapInPandas`` / ``FlatMapGroupsInPandas`` /
``ArrowEvalPython``); a per-row Python UDF would surface as a
``BatchEvalPython`` node.  This test greps the physical plan of every
driver-contract query and fails if someone adds one.
"""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_no_batch_eval_python(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the physical plan"
    )
