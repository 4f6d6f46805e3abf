"""Plan-shape checks for the relational-family queries (values are covered
by the parity sweep; here we assert the physical plans are the ones we'd
want at scale)."""

from __future__ import annotations

from elephantdb_spark.relational import q37_window_topk, q39_join_agg_sort_limit

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_nation_dim_join_is_broadcast(spark):
    plan = _plan(q39_join_agg_sort_limit(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_topk_uses_window_not_global_sort(spark):
    plan = _plan(q37_window_topk(spark, SF))
    assert "RunningWindowFunction" in plan or "Window" in plan, plan
