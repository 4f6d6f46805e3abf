"""Plan-shape checks for the relational-family queries (values are covered
by the parity sweep; here we assert the physical plans are the ones we'd
want at scale)."""

from __future__ import annotations

from elephantdb_spark.relational import (
    q37_window_topk,
    q39_join_agg_sort_limit,
    q41_shipping_priority,
    q42_local_supplier_volume,
    q87_product_type_profit,
    q88_top_supplier,
    q89_red_parts_heavy_shippers,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_nation_dim_join_is_broadcast(spark):
    plan = _plan(q39_join_agg_sort_limit(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_topk_uses_window_not_global_sort(spark):
    plan = _plan(q37_window_topk(spark, SF))
    assert "RunningWindowFunction" in plan or "Window" in plan, plan


def test_star_join_dims_broadcast_and_filters_pushed(spark):
    plan = _plan(q42_local_supplier_volume(spark, SF))
    # supplier/nation/region sides must never shuffle
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # the region predicate reaches the scan, not a post-join filter
    assert "EqualTo(r_name,ASIA)" in plan, plan


def test_shipping_priority_pushes_both_date_filters(spark):
    plan = _plan(q41_shipping_priority(spark, SF))
    assert "GreaterThan(l_shipdate" in plan, plan
    assert "LessThan(o_orderdate" in plan, plan
    # top-10 must be a TakeOrderedAndProject, not a global sort + collect
    assert "TakeOrderedAndProject" in plan, plan


def test_profit_star_join_dims_broadcast_and_name_filter_pushed(spark):
    plan = _plan(q87_product_type_profit(spark, SF))
    # part (filtered), supplier, nation ride broadcast; only the
    # lineitem⋈orders fact join may shuffle
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "StringContains(p_name,widget)" in plan, plan


def test_top_supplier_aggregates_exact_cents(spark):
    df = q88_top_supplier(spark, SF)
    plan = _plan(df)
    # the argmax compare joins a 1-row aggregate: must broadcast, and both
    # shipdate bounds must reach the lineitem scan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_shipdate" in plan, plan
    rows = df.collect()
    assert len(rows) >= 1
    # winner(s) share the identical exact-cents revenue
    assert len({r["total_revenue"] for r in rows}) == 1


def test_heavy_shippers_semi_join_and_pushdown(spark):
    plan = _plan(q89_red_parts_heavy_shippers(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "StringStartsWith(p_name,red)" in plan, plan
