"""Plan-inspection utilities verified against known plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from elephantdb_spark.plans import (
    broadcast_join_count,
    count_exchanges,
    pushed_filters,
    scan_locations,
    sortmerge_join_count,
    whole_stage_codegen_spans,
)

SF = "/root/testdata/sf0.001"


def test_exchange_counting(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    no_shuffle = li.select("l_orderkey").filter(F.col("l_orderkey") > 0)
    assert count_exchanges(no_shuffle) == 0
    one_shuffle = li.groupBy("l_returnflag").count()
    assert count_exchanges(one_shuffle) >= 1
    # codegen annotations exist only once the adaptive plan has executed
    assert whole_stage_codegen_spans(one_shuffle) == 0
    one_shuffle.collect()
    assert whole_stage_codegen_spans(one_shuffle) >= 1


def test_broadcast_vs_sortmerge_detection(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    bcast = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    assert broadcast_join_count(bcast) == 1
    assert sortmerge_join_count(bcast) == 0
    hint_merge = cust.hint("merge").join(
        orders.hint("merge"), cust.c_custkey == orders.o_custkey
    )
    assert sortmerge_join_count(hint_merge) == 1


def test_pushed_filters_and_locations(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    q = cust.filter(F.col("c_custkey") == 42).select("c_name")
    pushed = pushed_filters(q)
    assert any("EqualTo(c_custkey,42)" in p for p in pushed), pushed
    locs = scan_locations(q)
    assert locs and "customer.parquet" in locs[0]
