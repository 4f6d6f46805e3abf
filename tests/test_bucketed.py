"""Bucketed-domain tests: the co-located-join scale path. The load-bearing
assertion is on the *physical plan*: a join of two equally-bucketed domains
must have no Exchange (shuffle) on either side, and a point lookup must
scan only the pruned bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.bucketed import (
    bucketed_multi_get,
    build_bucketed_domain,
    join_bucketed_domains,
)

PAIRS_A = [(f"k{i}".encode(), f"a{i}".encode()) for i in range(200)]
PAIRS_B = [(f"k{i}".encode(), f"b{i}".encode()) for i in range(100, 300)]


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    for name, pairs in [("bdom_a", PAIRS_A), ("bdom_b", PAIRS_B)]:
        df = spark.createDataFrame(pairs, "key binary, value binary")
        build_bucketed_domain(
            spark, df, name, num_buckets=4, path=str(base / name), overwrite=True
        )
    yield "bdom_a", "bdom_b"
    for name in ("bdom_a", "bdom_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_is_shuffle_free(spark, bucketed_tables):
    a, b = bucketed_tables
    # at toy scale the planner correctly prefers broadcast; disable it to
    # observe the plan that matters at 100 TB (both sides too big to ship)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = join_bucketed_domains(spark, a, b)
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        rows = {bytes(r["key"]): (bytes(r["value"]), bytes(r["value_right"]))
                for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert len(rows) == 100  # overlap k100..k199
    assert rows[b"k150"] == (b"a150", b"b150")


def test_join_correct_vs_plain_join(spark, bucketed_tables):
    a, b = bucketed_tables
    expect = (
        spark.createDataFrame(PAIRS_A, "key binary, va binary")
        .join(spark.createDataFrame(PAIRS_B, "key binary, vb binary"), "key")
        .count()
    )
    assert join_bucketed_domains(spark, a, b).count() == expect


def test_point_lookup_bucket_pruning(spark, bucketed_tables):
    a, _ = bucketed_tables
    df = bucketed_multi_get(spark, a, [b"k42"])
    plan = _plan(df)
    # bucket pruning shows "SelectedBucketsCount: 1 out of 4"
    assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    assert [bytes(r["value"]) for r in df.collect()] == [b"a42"]


def test_multi_get_many_keys(spark, bucketed_tables):
    a, _ = bucketed_tables
    keys = [f"k{i}".encode() for i in range(0, 200, 3)] + [b"missing"]
    got = {bytes(r["key"]): bytes(r["value"])
           for r in bucketed_multi_get(spark, a, keys).collect()}
    assert len(got) == len(keys) - 1  # miss absent (inner filter semantics)
    assert got[b"k3"] == b"a3"
