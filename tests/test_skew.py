"""Salted-join equivalence tests on constructed power-law data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.functions.skew import hot_keys, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one celebrity key with 5000 rows, 100 normal keys with 10 each
    hot = spark.range(5000).select(F.lit("HOT").alias("k"), F.col("id").alias("payload"))
    cold = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 100)).alias("k"),
        F.col("id").alias("payload"),
    )
    return hot.unionByName(cold).cache()


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("HOT", "celebrity")] + [(f"k{i}", f"dim{i}") for i in range(150)]
    return spark.createDataFrame(rows, "k string, label string").cache()


def test_hot_keys_detects_celebrity(spark, skewed):
    assert hot_keys(skewed, "k", 1000) == ["HOT"]
    assert len(hot_keys(skewed, "k", 5)) == 101


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, skewed, dim, how):
    plain = skewed.join(dim, "k", how)
    salted = salted_join(skewed, dim, "k", num_salts=8, how=how)
    assert salted.count() == plain.count()
    # spot-check full equality on the sorted payloads of the hot key
    a = sorted(r["payload"] for r in plain.filter("k = 'HOT'").collect())
    b = sorted(r["payload"] for r in salted.filter("k = 'HOT'").collect())
    assert a == b
    # unmatched left keys survive a left join (k100.. have no dim row)
    if how == "left":
        miss_plain = plain.filter("label IS NULL").count()
        miss_salted = salted.filter("label IS NULL").count()
        assert miss_plain == miss_salted


def test_salted_join_spreads_hot_key(spark, skewed, dim):
    salted_left = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8)).cast("int"),
    )
    n_salts = salted_left.filter("k = 'HOT'").select("__salt").distinct().count()
    assert n_salts == 8  # the hot key really fans out over all salt values


def test_salted_join_rejects_unsupported_how(spark, skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="full")
