"""Sharding parity: Python, Spark-JVM, and DuckDB implementations must agree
byte-exactly with the reference semantics (MD5 → signed big-endian BigInteger
→ mod n; Utils.java:57-60). Includes the high-bit edge (keys whose MD5 first
byte ≥ 0x80) called out in FIXTURES.md F1."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elephantdb_spark.sharding import (
    duckdb_md5_mod_sql,
    exact_partition_slots,
    md5_mod_col,
    shard_index,
    slot_col,
)

EDGE_KEYS = [
    b"",
    b"0",
    b"42",
    b"key",
    b"hey",
    bytes([0]),
    bytes([255]),
    bytes(range(256)),
    b"a" * 300,
    "émoji🎉".encode(),
]
# keys whose md5 has the high bit set (negative BigInteger)
HIGH_BIT_KEYS = [k for k in (str(i).encode() for i in range(500))
                 if hashlib.md5(k).digest()[0] >= 0x80]


def ref_shard(key: bytes, n: int) -> int:
    return int.from_bytes(hashlib.md5(key).digest(), "big", signed=True) % n


@pytest.mark.parametrize("n", [1, 2, 3, 4, 7, 8, 64, 1000])
def test_python_matches_reference_semantics(n):
    for k in EDGE_KEYS + HIGH_BIT_KEYS[:20]:
        assert shard_index(k, n) == ref_shard(k, n)


def test_high_bit_keys_exist():
    assert len(HIGH_BIT_KEYS) > 100  # the edge case is actually exercised


@given(st.binary(min_size=0, max_size=64), st.integers(min_value=1, max_value=4096))
@settings(max_examples=300, deadline=None)
def test_python_property(key, n):
    assert shard_index(key, n) == ref_shard(key, n)


@pytest.mark.parametrize("n", [1, 2, 4, 8, 64, 257])
def test_spark_jvm_expression_matches(spark, n):
    keys = EDGE_KEYS + HIGH_BIT_KEYS[:30] + [str(i).encode() for i in range(100)]
    df = spark.createDataFrame([(k,) for k in keys], "key binary")
    rows = df.select("key", md5_mod_col(F.col("key"), n).alias("shard")).collect()
    assert len(rows) == len(keys)
    for r in rows:
        assert r.shard == shard_index(bytes(r.key), n), (bytes(r.key), n)


@pytest.mark.parametrize("n", [7, 32, 1000, 131071, 2**31 - 1])
def test_md5_mod_col_adversarial_large_n(spark, n):
    """Overflow-critical regime for the r6 3-chunk long arithmetic.

    Each pmod operand is bounded by (n-1)(2n-1); at n = 2^31-1 that sits
    only ~1.5e10 below Long.MAX_VALUE, so large-n parity is the test
    that would catch a silent 64-bit wrap (the old decimal form had
    ~10^20 of slack and could never exercise this)."""
    import random

    rnd = random.Random(0xED6)
    keys = (
        EDGE_KEYS
        + HIGH_BIT_KEYS[:30]
        + [bytes([0]) * 16, bytes([255]) * 16]
        + [rnd.randbytes(rnd.randint(1, 48)) for _ in range(60)]
    )
    df = spark.createDataFrame([(k,) for k in keys], "key binary")
    rows = df.select("key", md5_mod_col(F.col("key"), n).alias("shard")).collect()
    assert len(rows) == len(keys)
    for r in rows:
        assert r.shard == shard_index(bytes(r.key), n), (bytes(r.key).hex(), n)


@pytest.mark.parametrize("n", [1, 2, 4, 8, 64, 257])
def test_duckdb_oracle_expression_matches(n):
    con = duckdb.connect()
    keys = [str(i) for i in range(300)] + ["", "key", "hey", "abc" * 50]
    expr = duckdb_md5_mod_sql("k", n)
    rows = con.execute(
        f"SELECT k, {expr} AS shard FROM (SELECT unnest(?) AS k)", [keys]
    ).fetchall()
    for k, s in rows:
        assert s == shard_index(k.encode(), n), (k, n)


def test_exact_partition_slots_bijective(spark):
    for n in (1, 4, 16, 64):
        slots = exact_partition_slots(n)
        assert set(slots.keys()) == set(range(n))
        # verify against Spark's own hash partitioning: repartition by the
        # slot column must place each shard alone in its partition
        df = spark.createDataFrame([(s,) for s in range(n)], "shard int")
        placed = (
            df.withColumn("slot", slot_col(F.col("shard"), slots))
            .repartition(n, F.col("slot"))
            .withColumn("pid", F.spark_partition_id())
            .collect()
        )
        pid_by_shard = {r.shard: r.pid for r in placed}
        assert len(set(pid_by_shard.values())) == n  # no collisions → no skew


def test_invalid_shard_count():
    with pytest.raises(ValueError):
        shard_index(b"x", 0)
    with pytest.raises(ValueError):
        shard_index(b"x", -3)


def test_spark_murmur3_int_matches_spark_hash(spark):
    """The pure-Python Murmur3 used for slot computation must equal Spark's
    own hash() expression (the one HashPartitioning evaluates) — positive,
    negative, and boundary ints."""
    from pyspark.sql import functions as F

    from elephantdb_spark.sharding import spark_murmur3_int

    probes = list(range(0, 300)) + list(range(-300, 0)) + [2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(x,) for x in probes], "x int")
    rows = df.select("x", F.hash(F.col("x")).alias("h")).collect()
    for r in rows:
        assert spark_murmur3_int(r.x) == r.h, r.x


def test_exact_partition_slots_place_exactly(spark):
    """Slots must actually land each shard in its own partition through a
    real repartition (the property the build path relies on)."""
    from pyspark.sql import functions as F

    from elephantdb_spark.sharding import exact_partition_slots, slot_col

    n = 8
    slots = exact_partition_slots(n)
    df = spark.createDataFrame([(s,) for s in range(n)], "shard int")
    placed = (
        df.withColumn("__slot", slot_col(F.col("shard"), slots))
        .repartition(n, F.col("__slot"))
        .withColumn("pid", F.spark_partition_id())
        .collect()
    )
    assert {r.shard: r.pid for r in placed} == {s: s for s in range(n)}
