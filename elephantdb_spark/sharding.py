"""Key → shard routing: byte-exact parity with the reference's
``MD5(key)`` signed-big-endian ``BigInteger mod numShards``
(reference: elephantdb-core/src/jvm/elephantdb/Utils.java:57-60,
elephantdb-core/src/jvm/elephantdb/partition/HashModScheme.java:7-9).

Three interchangeable implementations, all verified equal in tests:

* :func:`shard_index` — pure Python (driver-side routing for point reads).
* :func:`md5_mod_col` — a JVM-side Column expression built from Spark's
  built-in ``md5``/``conv``/``pmod`` so the hot build path stays inside
  whole-stage codegen (no Python UDF, no serialization to Python workers —
  this is what makes the shard assignment free at 100 TB).
* :func:`duckdb_md5_mod_sql` — the same function as ANSI-ish SQL for the
  DuckDB correctness oracle.

Java's ``BigInteger(byte[])`` interprets the 16 MD5 bytes as a *signed*
big-endian integer, and ``BigInteger.mod`` is always non-negative. The
Spark expression reproduces that in pure LONG arithmetic with three hex
chunks (48+40+40 bits): ``value = c1·2^80 + c2·2^40 + c3`` composes
chunk-wise under mod, and the sign correction subtracts ``2^128 mod n``
when the digest's top bit is set (see :func:`md5_mod_col` for the
overflow envelope — it is TIGHT at large n, unlike the old decimal
form). The DuckDB oracle twin still uses two 64-bit halves because
DuckDB has native ``hugeint``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

_TWO64 = 1 << 64  # used by the DuckDB oracle twin


def shard_index(key: bytes, num_shards: int) -> int:
    """Shard for ``key`` — byte-exact reference parity (Utils.java:57-60)."""
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    digest = hashlib.md5(bytes(key)).digest()
    # Python's % on a negative int is non-negative for positive n, matching
    # Java BigInteger.mod.
    return int.from_bytes(digest, "big", signed=True) % num_shards


def md5_mod_col(key: Column, num_shards: int) -> Column:
    """JVM-side shard expression over a binary key column.

    Entirely built-in functions in pure LONG arithmetic, so Catalyst
    keeps it in whole-stage codegen with primitive math: the 128-bit
    digest splits into three hex chunks (48+40+40 bits), each of which
    ``conv`` + cast-to-long holds exactly (< 2^48), and
    ``value mod n`` composes chunk-wise. The previous form ran the same
    composition in ``decimal(20,0)`` over two 64-bit halves — measured
    3.2x slower at 6M keys (decimal mod/multiply are object ops;
    long pmod is a codegen primitive). r6 swap, byte-exact parity
    property-tested in tests/test_sharding.py, including an adversarial
    sweep (empty/0x00/0xff/random keys) at n up to 2^31-1
    (test_md5_mod_col_adversarial_large_n).

    Overflow bound: every pmod operand is ≤ (n-1)·(2n-1) < 2^63 for any
    int32 ``num_shards`` (worst case n = 2^31-1 leaves ~1.5e10 of
    headroom below Long.MAX_VALUE — tight; do NOT widen a chunk or add
    a fourth term without redoing this bound).

    Java's ``BigInteger(byte[])`` reads the digest SIGNED big-endian:
    signed = unsigned - 2^128·[top bit set], so the signed mod is the
    unsigned chunk composition minus ``(2^128 mod n)`` when the top bit
    of the first chunk is set, re-wrapped by pmod.
    """
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    n = num_shards
    hexs = F.md5(key)
    c1 = F.conv(F.substring(hexs, 1, 12), 16, 10).cast("long")   # top 48 bits
    c2 = F.conv(F.substring(hexs, 13, 10), 16, 10).cast("long")  # mid 40 bits
    c3 = F.conv(F.substring(hexs, 23, 10), 16, 10).cast("long")  # low 40 bits
    unsigned_mod = F.pmod(
        F.pmod(c1, F.lit(n)) * F.lit((1 << 80) % n)
        + F.pmod(c2, F.lit(n)) * F.lit((1 << 40) % n)
        + F.pmod(c3, F.lit(n)),
        F.lit(n),
    )
    topbit = (c1 >= F.lit(1 << 47)).cast("long")
    return F.pmod(
        unsigned_mod - topbit * F.lit((1 << 128) % n), F.lit(n)
    ).cast("int")


def duckdb_md5_mod_sql(key_expr: str, num_shards: int) -> str:
    """DuckDB SQL computing the identical shard for a VARCHAR/BLOB expr.

    Used by the oracle side of parity tests (SURVEY §2 Part C Q9).
    """
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    n = num_shards
    hi = f"CAST(('0x' || substr(md5({key_expr}),1,16)) AS UBIGINT)"
    lo = f"CAST(('0x' || substr(md5({key_expr}),17,16)) AS UBIGINT)"
    hi_signed = (
        f"(CASE WHEN {hi} >= CAST('9223372036854775808' AS UHUGEINT) "
        f"THEN CAST({hi} AS HUGEINT) - CAST('18446744073709551616' AS HUGEINT) "
        f"ELSE CAST({hi} AS HUGEINT) END)"
    )
    return (
        f"CAST((((({hi_signed} % {n} + {n}) % {n}) * {_TWO64 % n} "
        f"+ (CAST({lo} AS HUGEINT) % {n})) % {n}) AS INTEGER)"
    )


# ---------------------------------------------------------------------------
# Exact shard → Spark-partition placement.
#
# `df.repartition(n, col)` places rows by `pmod(murmur3(col), n)`, which for
# col = shard id is a balls-in-bins assignment: with n shards into n
# partitions ~37% of partitions would be empty and some would carry 2-3
# shards — real skew at scale. We instead compute, once per (session, n), a
# "slot" value x_s per shard s such that Spark's own hash places x_s in
# partition s, giving an exact 1:1 shard→partition mapping (the analogue of
# the reference forcing numReduceTasks == numShards,
# elephantdb-cascading/src/jvm/elephantdb/cascading/ElephantDBTap.java:108).
# ---------------------------------------------------------------------------

_slot_cache: dict[int, dict[int, int]] = {}


_M32 = 0xFFFFFFFF


def spark_murmur3_int(x: int, seed: int = 42) -> int:
    """Spark's ``hash()`` of an IntegerType column — Murmur3_x86_32 of the
    4-byte int, returned as signed int32. Equality with Spark's own
    expression is asserted in tests/test_sharding.py (and was the previous
    implementation's probe); the pure-Python form removes the cold-start
    probe jobs from the first build of a session."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = x & _M32
    k = (k * c1) & _M32
    k = ((k << 15) | (k >> 17)) & _M32
    k = (k * c2) & _M32
    h = seed & _M32
    h ^= k
    h = ((h << 13) | (h >> 19)) & _M32
    h = (h * 5 + 0xE6546B64) & _M32
    # fmix with length = 4 bytes
    h ^= 4
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def exact_partition_slots(num_shards: int) -> dict[int, int]:
    """Map shard → int x with ``pmod(spark_hash(x), num_shards) == shard``,
    where spark_hash is the same Murmur3 expression HashPartitioning uses —
    so `repartition(n, slot)` places shard s in partition s exactly.

    Computed driver-side with :func:`spark_murmur3_int` (no Spark jobs);
    coupon-collector expectation ~n·ln(n) probes of a pure function.
    """
    cached = _slot_cache.get(num_shards)
    if cached is not None:
        return cached
    slots: dict[int, int] = {}
    x = 0
    while len(slots) < num_shards:
        slots.setdefault(spark_murmur3_int(x) % num_shards, x)
        x += 1
    result = {s: slots[s] for s in range(num_shards)}
    _slot_cache[num_shards] = result
    return result


#: above this shard count, the slot map rides a broadcast join instead of
#: an inline create_map literal (2n Column literals = 2n Py4J round trips
#: and a 2n-child expression Catalyst must analyze — fine at 64, minutes of
#: driver time at the 100 TB design point of ~130k shards)
SLOT_MAP_INLINE_MAX = 2048


def slot_col(shard: Column, slots: dict[int, int]) -> Column:
    """Column mapping a shard id to its exact-placement slot value (inline
    literal map — use :func:`with_slot_column` which picks the scalable
    form automatically)."""
    pairs: list[Column] = []
    for s, x in slots.items():
        pairs.append(F.lit(s))
        pairs.append(F.lit(x))
    return F.element_at(F.create_map(*pairs), shard).cast("int")


def with_slot_column(spark: SparkSession, df, num_shards: int, shard_col_name: str = "shard"):
    """Attach ``__slot`` for exact shard→partition placement. Small shard
    counts inline a literal map; large ones broadcast-join a slots table
    (O(1) driver expressions regardless of n)."""
    slots = exact_partition_slots(num_shards)
    if num_shards <= SLOT_MAP_INLINE_MAX:
        return df.withColumn("__slot", slot_col(F.col(shard_col_name), slots))
    slots_df = spark.createDataFrame(
        sorted(slots.items()), f"{shard_col_name} int, __slot int"
    )
    return df.join(F.broadcast(slots_df), shard_col_name)
