"""Pluggable-component registry tests: the reference's load-class-by-name
surface (DomainSpec.java:46-62, Utils.java:31-37) — custom sharding scheme,
alternate persistence format (ORC), dotted-name indexer resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elephantdb_spark import DomainSpec, Engine, build_domain
from elephantdb_spark.registry import (
    HashModScheme,
    class_for_name,
    register_scheme,
    resolve_format,
    resolve_indexer,
    resolve_scheme,
)


class FirstByteScheme:
    """Toy scheme: shard = first byte of key mod n (empty key → 0)."""

    def shard_index(self, key: bytes, num_shards: int) -> int:
        return (key[0] if key else 0) % num_shards

    def shard_col(self, key, num_shards: int):
        first = F.coalesce(
            F.conv(F.hex(F.substring(key, 1, 1)), 16, 10).cast("int"), F.lit(0)
        )
        return F.pmod(first, F.lit(num_shards)).cast("int")


def upper_value_indexer(df):
    return df.withColumn("value", F.upper(F.col("value").cast("string")).cast("binary"))


def _kv(spark, pairs):
    return spark.createDataFrame([(k, v) for k, v in pairs], "key binary, value binary")


PAIRS = [(f"k{i}".encode(), f"v{i}".encode()) for i in range(50)]


def test_resolve_defaults():
    assert isinstance(resolve_scheme("md5-mod"), HashModScheme)
    assert resolve_format("parquet") == "parquet"
    assert resolve_format("orc") == "orc"
    with pytest.raises(ValueError):
        resolve_format("json")  # text formats can't round-trip binary keys
    with pytest.raises(ValueError):
        resolve_scheme("no.such.module.Scheme")


def test_class_for_name_stdlib():
    import collections

    assert class_for_name("collections.OrderedDict") is collections.OrderedDict
    with pytest.raises(ValueError):
        class_for_name("OrderedDict")  # not dotted


def test_custom_scheme_by_registration_and_dotted_name(spark, tmp_path):
    register_scheme("first-byte", FirstByteScheme)
    for scheme_name, root in [
        ("first-byte", str(tmp_path / "d1")),
        (f"{__name__}.FirstByteScheme", str(tmp_path / "d2")),
    ]:
        spec = DomainSpec(num_shards=4, shard_scheme=scheme_name)
        build_domain(spark, _kv(spark, PAIRS), root, spec, version=1)
        eng = Engine(spark, str(tmp_path))
        dom = eng.domain(root.rsplit("/", 1)[-1])
        # driver-side routing and JVM-side placement must agree
        ref = FirstByteScheme()
        placed = dom.scan().select("key", "shard").collect()
        for r in placed:
            assert r["shard"] == ref.shard_index(bytes(r["key"]), 4)
        # point reads route through the custom scheme
        assert dom.get(b"k7") == b"v7"
        assert dom.multi_get([b"k1", b"k2", b"zz"])[b"zz"] is None


def test_orc_persistence_format(spark, tmp_path):
    root = str(tmp_path / "orc_dom")
    spec = DomainSpec(num_shards=4, persistence_format="orc")
    build_domain(spark, _kv(spark, PAIRS), root, spec, version=1)
    import glob

    files = glob.glob(f"{root}/1/shard=*/*.orc")
    assert len(files) == 4  # one ORC file per shard
    from elephantdb_spark.engine import Domain

    dom = Domain(spark, root)
    assert dom.count() == len(PAIRS)
    assert dom.get(b"k13") == b"v13"
    got = dom.multi_get([p[0] for p in PAIRS[:40]])
    assert all(got[k] == v for k, v in PAIRS[:40])


def test_indexer_by_dotted_name(spark, tmp_path):
    root = str(tmp_path / "idx_dom")
    build_domain(
        spark, _kv(spark, PAIRS), root, DomainSpec(num_shards=2), version=1,
        indexer=f"{__name__}.upper_value_indexer",
    )
    from elephantdb_spark.engine import Domain

    assert Domain(spark, root).get(b"k3") == b"V3"
    with pytest.raises(TypeError):
        resolve_indexer("collections.abc")  # resolvable but not callable


def test_query_rotation_orders_by_verification_age(tmp_path):
    """queries() must present never/least-recently-verified entries first
    so the driver's bounded per-round window covers the stalest rows."""
    import importlib
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    entry = importlib.import_module("__spark_entry__")

    oracles = {"a": "SELECT 1", "b": "SELECT 1", "c": "SELECT 1"}
    rows_r1 = {
        "a": {"rows_match": True, "schema_match": True, "hash_match": True},
        "b": {"rows_match": True, "schema_match": True, "hash_match": True},
    }
    rows_r2 = {
        # a re-verified in r2; b hash-FAILED in r2; d rows-only no oracle
        "a": {"hash_match": True},
        "b": {"hash_match": False},
        "d": {"hash_match": None, "err": "no_oracle"},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows_r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(rows_r2))
    last = entry._last_verified_round(oracles, here=str(tmp_path))
    # a: green r2. b: green r1 only (r2 red). c: never. d: rows-only and
    # STILL no oracle -> counts as verified r2
    assert last == {"a": 2, "b": 1, "d": 2}
    # with an oracle added for d, its rows-only history stops counting
    assert "d" not in entry._last_verified_round(
        {**oracles, "d": "SELECT 1"}, here=str(tmp_path)
    )


def test_ts_any_to_nanos_both_representations(spark):
    from pyspark.sql import functions as F

    from elephantdb_spark.analytics import ts_any_to_nanos

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # long passthrough
    df_long = spark.createDataFrame([(1_700_000_000_123_456_789,)], "ts long")
    assert df_long.select(
        ts_any_to_nanos(df_long, "ts").alias("n")
    ).first().n == 1_700_000_000_123_456_789
    # TIMESTAMP_NTZ: wall time treated as UTC -> epoch nanos
    df_ts = spark.sql(
        "SELECT TIMESTAMP_NTZ '2023-11-14 22:13:20.123456' AS ts"
    )
    got = df_ts.select(ts_any_to_nanos(df_ts, "ts").alias("n")).first().n
    assert got == 1_700_000_000_123_456_000  # micros precision * 1000
