"""Ingestion surface: encoders, file readers, domain round-trip."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from elephantdb_spark import DomainSpec, Engine, build_domain
from elephantdb_spark.sources import (
    decode_json_value,
    decode_utf8,
    kv_from_columns,
    kv_from_csv,
    kv_from_json,
    kv_from_parquet,
    read_domain,
)

SF = "/root/testdata/sf0.001"


def test_single_column_encoding_matches_parity_convention(spark):
    df = spark.createDataFrame([(42, "Alice")], "id bigint, name string")
    kv = kv_from_columns(df, "id", "name").first()
    assert bytes(kv.key) == b"42"
    assert bytes(kv.value) == b"Alice"


def test_composite_key_and_json_value(spark):
    df = spark.createDataFrame(
        [(7, 3, "x", 1.5)], "a bigint, b int, s string, p double"
    )
    kv = kv_from_columns(df, ["a", "b"], ["s", "p"]).first()
    assert bytes(kv.key) == b"7-3"
    assert json.loads(bytes(kv.value)) == {"s": "x", "p": 1.5}


def test_binary_value_passthrough(spark):
    payload = bytes(range(256))
    df = spark.createDataFrame([(1, payload)], "id bigint, blob binary")
    kv = kv_from_columns(df, "id", "blob").first()
    assert bytes(kv.value) == payload


def test_decoders_invert_encoders(spark):
    df = spark.createDataFrame(
        [(1, "n", 2.5)], "id bigint, name string, price double"
    )
    kv = kv_from_columns(df, "id", ["name", "price"])
    back = kv.select(
        decode_utf8("key").alias("id"),
        decode_json_value("value", "name string, price double").alias("v"),
    ).first()
    assert back.id == "1" and back.v.name == "n" and back.v.price == 2.5


def test_csv_json_parquet_sources_agree(spark, tmp_path):
    rows = [(1, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "id bigint, name string")
    csv_path, json_path, pq_path = (
        str(tmp_path / d) for d in ("c.csv", "j.json", "p.parquet")
    )
    df.write.csv(csv_path, header=True)
    df.write.json(json_path)
    df.write.parquet(pq_path)

    out = {}
    out["csv"] = kv_from_csv(spark, csv_path, "id bigint, name string", "id", "name")
    out["json"] = kv_from_json(spark, json_path, "id bigint, name string", "id", "name")
    out["parquet"] = kv_from_parquet(spark, pq_path, "id", "name")
    collected = {
        fmt: {bytes(r.key): bytes(r.value) for r in d.collect()}
        for fmt, d in out.items()
    }
    assert collected["csv"] == collected["json"] == collected["parquet"]
    assert collected["csv"] == {b"1": b"a", b"2": b"b", b"3": b"c"}


def test_source_to_domain_round_trip(spark, tmp_path):
    """parquet source → kv projection → built domain → read_domain scan
    equals the source; the key/value projection reaches the parquet scan
    (column pruning)."""
    src = kv_from_parquet(
        spark, os.path.join(SF, "customer.parquet"), "c_custkey", "c_name"
    )
    plan = src._jdf.queryExecution().executedPlan().toString()
    assert "c_custkey" in plan and "c_acctbal" not in plan  # pruned scan

    root = str(tmp_path / "cust_dom")
    build_domain(spark, src, root, DomainSpec(num_shards=4), version=1)
    served = read_domain(spark, root)
    got = {bytes(r.key): bytes(r.value) for r in served.collect()}
    want = {bytes(r.key): bytes(r.value) for r in src.collect()}
    assert got == want

    eng = Engine(spark, str(tmp_path))
    assert eng.domain("cust_dom").get(b"42") == want[b"42"]
