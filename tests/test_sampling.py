"""Deterministic sampling / packing operators (operators/sampling.py):
hash-determinism (retry/rerun stability), statistical sanity, stratified
exactness, and packing invariants."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.operators.sampling import (
    deterministic_sample,
    pack_sequences,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "es"][i % 3], (i * 37) % 90 + 10) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long").cache()


def _py_md5_u32(v, salt=""):
    return int(hashlib.md5(f"{v}{salt}".encode()).hexdigest()[:8], 16)


def test_deterministic_sample_matches_python_hash(spark, corpus):
    rate = 0.3
    got = {r.doc_id for r in deterministic_sample(corpus, "doc_id", rate, "s1").collect()}
    want = {i for i in range(600) if _py_md5_u32(i, "s1") < int(rate * 2**32)}
    assert got == want
    # reruns are identical (no RNG state)
    again = {r.doc_id for r in deterministic_sample(corpus, "doc_id", rate, "s1").collect()}
    assert again == got
    # rate is honored within binomial noise
    assert 0.2 * 600 < len(got) < 0.4 * 600
    # different salts give (near-)independent draws
    other = {r.doc_id for r in deterministic_sample(corpus, "doc_id", rate, "s2").collect()}
    assert other != got


def test_deterministic_sample_edge_rates(spark, corpus):
    assert deterministic_sample(corpus, "doc_id", 0.0).count() == 0
    assert deterministic_sample(corpus, "doc_id", 1.0).count() == 600
    with pytest.raises(ValueError):
        deterministic_sample(corpus, "doc_id", 1.5)


def test_stratified_sample_exact_n_per_group(spark, corpus):
    out = stratified_sample(corpus, ["lang"], "doc_id", 25)
    per = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert per == {"en": 25, "de": 25, "es": 25}
    # small groups return whole group, not an error
    small = corpus.filter(F.col("doc_id") < 4)  # en:2, de:1, es:1
    out2 = stratified_sample(small, ["lang"], "doc_id", 25)
    assert out2.count() == 4
    # deterministic: same selection on rerun
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in stratified_sample(corpus, ["lang"], "doc_id", 25).collect())
    assert a == b


def test_pack_sequences_invariants(spark, corpus):
    cap = 256
    packed = pack_sequences(corpus, ["lang"], "doc_id", "n_tokens", cap).collect()
    by_group: dict[str, list] = {}
    for r in packed:
        by_group.setdefault(r.lang, []).append(r)
    for lang, rows in by_group.items():
        rows.sort(key=lambda r: r.doc_id)
        # replay the greedy walk in python
        before = 0
        for r in rows:
            assert r.bin == before // cap, (lang, r)
            assert r.bin_offset == before % cap, (lang, r)
            before += r.n_tokens
        # bins are contiguous 0..max
        bins = sorted({r.bin for r in rows})
        assert bins == list(range(len(bins)))
        # every bin except possibly the last starts before capacity
        # boundary: offsets are always < capacity
        assert all(0 <= r.bin_offset < cap for r in rows)


def test_pack_sequences_validates_capacity(spark, corpus):
    with pytest.raises(ValueError):
        pack_sequences(corpus, ["lang"], "doc_id", "n_tokens", 0)


def test_shuffle_assignments_is_deterministic_permutation(spark, corpus):
    from elephantdb_spark.operators.sampling import shuffle_assignments

    out = shuffle_assignments(corpus, "doc_id", 8, "ep0")
    rows = out.select("doc_id", "file_id", "pos").collect()
    # every row kept exactly once
    assert sorted(r.doc_id for r in rows) == list(range(600))
    # python replay: file = md5 % 8, pos = rank of (hash, id) within file
    by_file = {}
    for i in range(600):
        h = _py_md5_u32(i, "ep0")
        by_file.setdefault(h % 8, []).append((h, i))
    want = {}
    for f, members in by_file.items():
        for pos, (_, i) in enumerate(sorted(members), start=1):
            want[i] = (f, pos)
    got = {r.doc_id: (r.file_id, r.pos) for r in rows}
    assert got == want
    # balanced within binomial noise (600/8 = 75 expected)
    sizes = [len(m) for m in by_file.values()]
    assert max(sizes) < 2 * min(sizes)
    # rerun identical; different salt produces a different permutation
    again = {r.doc_id: (r.file_id, r.pos)
             for r in shuffle_assignments(corpus, "doc_id", 8, "ep0").collect()}
    assert again == got
    other = {r.doc_id: (r.file_id, r.pos)
             for r in shuffle_assignments(corpus, "doc_id", 8, "ep1").collect()}
    assert other != got
    with pytest.raises(ValueError):
        shuffle_assignments(corpus, "doc_id", 0)


def test_write_shuffled_export_order_on_disk(spark, corpus, tmp_path):
    import os

    from elephantdb_spark.operators.sampling import (
        shuffle_assignments,
        write_shuffled_export,
    )

    out_dir = str(tmp_path / "export")
    write_shuffled_export(spark, corpus, out_dir, "doc_id", 4, "ep0")
    # one directory per file, each holding exactly one part file
    dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("file="))
    assert dirs == [f"file={i}" for i in range(4)]
    for d in dirs:
        parts = [f for f in os.listdir(os.path.join(out_dir, d))
                 if f.endswith(".parquet")]
        assert len(parts) == 1, f"{d}: expected one part file, got {parts}"
    # on-disk row order within each file == the manifest's pos order
    manifest = shuffle_assignments(corpus, "doc_id", 4, "ep0")
    for i in range(4):
        disk = [r.doc_id for r in
                spark.read.parquet(os.path.join(out_dir, f"file={i}")).collect()]
        want = [r.doc_id for r in manifest.filter(F.col("file_id") == i)
                .orderBy("pos").collect()]
        assert disk == want
