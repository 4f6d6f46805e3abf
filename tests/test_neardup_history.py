"""Persisted MinHash near-dup history (operators/neardup_history):
flag/match/estimate parity with a python replay over Spark-computed
signatures, exact-reingest scoring, no-signature rows, incremental
append + version pinning, and the params-file contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.operators.neardup_history import (
    append_neardup_history,
    build_neardup_history,
    filter_against_neardup_history,
    minhash_signatures,
    read_params,
)
from elephantdb_spark.spec import DomainSpec

_VOCAB = (
    "table row scan join merge batch window filter vector hash "
    "stream column agg sort spark query value part order data"
).split()


def _doc(i: int, n: int = 40) -> str:
    rnd = random.Random(1000 + i)
    return " ".join(rnd.choice(_VOCAB) for _ in range(n))


CORPUS = [(i, _doc(i)) for i in range(30)]
BATCH = [
    (1000, _doc(0)),                            # exact re-ingest of doc 0
    (1001, _doc(1) + " appended tail words"),   # near-dup of doc 1
    (1002, " ".join(f"novel{k} zephyr{k} glorp{k}" for k in range(15))),  # new
    (1003, "one two"),                          # < shingle_len tokens: no sig
]
NUM_PERM, BANDS, SHINGLE_LEN, THRESHOLD = 32, 8, 3, 0.7


@pytest.fixture(scope="module")
def nd_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ndhist") / "minhash")
    corpus = spark.createDataFrame(CORPUS, "doc_id int, text string")
    build_neardup_history(
        spark, corpus, root, "doc_id", "text",
        num_perm=NUM_PERM, bands=BANDS, shingle_len=SHINGLE_LEN,
        spec=DomainSpec(num_shards=4), version=1,
    )
    return root


def _collect_sigs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = minhash_signatures(df, "doc_id", "text", NUM_PERM, SHINGLE_LEN)
    return {
        r["doc"]: [r[f"mh{i}"] for i in range(NUM_PERM)] for r in out.collect()
    }


def _python_replay(hist_sigs, batch_sigs):
    """Independent replay of band index + representative + estimator over
    Spark-computed signatures (Spark is used only as the hash function)."""
    rpb = NUM_PERM // BANDS
    reps: dict[tuple, int] = {}
    for doc, sig in hist_sigs.items():
        for b in range(BANDS):
            k = (b, tuple(sig[b * rpb:(b + 1) * rpb]))
            reps[k] = min(reps.get(k, doc), doc)
    want = {}
    for doc, sig in batch_sigs.items():
        cands = {
            reps[(b, tuple(sig[b * rpb:(b + 1) * rpb]))]
            for b in range(BANDS)
            if (b, tuple(sig[b * rpb:(b + 1) * rpb])) in reps
        }
        scored = [
            (sum(a == b for a, b in zip(sig, hist_sigs[c])) / NUM_PERM, c)
            for c in cands
        ]
        hits = [(e, c) for e, c in scored if e >= THRESHOLD]
        if hits:
            # max est, ties by ascending STRING id (the operator contract)
            est, match = min(hits, key=lambda t: (-t[0], str(t[1])))
            want[doc] = (True, str(match), est)
        else:
            want[doc] = (False, None, None)
    return want


def _probe(spark, root, **kw):
    batch = spark.createDataFrame(BATCH, "doc_id int, text string")
    out = filter_against_neardup_history(
        spark, batch, root, "doc_id", "text",
        threshold=THRESHOLD, cache_sigs=False, **kw,
    )
    return {
        r.doc_id: (r.is_neardup, r.match_id, r.est_jaccard) for r in out.collect()
    }


def test_flags_match_signature_replay(spark, nd_root):
    hist_sigs = _collect_sigs(spark, CORPUS)
    batch_sigs = _collect_sigs(spark, BATCH)
    want = _python_replay(hist_sigs, batch_sigs)
    got = _probe(spark, nd_root)
    assert set(got) == {1000, 1001, 1002, 1003}
    for doc_id in (1000, 1001, 1002):
        assert got[doc_id] == want[doc_id], doc_id
    # the classes actually exercise what they claim
    assert got[1000][0] is True and got[1000][2] == 1.0  # exact: est = 1
    assert got[1001][0] is True and got[1001][2] < 1.0   # near: est < 1
    assert got[1002] == (False, None, None)              # novel


def test_exact_reingest_matches_original(spark, nd_root):
    got = _probe(spark, nd_root)
    assert got[1000][1] == "0"


def test_no_signature_row_is_unflagged(spark, nd_root):
    assert _probe(spark, nd_root)[1003] == (False, None, None)


def test_append_then_refilter_and_version_pin(spark, nd_root):
    batch = spark.createDataFrame(BATCH, "doc_id int, text string")
    accepted = filter_against_neardup_history(
        spark, batch, nd_root, "doc_id", "text",
        threshold=THRESHOLD, cache_sigs=False,
    ).filter(~F.col("is_neardup")).select("doc_id", "text")
    v2 = append_neardup_history(spark, accepted, nd_root, "doc_id", "text")
    assert v2 > 1
    after = _probe(spark, nd_root)
    # the previously-novel doc now matches itself in history
    assert after[1002] == (True, "1002", 1.0)
    # exact/near flags are unchanged by the append
    assert after[1000][0] is True and after[1001][0] is True
    # pinning version 1 replays the pre-append answers
    pinned = _probe(spark, nd_root, version=1)
    assert pinned[1002] == (False, None, None)


def test_params_file_contract(spark, nd_root, tmp_path):
    p = read_params(nd_root)
    assert p == {
        "num_perm": NUM_PERM, "bands": BANDS,
        "shingle_len": SHINGLE_LEN, "hash_fn": "xxhash64",
    }
    with pytest.raises(ValueError, match="not a neardup-history root"):
        filter_against_neardup_history(
            spark,
            spark.createDataFrame(BATCH, "doc_id int, text string"),
            str(tmp_path / "nowhere"), "doc_id", "text",
        )


def test_output_column_clash_raises(spark, nd_root):
    bad = spark.createDataFrame(
        [(1, "a b c d", True)], "doc_id int, text string, is_neardup boolean"
    )
    with pytest.raises(ValueError, match="collide"):
        filter_against_neardup_history(spark, bad, nd_root, "doc_id", "text")


def test_bands_must_divide_num_perm(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS[:3], "doc_id int, text string")
    with pytest.raises(ValueError, match="must divide"):
        build_neardup_history(
            spark, corpus, str(tmp_path / "nd"), "doc_id", "text",
            num_perm=32, bands=7,
        )
