"""Distributed BPE: trainer equivalence to a pure-python reference,
encoder parity, determinism, and the plan contracts (one corpus-sized
pass; encoding zero-shuffle)."""

from __future__ import annotations

import io
from collections import Counter
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.operators.bpe import (
    EOW,
    apply_bpe,
    bpe_encode_word,
    initial_pair_counts,
    train_bpe,
    word_counts,
)

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest"),
]


def _py_train(wc: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Reference Sennrich-style trainer: argmax pair by (count, then
    lexicographically smallest (a, b)) — mirrors the Spark tiebreak."""
    syms = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for w in syms:
            s = syms[w]
            res, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_trainer_matches_python_reference(spark, docs):
    wc = {r["w"]: r["c"] for r in word_counts(docs, "text").collect()}
    expected = _py_train(wc, 12)
    got = train_bpe(docs, "text", 12)
    assert got == expected
    # the classic corpus learns 'est</w>' pieces
    joined = ["".join(p) for p in got]
    assert any("est" in j for j in joined)


def test_trainer_deterministic_across_partitionings(spark, docs):
    a = train_bpe(docs, "text", 6)
    b = train_bpe(docs.repartition(7), "text", 6)
    assert a == b


def test_driver_fast_path_equals_distributed_loop(spark, docs):
    """VERDICT r5 item 1: the collected in-memory merge loop (default,
    vocab fits the driver) and the per-merge Spark loop
    (driver_vocab_max=None) must learn the IDENTICAL ordered merge list
    — same argmax tie-break, same min_pair_count stop."""
    fast = train_bpe(docs, "text", 10)
    dist = train_bpe(docs, "text", 10, driver_vocab_max=None)
    assert fast == dist and len(fast) > 0
    # a vocab cap BELOW the vocab size must also route distributed
    assert train_bpe(docs, "text", 10, driver_vocab_max=2) == fast


def test_driver_fast_path_equals_distributed_loop_non_bmp(spark):
    """ADVICE r6: the driver path symbolizes with Python list(w) (code
    points) and the distributed path with Java split(w, '') — on this
    runtime (Java 17) both yield CODE POINTS (the regex engine advances
    past empty matches by code point, keeping surrogate pairs whole), so
    the 'identical merge list' invariant must hold for astral-plane text
    (emoji-laden web corpora) too, on both routes."""
    rows = [
        (1, "\U0001F600\U0001F600x \U0001F600x \U0001F600\U0001F600x y\U0001F680y"),
        (2, "\U0001F600x y\U0001F680y y\U0001F680y plain words plain"),
        (3, "\U0001F600\U0001F600x snow☃man snow☃man"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = train_bpe(docs, "text", 8)
    dist = train_bpe(docs, "text", 8, driver_vocab_max=None)
    assert fast == dist and len(fast) > 0
    # symbols are whole code points on both routes — no lone surrogates
    for a, b in fast:
        for sym in (a, b):
            assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in sym), fast
    # at least one learned merge touches an astral-plane symbol
    assert any("\U0001F600" in a + b for a, b in fast), fast


def test_inmem_incremental_matches_naive_reference_random_corpora():
    """Property: the incremental pair-count/heap trainer equals the
    naive recount-everything reference on random corpora (covers pair
    creation/destruction, multiplicity from repeated chars, ties)."""
    import random

    from elephantdb_spark.operators.bpe import _train_bpe_inmem

    rng = random.Random(42)
    for trial in range(25):
        words = [
            "".join(rng.choice("aabbc") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(1, 30))
        ]
        wc: dict[str, int] = {}
        for w in words:
            wc[w] = wc.get(w, 0) + rng.randint(1, 4)
        n_merges = rng.randint(1, 12)
        got = _train_bpe_inmem(list(wc.items()), n_merges, 2)
        assert got == _py_train(wc, n_merges, 2), (trial, wc)


def test_early_stop_on_min_pair_count(spark):
    tiny = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    # every pair occurs once; min_pair_count=2 stops before any merge
    assert train_bpe(tiny, "text", 5, min_pair_count=2) == []


def test_encode_word_reference_properties():
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("lowest", ranks) == ["low", "est" + EOW]
    # unknown word falls back to chars + EOW
    assert bpe_encode_word("xyz", {}) == ["x", "y", "z", EOW]


def test_apply_bpe_matches_reference_encoder(spark, docs):
    merges = train_bpe(docs, "text", 8)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in apply_bpe(docs, "doc_id", "text", merges).collect()}
    for did, text in CORPUS:
        expect = sum(len(bpe_encode_word(w, ranks)) for w in text.lower().split())
        assert got[did] == expect, did
    # empty/null text encodes to zero tokens
    nulls = spark.createDataFrame(
        [(9, None), (10, "  ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in apply_bpe(nulls, "doc_id", "text", merges).collect()}
    assert out == {9: 0, 10: 0}


def test_apply_bpe_plans_zero_exchange(spark, docs):
    from elephantdb_spark.plans import count_exchanges

    df = apply_bpe(docs, "doc_id", "text", [("l", "o")])
    assert count_exchanges(df) == 0


def test_initial_pair_counts_match_python(spark, docs):
    wc = {r["w"]: r["c"] for r in word_counts(docs, "text").collect()}
    expected: Counter = Counter()
    for w, c in wc.items():
        s = list(w) + [EOW]
        for i in range(len(s) - 1):
            expected[(s[i], s[i + 1])] += c
    got = {(r["a"], r["b"]): r["count"]
           for r in initial_pair_counts(docs, "text").collect()}
    assert got == dict(expected)


def test_word_counts_single_exchange(spark, docs):
    """The one corpus-sized pass: exactly one exchange (the count agg),
    map-side combinable."""
    from elephantdb_spark.plans import count_exchanges

    assert count_exchanges(word_counts(docs, "text")) == 1


def test_apply_bpe_java_whitespace_boundaries(spark):
    """Review finding: the encoder must split words on the SAME
    boundaries the trainer does (Java/ASCII \\s). Unicode whitespace
    (\\xa0, \\x85) is a word CHARACTER to tokens_col — a bare
    str.split() would split on it and encode different words."""
    docs = spark.createDataFrame(
        [(1, "a b cd"), (2, "xy")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in apply_bpe(docs, "doc_id", "text", []).collect()}
    # doc 1: words are 'a\xa0b' (3 chars) and 'cd' (2) -> (3+1) + (2+1)
    assert out[1] == 7
    # doc 2: ONE word 'x\x85y' -> 3 chars + EOW
    assert out[2] == 4
