"""Corpus-quality operators (operators/quality.py): repetition signals
replayed in python, contamination/decontamination set logic and plan
shape, TF-IDF exactness and tie-breaks; split_corpus hash determinism."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.operators.quality import (
    contamination_hits,
    decontaminate,
    repetition_profile,
    tfidf_topk,
)
from elephantdb_spark.operators.sampling import split_corpus

DOCS = [
    (0, "the cat sat on the mat the cat sat again"),
    (1, "line one\nline two\nline one\n\nline three"),
    (2, "unique words only here today"),
    (3, ""),
    (4, "solo"),
    (5, "spam spam spam spam spam spam"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _py_profile(text: str, n: int = 2):
    lines = [l for l in text.split("\n") if l]
    toks = text.split()
    ngrams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    dl = 1 - len(set(lines)) / len(lines) if lines else 0.0
    dg = 1 - len(set(ngrams)) / len(ngrams) if ngrams else 0.0
    top = max(Counter(ngrams).values()) / len(ngrams) if ngrams else 0.0
    return (dl, dg, top)


def test_repetition_profile_matches_python(spark, docs):
    got = {
        r.doc_id: (r.dup_line_frac, r.dup_ngram_frac, r.top_ngram_frac)
        for r in repetition_profile(docs, "doc_id", "text").collect()
    }
    for doc_id, text in DOCS:
        want = _py_profile(text)
        assert got[doc_id] == pytest.approx(want), (doc_id, got[doc_id], want)
    # the all-same-token doc is maximally repetitive
    assert got[5][1] == pytest.approx(1 - 1 / 5)
    assert got[5][2] == pytest.approx(1.0)
    # empty doc / single token doc: all zeros, no NaN
    assert got[3] == (0.0, 0.0, 0.0)
    assert got[4] == (0.0, 0.0, 0.0)


def test_repetition_profile_is_shuffle_free(spark, docs):
    plan = (
        repetition_profile(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_contamination_and_decontaminate(spark, docs):
    bench_rows = [(100, "the cat sat somewhere"), (101, "totally different words")]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    hits = {
        r.doc_id: r.n_hit_ngrams
        for r in contamination_hits(docs, bench, "doc_id", "text", ngram_len=3).collect()
    }
    # doc 0 shares exactly the 3-gram "the cat sat" with the benchmark
    assert hits == {0: 1}
    clean = decontaminate(docs, bench, "doc_id", "text", ngram_len=3)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2, 3, 4, 5]
    # benchmark side broadcasts; corpus text is never shuffled
    plan = (
        contamination_hits(docs, bench, "doc_id", "text", ngram_len=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_tfidf_topk_matches_python(spark, docs):
    n_docs = len(DOCS)
    tf: dict[int, Counter] = {
        d: Counter(t.lower() for t in text.split()) for d, text in DOCS
    }
    dfreq = Counter(tok for c in tf.values() for tok in c)
    want = {}
    for d, c in tf.items():
        scored = sorted(
            ((tok, n, dfreq[tok], n * n_docs / dfreq[tok]) for tok, n in c.items()),
            key=lambda x: (-x[3], x[0]),
        )[:2]
        if scored:
            want[d] = scored
    got: dict[int, list] = {}
    for r in tfidf_topk(docs, "doc_id", "text", k=2).collect():
        got.setdefault(r.doc_id, []).append((r.token, r.tf, r.dfreq, r.score))
    for d in got:
        got[d].sort(key=lambda x: (-x[3], x[0]))
    assert got == {d: [tuple(x) for x in v] for d, v in want.items()}
    # empty doc contributes no rows
    assert 3 not in got


def test_inverted_index_matches_python(spark, docs):
    from collections import defaultdict

    from elephantdb_spark.operators.quality import inverted_index

    postings = defaultdict(set)
    for d, text in DOCS:
        for t in text.split():
            postings[t.lower()].add(d)
    got = {
        r.token: (r.df_count, r.postings)
        for r in inverted_index(docs, "doc_id", "text").collect()
    }
    want = {
        t: (len(ids), ",".join(str(i) for i in sorted(ids)))
        for t, ids in postings.items()
    }
    assert got == want
    # truncation caps the list but keeps the true df_count
    trunc = {
        r.token: (r.df_count, r.postings)
        for r in inverted_index(docs, "doc_id", "text", max_postings=1).collect()
    }
    assert trunc["the"] == (got["the"][0], got["the"][1].split(",")[0])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        inverted_index(docs, "doc_id", "text", max_postings=0)


def test_corpus_diff(spark):
    from elephantdb_spark.operators.quality import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (5, "brand new"), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new, "doc_id", "text").collect()}
    # 1 unchanged (omitted), 4 null->null unchanged (omitted)
    assert got == {2: "changed", 3: "removed", 5: "added"}
    # null -> text counts as changed
    old2 = spark.createDataFrame([(4, None)], "doc_id long, text string")
    new2 = spark.createDataFrame([(4, "text now")], "doc_id long, text string")
    assert {r.doc_id: r.status for r in corpus_diff(old2, new2, "doc_id", "text").collect()} == {
        4: "changed"
    }


def test_grouped_percentiles_matches_python(spark):
    import numpy as np

    from elephantdb_spark.analytics import grouped_percentiles

    rows = [(["a", "b"][i % 2], float(v)) for i, v in enumerate(range(101))]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r.g: (r.p50, r.p95, r.p99) for r in grouped_percentiles(df, ["g"], "value").collect()}
    for g in ("a", "b"):
        vals = np.array(sorted(v for gg, v in rows if gg == g))
        want = tuple(np.quantile(vals, q) for q in (0.5, 0.95, 0.99))
        assert got[g] == pytest.approx(want, abs=1e-12), g


def test_tfidf_validates_k(spark, docs):
    with pytest.raises(ValueError):
        tfidf_topk(docs, "doc_id", "text", k=0)


def _py_md5_u32(v, salt=""):
    return int(hashlib.md5(f"{v}{salt}".encode()).hexdigest()[:8], 16)


def test_split_corpus_matches_python_and_is_exhaustive(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.doc_id: r.split for r in split_corpus(df, "doc_id", splits, "s").collect()}
    assert len(got) == 2000  # every row labeled
    bounds = [("train", 0.8), ("val", 0.9)]
    for i in range(2000):
        h = _py_md5_u32(i, "s")
        want = "test"
        for name, cum in bounds:
            if h < int(cum * 2**32):
                want = name
                break
        assert got[i] == want, i
    # rough proportions
    c = Counter(got.values())
    assert 0.75 * 2000 < c["train"] < 0.85 * 2000
    # stable across reruns
    again = {r.doc_id: r.split for r in split_corpus(df, "doc_id", splits, "s").collect()}
    assert again == got


def test_split_corpus_validates_fractions(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        split_corpus(df, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_corpus(df, "doc_id", {})
    # single split: everything gets it, zero-shuffle plan
    out = split_corpus(df, "doc_id", {"all": 1.0})
    assert out.collect()[0].split == "all"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hot_shingle_report(spark, docs):
    from collections import Counter

    from elephantdb_spark.operators.dedup import hot_shingle_report

    freq = Counter()
    for d, text in DOCS:
        toks = text.split()
        sh = {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}
        for s in sh:
            freq[s] += 1
    got = [(r.shingle, r.doc_freq) for r in hot_shingle_report(docs, "doc_id", "text", 2, 5).collect()]
    want = sorted(freq.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert got == want
    with pytest.raises(ValueError):
        hot_shingle_report(docs, "doc_id", "text", 2, 0)
