"""chunk_documents window/stride semantics vs python replay;
redact_pii / pii_count_col pattern behavior and ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.functions.redact import pii_count_col, redact_pii
from elephantdb_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def chunk_docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (1, "a b c"),
        (2, ""),
        (3, "only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _py_chunks(text, window, stride):
    toks = text.split()
    out = []
    for idx, start in enumerate(range(0, len(toks), stride)):
        piece = toks[start : start + window]
        out.append((idx, " ".join(piece), len(piece)))
    return out


@pytest.mark.parametrize("window,stride", [(4, 4), (4, 2), (3, 5), (100, 100)])
def test_chunk_documents_matches_python(spark, chunk_docs, window, stride):
    got: dict[int, list] = {}
    for r in chunk_documents(chunk_docs, "doc_id", "text", window, stride).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_tokens))
    for d in got:
        got[d].sort()
    rows = {r.doc_id: r.text for r in chunk_docs.collect()}
    want = {
        d: _py_chunks(t, window, stride) for d, t in rows.items() if t.split()
    }
    assert got == want
    assert 2 not in got  # empty doc -> no chunks


def test_chunk_documents_stride_defaults_and_validates(spark, chunk_docs):
    out = chunk_documents(chunk_docs, "doc_id", "text", 4)
    doc0 = sorted(
        (r.chunk_idx, r.n_tokens) for r in out.filter(F.col("doc_id") == 0).collect()
    )
    assert doc0 == [(0, 4), (1, 4), (2, 2)]  # 10 tokens, gapless 4-partition
    with pytest.raises(ValueError):
        chunk_documents(chunk_docs, "doc_id", "text", 0)
    with pytest.raises(ValueError):
        chunk_documents(chunk_docs, "doc_id", "text", 4, 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-stage explode


CASES = [
    ("mail me at jo.doe+x@ex-corp.co.uk now", "mail me at <EMAIL> now", {"email": 1}),
    ("ssn 123-45-6789 ok", "ssn <SSN> ok", {"ssn": 1, "phone": 0}),
    ("call 555-123-4567 or 555.123.4567", "call <PHONE> or <PHONE>", {"phone": 2}),
    ("host 10.0.0.1 and 192.168.255.255", "host <IP> and <IP>", {"ip": 2}),
    ("clean text stays clean", "clean text stays clean", {"email": 0, "ip": 0}),
    # ssn wins over phone on 3-2-4; phone doesn't half-eat it
    ("id 111-22-3333", "id <SSN>", {"ssn": 1, "phone": 0}),
    ("a@b.com at 1.2.3.4 ssn 123-45-6789", "<EMAIL> at <IP> ssn <SSN>", {"email": 1, "ip": 1, "ssn": 1}),
]


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "i long, text string"
    )
    out = df.select(
        "i",
        redact_pii(F.col("text")).alias("red"),
        *[
            pii_count_col(F.col("text"), c).alias(c)
            for c in ("email", "ssn", "phone", "ip")
        ],
    ).collect()
    by_i = {r.i: r for r in out}
    for i, (_, want_red, want_counts) in enumerate(CASES):
        assert by_i[i].red == want_red, (i, by_i[i].red)
        for cat, n in want_counts.items():
            assert by_i[i][cat] == n, (i, cat)


def test_pii_count_unknown_category(spark):
    with pytest.raises(ValueError):
        pii_count_col(F.lit("x"), "dna")
