"""Property-based build→read roundtrip: arbitrary binary keys/values must
survive the full engine path byte-exactly (SURVEY §7 hard part #3 — binary
fidelity through Arrow/Parquet incl. empty, high-bit, and long keys)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elephantdb_spark import DomainSpec, build_domain
from elephantdb_spark.engine import Domain

# one Spark build per example is expensive — keep examples few but nasty
keys_st = st.lists(
    st.binary(min_size=0, max_size=300),
    min_size=1,
    max_size=12,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(keys=keys_st, data=st.data())
def test_roundtrip_arbitrary_binary_kv(spark, tmp_path_factory, keys, data):
    values = [
        data.draw(st.one_of(st.none(), st.binary(min_size=0, max_size=300)))
        for _ in keys
    ]
    root = str(tmp_path_factory.mktemp("prop") / "d")
    pairs = list(zip(keys, values))
    df = spark.createDataFrame(pairs, "key binary, value binary")
    build_domain(spark, df, root, DomainSpec(num_shards=3), version=1)
    dom = Domain(spark, root)

    # full-map equality (A16) — byte-exact, None-preserving
    assert dom.to_map() == dict(pairs)
    # point + local serving paths agree for every key, plus a guaranteed miss
    for k, v in pairs:
        assert dom.get(k) == v
        assert dom.local_get(k) == v
    miss = b"\x00miss\xff" * 40
    assert dom.get(miss) is None and dom.local_get(miss) is None
    # multiGet preserves order-free key set incl. the miss
    got = dom.multi_get([*keys, miss])
    assert got == {**dict(pairs), miss: None}


@pytest.mark.parametrize("size", [1 << 10, 1 << 20])
def test_large_values_roundtrip(spark, tmp_path, size):
    payload = bytes(range(256)) * (size // 256)
    root = str(tmp_path / f"big{size}")
    df = spark.createDataFrame([(b"big", payload)], "key binary, value binary")
    build_domain(spark, df, root, DomainSpec(num_shards=2), version=1)
    dom = Domain(spark, root)
    assert dom.get(b"big") == payload
    assert dom.local_get(b"big") == payload


# strip_duplicate_lines: arbitrary corpora must match a pure-python replay
# of the spec (trim-based hotness, blanks always kept, order/bytes
# preserved). Lines drawn from a small alphabet so collisions are common;
# tabs included because Spark's trim strips SPACES only (python
# str.strip() would over-normalize — the replay uses strip(' ')).
_line_st = st.text(alphabet=" \tabX", min_size=0, max_size=6)
_doc_st = st.lists(_line_st, min_size=1, max_size=5).map("\n".join)
_corpus_st = st.lists(_doc_st, min_size=1, max_size=8)


def _python_strip(docs: list[str], max_line_docs: int):
    from collections import Counter

    df = Counter()
    for text in docs:
        seen = {ln.strip(" ") for ln in text.split("\n") if ln.strip(" ")}
        df.update(seen)
    hot = {ln for ln, n in df.items() if n > max_line_docs}
    out = {}
    for i, text in enumerate(docs):
        lines = text.split("\n")
        kept = [
            ln for ln in lines
            if ln.strip(" ") == "" or ln.strip(" ") not in hot
        ]
        out[i] = ("\n".join(kept), len(lines) - len(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=_corpus_st, threshold=st.integers(min_value=1, max_value=3))
def test_strip_duplicate_lines_matches_python_replay(spark, docs, threshold):
    from elephantdb_spark.operators.dedup import strip_duplicate_lines

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_lines_removed)
        for r in strip_duplicate_lines(
            df, "doc_id", "text", max_line_docs=threshold
        ).collect()
    }
    assert got == _python_strip(docs, threshold)
