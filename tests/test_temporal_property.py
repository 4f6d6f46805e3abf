"""Property-based tests for the temporal joins: random small inputs
compared against brute-force Python reference implementations. Catches
boundary/tie/ordering mistakes the example-based tests can't enumerate."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elephantdb_spark.operators.temporal import asof_join, range_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=40)


def _spark():
    # session fixture is function-scoped via conftest; hypothesis re-runs
    # the body many times, so grab the active session directly
    from pyspark.sql import SparkSession

    return SparkSession.active()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12),
    right=st.lists(st.tuples(KEYS, TS, st.integers(0, 99)), min_size=0, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    sp = _spark()
    ldf = sp.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    )
    rdf = sp.createDataFrame(right, "k long, ts long, rv long")
    got = {
        r.lid: r.rv
        for r in asof_join(ldf, rdf, "k", "k", "ts", "ts", ["rv"]).collect()
    }
    for i, (k, t) in enumerate(left):
        # latest right at-or-before t for the key; ties on ts keep max rv
        # (the tie_break default = first value col)
        cands = [(rt, rv) for (rk, rt, rv) in right if rk == k and rt <= t]
        want = max(cands, key=lambda x: (x[0], x[1]))[1] if cands else None
        assert got[i] == want, (i, k, t, cands)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=10),
    ivls=st.lists(st.tuples(KEYS, TS, TS, st.integers(0, 99)), min_size=0, max_size=10),
    width=st.sampled_from([1, 3, 7, 50]),
)
def test_range_join_matches_bruteforce(spark, points, ivls, width):
    sp = _spark()
    pdf = sp.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)], "k long, ts long, pid long"
    )
    idf = sp.createDataFrame(ivls, "k long, s long, e long, iv long")
    got = {
        (r.pid, r.iv)
        for r in range_join(pdf, idf, "k", "k", "ts", "s", "e", bucket_width=width).collect()
    }
    want = {
        (i, iv)
        for i, (pk, pt) in enumerate(points)
        for (ik, s, e, iv) in ivls
        if ik == pk and s <= pt < e
    }
    assert got == want
