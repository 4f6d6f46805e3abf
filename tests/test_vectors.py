"""group_centroids fixed-point determinism and accuracy."""

from __future__ import annotations

import math

import pytest

from elephantdb_spark.operators.vectors import group_centroids


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (i % 3, [math.sin(i * 7 + d) * 0.2 for d in range(8)]) for i in range(90)
    ]
    return (
        spark.createDataFrame(rows, "label long, embedding array<double>").cache(),
        rows,
    )


def test_group_centroids_matches_python_fixed_point(spark, vecs):
    df, rows = vecs
    got = {
        (r.label, r.dim): (r.centroid, r.n)
        for r in group_centroids(df, "label", "embedding").collect()
    }
    scale = 2.0**40
    for lab in (0, 1, 2):
        members = [v for l, v in rows if l == lab]
        for d in range(8):
            s = sum(math.floor(v[d] * scale) for v in members)
            want = s / (len(members) * scale)
            c, n = got[(lab, d + 1)]
            assert n == len(members)
            assert c == want, (lab, d)  # exact equality, not approx
            # and the fixed-point mean is within quantization of the true mean
            true = sum(v[d] for v in members) / len(members)
            assert abs(c - true) < 1e-11


def test_group_centroids_partitioning_invariance(spark, vecs):
    """The headline property: result identical under different
    parallelism/partitioning (order-free integer sums)."""
    df, _ = vecs
    a = sorted(map(tuple, group_centroids(df, "label", "embedding").collect()))
    b = sorted(
        map(tuple, group_centroids(df.repartition(13), "label", "embedding").collect())
    )
    c = sorted(
        map(tuple, group_centroids(df.coalesce(1), "label", "embedding").collect())
    )
    assert a == b == c


def test_group_centroids_validates_scale(spark, vecs):
    df, _ = vecs
    with pytest.raises(ValueError):
        group_centroids(df, "label", "embedding", scale_bits=0)
    with pytest.raises(ValueError):
        group_centroids(df, "label", "embedding", scale_bits=61)
