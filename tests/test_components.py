"""connected_components vs a python union-find replay on assorted graph
shapes; dedup_by_components keep-set semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.operators.components import (
    connected_components,
    dedup_by_components,
)


def _py_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


GRAPHS = {
    "two_triangles": [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)],
    "chain": [(i, i + 1) for i in range(20)],  # diameter 20
    "star": [(100, i) for i in range(200, 230)],
    "self_loop_and_dup": [(5, 5), (5, 6), (6, 5), (7, 8)],
    "single_edge": [(42, 7)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_connected_components_matches_union_find(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.cluster for r in connected_components(df).collect()}
    assert got == _py_components(edges)


def test_connected_components_max_iter(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(8)], "a long, b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1)


def test_dedup_by_components(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "doc_id long, text string")
    # clusters {0,1,2} and {5,6}; 3,4,7,8,9 untouched
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "a long, b long")
    kept = sorted(r.doc_id for r in dedup_by_components(docs, pairs, "doc_id").collect())
    assert kept == [0, 3, 4, 5, 7, 8, 9]
