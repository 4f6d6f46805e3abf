"""Persisted IVF index domain: build → versioned layout → pruned probes.

The index composes E2 similarity search with the engine's versioned-store
machinery — these tests pin the composition: exact-mode equivalence to
brute force, physical partition pruning on probes, version pinning and
token visibility, and knn-join equivalence to the in-plan operator.
"""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.operators.ann import (
    brute_force_topk,
    ivf_knn_join,
    train_ivf_centroids,
)
from elephantdb_spark.operators.ann_index import (
    CENTROIDS_FILENAME,
    build_ivf_index,
    ivf_index_knn_join,
    ivf_index_probe,
    load_ivf_index,
)
from elephantdb_spark.store import DomainStore

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


@pytest.fixture(scope="module")
def index_root(spark, emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivfidx") / "emb_ivf")
    build_ivf_index(spark, emb, root, n_cells=8, version=1)
    return root


def _qvec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]


def test_layout_and_spec(index_root):
    store = DomainStore.open(index_root)
    assert store.spec.num_shards == 8
    assert store.spec.shard_scheme == "ivf-cell"
    assert store.spec.persistence_opts["id_col"] == "vec_id"
    assert store.all_versions() == [1]
    vpath = store.version_path(1)
    assert os.path.exists(os.path.join(vpath, CENTROIDS_FILENAME))
    cells = [d for d in os.listdir(vpath) if d.startswith("shard=")]
    assert 0 < len(cells) <= 8


def test_exact_mode_probe_equals_brute_force(spark, emb, index_root):
    q = _qvec(emb)
    got = [
        (r.id, round(r.sim, 9))
        for r in ivf_index_probe(spark, index_root, q, k=10, n_probe=8).collect()
    ]
    want = [
        (r.id, round(r.sim, 9)) for r in brute_force_topk(emb, q, k=10).collect()
    ]
    assert got == want


def test_probe_plan_prunes_to_probed_cells(spark, emb, index_root):
    """The serving property: a probe's scan Location must list only the
    probed shard=<cell> dirs (partition pruning, O1 applied to cells)."""
    import numpy as np

    q = _qvec(emb)
    centroids, _, _, _ = load_ivf_index(spark, index_root)
    d2 = ((centroids - np.asarray(q)[None, :]) ** 2).sum(axis=1)
    probe = {int(c) for c in np.argsort(d2, kind="stable")[:2]}
    df = ivf_index_probe(spark, index_root, q, k=5, n_probe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the probe must reach the scan as a PartitionFilter (shard IN (...))
    # over exactly the probed cells — that is what prunes the read
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    in_list = pf[0].split(" IN ")[1]
    listed = {int(x) for x in in_list.strip(" ()[]").split(",")}
    assert listed == probe, (listed, probe, pf[0])


def test_probe_beats_training_free_and_matches_in_plan_operator(
    spark, emb, index_root
):
    """Index probe at n_probe<n_cells equals ivf_topk with the SAME
    centroids (the persisted quantizer IS the one-shot quantizer)."""
    from elephantdb_spark.operators.ann import ivf_topk

    q = _qvec(emb)
    centroids, _, _, _ = load_ivf_index(spark, index_root)
    got = [(r.id, round(r.sim, 9)) for r in
           ivf_index_probe(spark, index_root, q, k=10, n_probe=3).collect()]
    want = [(r.id, round(r.sim, 9)) for r in
            ivf_topk(emb, q, k=10, n_cells=8, n_probe=3,
                     centroids=centroids).collect()]
    assert got == want


def test_version_pinning_and_hot_swap(spark, emb, index_root):
    """A new published version becomes the default; the old stays
    pin-readable (A18/A24 semantics on the index domain)."""
    half = emb.filter(F.col("vec_id") % 2 == 0)
    build_ivf_index(spark, half, index_root, n_cells=8, version=2)
    try:
        _, vecs_v2, _, v2 = load_ivf_index(spark, index_root)
        assert v2 == 2
        assert vecs_v2.count() == half.count()
        _, vecs_v1, _, v1 = load_ivf_index(spark, index_root, version=1)
        assert v1 == 1
        assert vecs_v1.count() == emb.count()
        q = _qvec(emb)
        ids_v2 = {r.id for r in
                  ivf_index_probe(spark, index_root, q, k=10, n_probe=8).collect()}
        assert all(i % 2 == 0 for i in ids_v2)
    finally:
        DomainStore.open(index_root).delete_version(2)


def test_unpublished_version_invisible(spark, emb, tmp_path):
    root = str(tmp_path / "idx")
    build_ivf_index(spark, emb, root, n_cells=4, version=1)
    store = DomainStore.open(root)
    # reserve-but-never-publish: readers must keep resolving v1
    store.create_version(7)
    _, _, _, v = load_ivf_index(spark, root)
    assert v == 1
    with pytest.raises(RuntimeError):
        load_ivf_index(spark, root, version=7)


def test_knn_join_against_index_matches_in_plan(spark, emb, index_root):
    """ivf_index_knn_join (data-side cells from the partition layout)
    equals ivf_knn_join with the same centroids (cells computed in-plan)."""
    centroids, _, _, _ = load_ivf_index(spark, index_root)
    queries = emb.limit(20)
    got = {
        (r.a, r.b, r.rk)
        for r in ivf_index_knn_join(
            spark, index_root, queries, k=3, n_probe=3
        ).collect()
    }
    # in-plan twin: same centroids, but probes restricted to the same 20
    want_rows = ivf_knn_join(
        emb, k=3, n_cells=8, n_probe=3, centroids=centroids
    ).join(queries.select(F.col("vec_id").alias("a")), "a").collect()
    want = {(r.a, r.b, r.rk) for r in want_rows}
    assert got == want


def test_build_failure_rolls_back(spark, emb, tmp_path):
    import numpy as np

    root = str(tmp_path / "idx")
    # a column typo fails BEFORE any disk mutation (no poisoned spec that
    # would block the corrected retry via the A30 equality check)
    with pytest.raises(ValueError):
        build_ivf_index(spark, emb, root, n_cells=4, version=1, vec_col="nope")
    assert not os.path.exists(root)
    # a mid-job failure (wrong-dim quantizer breaks the cell UDF) rolls the
    # reserved version back and records the durable failure marker
    with pytest.raises(Exception):
        build_ivf_index(
            spark, emb, root, n_cells=4, version=1,
            centroids=np.zeros((4, 3)),
        )
    store = DomainStore.open(root)
    assert store.all_versions() == []
    assert store.last_failure() is not None
    # retry succeeds and clears the failure
    build_ivf_index(spark, emb, root, n_cells=4, version=2)
    assert DomainStore.open(root).all_versions() == [2]
    assert DomainStore.open(root).last_failure() is None


def test_hierarchical_trainer_matches_contract(spark, emb):
    import numpy as np

    from elephantdb_spark.operators.ann import (
        train_ivf_centroids_hierarchical,
    )

    n_cells = 24
    h = train_ivf_centroids_hierarchical(emb, n_cells, seed=7)
    assert h.shape[0] == n_cells
    # deterministic: bit-identical on rerun
    h2 = train_ivf_centroids_hierarchical(emb, n_cells, seed=7)
    assert np.array_equal(h, h2)
    # different seed → different quantizer
    h3 = train_ivf_centroids_hierarchical(emb, n_cells, seed=8)
    assert not np.array_equal(h, h3)

    # quantization quality comparable to flat training on the same data:
    # mean distance to nearest centroid within 1.5x of flat's
    flat = train_ivf_centroids(emb, n_cells, seed=7)
    sample = emb.select("embedding").orderBy("vec_id").limit(2000).collect()
    mat = np.array([list(r[0]) for r in sample])

    def mean_q_err(cents):
        d2 = ((mat * mat).sum(1)[:, None] - 2 * (mat @ cents.T)
              + (cents * cents).sum(1)[None, :])
        return float(np.sqrt(np.maximum(d2.min(axis=1), 0)).mean())

    assert mean_q_err(h) < 1.5 * mean_q_err(flat)


def test_hierarchical_trainer_large_cell_count(spark, emb):
    # the production-shape call: n_cells far above the flat comfort zone
    # must stay fast (the flat form at this count would dominate build
    # time) and still return the full quantizer
    import time

    from elephantdb_spark.operators.ann import (
        train_ivf_centroids_hierarchical,
    )

    t0 = time.perf_counter()
    cents = train_ivf_centroids_hierarchical(
        emb, 300, sample_size=3000, seed=7
    )
    dt = time.perf_counter() - t0
    assert cents.shape[0] == 300
    assert dt < 30, f"hierarchical training too slow: {dt:.1f}s"


def test_update_ivf_index_incremental(spark, emb, tmp_path):
    """update_ivf_index: new vectors merged into touched cells (LWW per
    id), untouched cells file-copied forward, old version still pinned,
    exact probe over the updated index == brute force over the merged
    expectation."""
    from elephantdb_spark.operators.ann_index import update_ivf_index

    root = str(tmp_path / "upd_idx")
    base = emb.filter(F.col("vec_id") < 400).select("vec_id", "embedding")
    build_ivf_index(spark, base, root, n_cells=8, version=1)

    # batch: 5 re-ingested ids with DIFFERENT vectors (steal vectors from
    # other rows) + 5 genuinely new ids
    donor = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").between(400, 409)).collect()
    }
    updated = spark.createDataFrame(
        [(i, donor[400 + (i % 10)]) for i in range(5)]
        + [(1000 + i, donor[405 + i]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    v2 = update_ivf_index(spark, updated, root, version=2)
    assert v2 == 2

    store = DomainStore.open(root)
    assert store.all_versions() == [2, 1]
    v1p, v2p = store.version_path(1), store.version_path(2)

    # expectation: base minus re-ingested ids, plus the batch
    expect = base.join(
        updated.select("vec_id"), "vec_id", "left_anti"
    ).unionByName(updated)
    q = _qvec(emb)
    got = {
        (r["id"], round(r["sim"], 9))
        for r in ivf_index_probe(spark, root, q, k=10, n_probe=8).collect()
    }
    want = {
        (r["id"], round(r["sim"], 9))
        for r in brute_force_topk(expect, q, 10, "vec_id", "embedding").collect()
    }
    assert got == want

    # untouched cells were copy-forwarded: identical file names and sizes
    def cell_files(vpath, cell):
        d = os.path.join(vpath, f"shard={cell}")
        if not os.path.isdir(d):
            return None
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    centroids, v2_vectors, _, _ = load_ivf_index(spark, root, 2)
    from elephantdb_spark.operators.ann import add_ivf_cell

    # no stale duplicates: every vec_id appears exactly once after the
    # update, even when a re-ingested vector MOVED cells (review fix, r4)
    dup = (
        v2_vectors.groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0

    # touched = cells the batch lands in PLUS cells its ids lived in
    # before (those rewrite to evict stale copies)
    _, v1_vectors, _, _ = load_ivf_index(spark, root, 1)
    new_cells = {
        r["shard"]
        for r in add_ivf_cell(updated, centroids, "embedding", out_col="shard")
        .select("shard").distinct().collect()
    }
    old_cells = {
        r["shard"]
        for r in v1_vectors.join(updated.select("vec_id"), "vec_id")
        .select("shard").distinct().collect()
    }
    touched = new_cells | old_cells
    untouched = [c for c in range(8) if c not in touched and cell_files(v1p, c)]
    assert untouched, "fixture should leave at least one untouched cell"
    for c in untouched:
        assert cell_files(v2p, c) == cell_files(v1p, c)

    # the previous version still serves, pinned, with the OLD contents
    old_got = {
        (r["id"], round(r["sim"], 9))
        for r in ivf_index_probe(spark, root, q, k=10, n_probe=8, version=1).collect()
    }
    old_want = {
        (r["id"], round(r["sim"], 9))
        for r in brute_force_topk(base, q, 10, "vec_id", "embedding").collect()
    }
    assert old_got == old_want


def test_update_ivf_index_requires_existing_index(spark, emb, tmp_path):
    from elephantdb_spark.operators.ann_index import update_ivf_index

    with pytest.raises(FileNotFoundError):
        update_ivf_index(spark, emb.limit(1), str(tmp_path / "nope"))


def test_update_ivf_index_emptied_cell_not_resurrected(spark):
    """Review finding (r4, pass 2): when an update moves a cell's ONLY
    vector to a different cell, the emptied cell must not be
    copy-forwarded with the stale vector (the write emits no dir for an
    empty cell; the op must materialize one)."""
    import numpy as np
    import tempfile

    from elephantdb_spark.operators.ann_index import update_ivf_index

    dim = 4
    cents = np.array(
        [[0.0] * dim, [10.0] * dim], dtype=np.float64
    )  # two well-separated cells
    root = tempfile.mkdtemp() + "/empty_cell_idx"
    base = spark.createDataFrame(
        [(1, [0.1] * dim), (2, [10.1] * dim), (3, [9.9] * dim)],
        "vec_id long, embedding array<float>",
    )
    build_ivf_index(spark, base, root, n_cells=2, version=1, centroids=cents)

    # move id=1 (cell 0's ONLY vector) to cell 1
    moved = spark.createDataFrame(
        [(1, [9.8] * dim)], "vec_id long, embedding array<float>"
    )
    update_ivf_index(spark, moved, root, version=2)

    _, v2_vectors, _, _ = load_ivf_index(spark, root, 2)
    rows = {(r["vec_id"], r["shard"]) for r in v2_vectors.collect()}
    assert rows == {(1, 1), (2, 1), (3, 1)}, rows  # id 1 ONCE, in cell 1

    # exact probe near the OLD location finds nothing stale
    got = {
        r["id"]
        for r in ivf_index_probe(spark, root, [0.1] * dim, k=3, n_probe=2).collect()
    }
    assert got == {1, 2, 3}


def test_hierarchical_trainer_never_overshoots_on_skew(spark):
    """Review finding (r4, pass 3): largest-remainder allocation with the
    max(1,...) floor could return MORE than n_cells centroids on skewed
    super-cell membership — cells >= n_cells would then silently lose
    their vectors in the index build."""
    import numpy as np

    from elephantdb_spark.operators.ann import (
        train_ivf_centroids_hierarchical,
    )

    rng = np.random.RandomState(0)
    # 97 points in one tight cluster + 3 satellites: super-cell counts
    # like [97,1,1,1] reproduce the negative-remainder arithmetic
    dense = rng.normal(0, 0.01, (97, 8))
    sparse = np.eye(3, 8) * 50
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([dense, sparse]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids_hierarchical(
        df, n_cells=10, branch=4, sample_size=100, seed=3
    )
    assert cents.shape[0] <= 10, cents.shape


def test_knn_join_plan_prunes_index_side_and_single_probe_eval(
    spark, emb, index_root
):
    """VERDICT r4 item 5 (plan discipline for the r4 heavy operators):
    the batch knn join must (a) reach the index scan with a
    PartitionFilters over the UNION of probed cells — the untouched
    cells' files are never read — and (b) evaluate the probe-cell UDF
    ONCE (the explode's size()>0 prefilter used to duplicate the
    centroid matmul into a second ArrowEvalPython node)."""
    q = emb.filter(F.col("vec_id") < 5)
    df = ivf_index_knn_join(spark, index_root, q, k=3, n_probe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and " IN " in pf[0], plan
    # formatted output names each node twice (tree + detail): one
    # ArrowEvalPython node == 2 mentions; the duplicated-UDF bug gave 4
    assert plan.count("ArrowEvalPython") == 2, plan
    # pruning must not change results: compare against prune_cells=False
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(
        tuple(r)
        for r in ivf_index_knn_join(
            spark, index_root, q, k=3, n_probe=2, prune_cells=False
        ).collect()
    )
    assert a == b
