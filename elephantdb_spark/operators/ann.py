"""Similarity search over embedding columns (`array<float>`).

* :func:`brute_force_topk` — exact cosine top-k: the correctness baseline.
  Linear scan, fully JVM-side fold math, no shuffle (top-k via a single
  ``orderBy ... limit`` that Spark executes as per-partition TakeOrdered).
* :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH buckets
  (signs of dot products against deterministic seeded planes), candidates
  restricted to the query's bucket ring, exact re-rank inside.
* :func:`embedding_neardup_pairs` — near-duplicate vector pairs via LSH
  bucket join + exact cosine verification.

The hyperplane projection is a vectorized Arrow pandas UDF (numpy matmul
over batches) — the one place Python beats expression trees; everything
else stays in Catalyst.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from elephantdb_spark.functions.similarity import cosine_sim_col


def _query_vec_col(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    Returns (id, sim) ordered by sim desc, id asc (deterministic ties).
    """
    out = df.select(
        F.col(id_col).alias("id"),
        cosine_sim_col(F.col(vec_col), _query_vec_col(query_vec)).alias("sim"),
    )
    if exclude_ids:
        out = out.filter(~F.col("id").isin(exclude_ids))
    return out.orderBy(F.col("sim").desc(), F.col("id").asc()).limit(k)


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (seeded, reproducible across runs
    and engines)."""
    digest_seed = int.from_bytes(
        hashlib.sha256(f"edb-lsh-{seed}".encode()).digest()[:8], "big"
    )
    rng = np.random.default_rng(digest_seed)
    return rng.standard_normal((n_bits, dim))


def _bucket_udf(planes: np.ndarray):
    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        signs = (mat @ planes.T) > 0  # (batch, n_bits)
        weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
        return pd.Series((signs * weights).sum(axis=1).astype(np.int64))

    return bucket


def _bucket_col_fold(planes: np.ndarray, vec_col: str):
    """Bucket id as a pure JVM expression: per plane, a sequential-fold
    dot product (functions.similarity.dot_col) whose sign sets one bit.
    Bit-identical to an equivalent left-fold in SQL, so the whole LSH
    pipeline becomes oracle-replicable (the q29 md5-mode pattern applied
    to hyperplane bucketing). The arrow mode's BLAS matmul may round
    differently at sign boundaries; fold mode trades its batch speed for
    exact cross-engine determinism."""
    from elephantdb_spark.functions.similarity import dot_col

    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(
            dot_col(F.col(vec_col), plane_arr) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0)).cast("long")
    return bucket


def fold_bucket_of(vec: list[float], planes: np.ndarray) -> int:
    """Driver-side twin of :func:`_bucket_col_fold` for the query vector:
    plain left-to-right float64 accumulation, matching the JVM/SQL folds
    operation-for-operation."""
    bucket = 0
    for i, plane in enumerate(planes):
        acc = 0.0
        for x, y in zip(vec, plane):
            acc += float(x) * float(y)
        if acc > 0:
            bucket |= 1 << i
    return bucket


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_bits: int = 12,
    seed: int = 42,
    dim: int | None = None,
    out_col: str = "bucket",
    bucket_mode: str = "arrow",
) -> DataFrame:
    """Attach the random-hyperplane LSH bucket id. ``bucket_mode="arrow"``
    (default) uses the vectorized Arrow UDF; ``"fold"`` uses the
    sequential-fold JVM expression (oracle-parity mode)."""
    if bucket_mode not in ("arrow", "fold"):
        raise ValueError(f"bucket_mode must be 'arrow' or 'fold', got {bucket_mode!r}")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_bits, seed)
    if bucket_mode == "fold":
        return df.withColumn(out_col, _bucket_col_fold(planes, vec_col))
    return df.withColumn(out_col, _bucket_udf(planes)(F.col(vec_col)))


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_hamming: int = 1,
    bucket_mode: str = "arrow",
) -> DataFrame:
    """Approximate top-k: restrict the exact re-rank to vectors whose LSH
    bucket is within ``max_hamming`` sign-flips of the query's bucket.

    At scale, bucket is a partition/cluster key: the candidate read prunes
    to a handful of buckets out of 2^n_bits instead of scanning the corpus.

    ``bucket_mode="fold"`` computes every bucket (query's included) by
    sequential-fold dot products, making the result exactly replicable by
    a SQL oracle with the plane constants inlined (q31).
    """
    planes = hyperplanes(len(query_vec), n_bits, seed)
    if bucket_mode == "fold":
        qbucket = fold_bucket_of(query_vec, planes)
    else:
        q = np.asarray(query_vec, dtype=np.float64)
        qbits = (planes @ q) > 0
        qbucket = int((qbits * (1 << np.arange(n_bits, dtype=np.int64))).sum())

    bucketed = add_lsh_bucket(
        df, vec_col, n_bits, seed, dim=len(query_vec), bucket_mode=bucket_mode
    )
    candidates = bucketed.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qbucket))) <= max_hamming
    )
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def _kmeans(mat: np.ndarray, k: int, seed_tag: str, iters: int) -> np.ndarray:
    """Deterministic Lloyd's k-means on an in-memory sample, BLAS form:
    ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 via one matmul per iteration,
    centroid update via add.at/bincount. The broadcasted (sample, cells,
    dim) temporary + per-cell Python loop this replaced made training
    scale ~linearly in n_cells with a huge constant — the 10x scale run
    measured 10.8 s at 160 cells vs 0.2 s for this form (same
    assignments)."""
    digest_seed = int.from_bytes(hashlib.sha256(seed_tag.encode()).digest()[:8], "big")
    rng = np.random.default_rng(digest_seed)
    centroids = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    x2 = (mat * mat).sum(axis=1)[:, None]
    for _ in range(iters):
        d2 = x2 - 2.0 * (mat @ centroids.T) + (centroids * centroids).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        sums = np.zeros_like(centroids)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=len(centroids)).astype(np.float64)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz, None]
    return centroids


def _collect_sample(
    df: DataFrame, vec_col: str, id_col: str, sample_size: int
) -> np.ndarray:
    """Deterministic bounded sample: the sample_size lowest-id vectors
    (TakeOrderedAndProject — one corpus pass with a per-partition top-k
    heap, never a full sort)."""
    sample = df.select(vec_col).orderBy(F.col(id_col)).limit(sample_size).collect()
    return np.array([list(r[0]) for r in sample], dtype=np.float64)


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 10_000,
    seed: int = 42,
    iters: int = 10,
) -> np.ndarray:
    """Train IVF coarse-quantizer centroids: deterministic driver-side
    Lloyd's k-means on a bounded sample (the FAISS pattern — IVF training
    never reads the full corpus; at 100 TB the sample is the only
    driver-side data, everything after is distributed).

    Flat training is O(sample · n_cells · dim) per iteration — right up
    to a few thousand cells. For production cell counts (the 100 TB
    sizing rule gives n_cells ≈ corpus_bytes / 512 MB ≈ 200k) use
    :func:`train_ivf_centroids_hierarchical`, which is
    O(sample · sqrt(n_cells) · dim).
    """
    mat = _collect_sample(df, vec_col, id_col, sample_size)
    return _kmeans(mat, n_cells, f"edb-ivf-{seed}", iters)


def train_ivf_centroids_hierarchical(
    df: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int | None = None,
    seed: int = 42,
    iters: int = 10,
    branch: int | None = None,
) -> np.ndarray:
    """Two-level k-means for large cell counts: train ``branch``
    (default ceil(sqrt(n_cells))) super-cells, then split each
    super-cell's sub-cell budget proportionally to its sample membership
    (largest-remainder allocation) and run k-means inside it.

    Cost is O(sample · sqrt(n_cells) · dim) per iteration vs the flat
    trainer's O(sample · n_cells · dim) — at the 100 TB sizing
    (n_cells ≈ 200k) that is the difference between minutes and a week
    of driver time. Fully deterministic: the sample, the super-cell
    seeds, the per-super-cell sub-seeds, and the allocation are all pure
    functions of (data, seed). Returns up to ``n_cells`` centroids
    (fewer only when the sample has fewer distinct points than cells).

    ``sample_size`` defaults to ``max(10_000, 8 · n_cells)`` — cells
    need a handful of training points each (FAISS warns below ~39/cell;
    8/cell keeps the driver sample bounded while staying usable — raise
    it when training production indexes).
    """
    if sample_size is None:
        sample_size = max(10_000, 8 * n_cells)
    mat = _collect_sample(df, vec_col, id_col, sample_size)
    if branch is None:
        branch = int(np.ceil(np.sqrt(n_cells)))
    branch = max(1, min(branch, n_cells, len(mat)))
    supers = _kmeans(mat, branch, f"edb-ivf-{seed}-super", iters)
    # assign the sample to super-cells (one matmul)
    d2 = (
        (mat * mat).sum(axis=1)[:, None]
        - 2.0 * (mat @ supers.T)
        + (supers * supers).sum(axis=1)[None, :]
    )
    assign = d2.argmin(axis=1)
    counts = np.bincount(assign, minlength=len(supers))
    # proportional sub-cell budgets over non-empty super-cells,
    # largest-remainder rounding, each capped at its member count
    nonempty = np.flatnonzero(counts)
    quota = n_cells * counts[nonempty] / counts[nonempty].sum()
    alloc = np.maximum(1, np.floor(quota).astype(int))
    alloc = np.minimum(alloc, counts[nonempty])
    remainder = n_cells - int(alloc.sum())
    if remainder > 0:
        # hand leftover cells to the largest fractional remainders with
        # membership headroom (ties broken by super-cell index: stable)
        order = np.argsort(-(quota - np.floor(quota)), kind="stable")
        for idx in list(order) * 2:  # two passes bound the loop
            if remainder == 0:
                break
            if alloc[idx] < counts[nonempty][idx]:
                alloc[idx] += 1
                remainder -= 1
    elif remainder < 0:
        # the max(1, ...) floor can OVERSHOOT on skewed membership
        # (e.g. counts [97,1,1,1] at n_cells=10 -> alloc [9,1,1,1]=12):
        # trim the largest allocations back down — returning more than
        # n_cells centroids would assign vectors to cells the index's
        # slot table does not know, silently dropping them from the build
        # the trim always reaches remainder == 0: branch is clamped to
        # ≤ n_cells above, so len(nonempty) ≤ n_cells and the all-at-floor
        # state sums to ≤ n_cells — a branch > n_cells request is clamped,
        # not honored (more super-cells than total cells is meaningless
        # for the hierarchy, and an oversized centroid set would assign
        # vectors to cells the index's slot table does not know).
        while remainder < 0:
            idx = int(np.argmax(alloc))
            alloc[idx] -= 1
            remainder += 1
    out = []
    for j, sc in enumerate(nonempty):
        members = mat[assign == sc]
        out.append(_kmeans(members, int(alloc[j]), f"edb-ivf-{seed}-sub-{sc}", iters))
    return np.vstack(out)


def _cell_udf(centroids: np.ndarray):
    @pandas_udf("int")
    def cell(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        # argmin ||v - c||^2 = argmin (||c||^2 - 2 v.c) — one matmul per batch
        d = (centroids**2).sum(axis=1)[None, :] - 2.0 * (mat @ centroids.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return cell


def add_ivf_cell(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Attach the nearest-centroid cell id (vectorized Arrow UDF). At scale
    ``cell`` is the partition/cluster key of the vector table, so a probe
    reads n_probe partitions instead of the corpus."""
    return df.withColumn(out_col, _cell_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: restrict the exact cosine re-rank to the
    ``n_probe`` cells whose centroids are nearest the query.

    ``n_probe == n_cells`` degenerates to exact brute force (the pytest
    equivalence anchor). Pass precomputed ``centroids`` to amortize training
    across queries (the production path: train once, probe many)."""
    if centroids is None:
        centroids = train_ivf_centroids(df, n_cells, vec_col, id_col, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2, kind="stable")[:n_probe]]
    candidates = add_ivf_cell(df, centroids, vec_col).filter(F.col("cell").isin(probe))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def cosine_sim_arrow():
    """Scalar Arrow UDF cosine — the vectorized twin of
    functions.similarity.cosine_sim_col for hot paths where the fold's
    bit-exact oracle parity isn't needed (folds are interpreted
    higher-order expressions, ~30us/pair; this is a batched numpy
    einsum)."""

    @pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.vstack(va.to_numpy()).astype(np.float64)
        B = np.vstack(vb.to_numpy()).astype(np.float64)
        an = np.linalg.norm(A, axis=1)
        bn = np.linalg.norm(B, axis=1)
        denom = an * bn
        dots = np.einsum("ij,ij->i", A, B)
        return pd.Series(np.where(denom == 0, 0.0, dots / np.where(denom == 0, 1.0, denom)))

    return cos


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    n_bits: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "arrow",
) -> DataFrame:
    """Near-duplicate vector pairs: same-LSH-bucket candidates verified by
    exact cosine >= threshold. Returns (a, b, sim), a < b.

    ``scorer="arrow"`` (default) verifies candidates with the batched numpy
    cosine; ``"fold"`` keeps the JVM sequential fold (bit-identical to the
    DuckDB oracle, used by parity checks)."""
    if scorer not in ("arrow", "fold"):
        raise ValueError(f"scorer must be 'arrow' or 'fold', got {scorer!r}")
    bucketed = add_lsh_bucket(df, vec_col, n_bits, seed).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "bucket"
    )
    left = bucketed.select(
        F.col("id").alias("a"), F.col("vec").alias("va"), "bucket"
    )
    right = bucketed.select(
        F.col("id").alias("b"), F.col("vec").alias("vb"), "bucket"
    )
    sim = (
        cosine_sim_arrow()(F.col("va"), F.col("vb"))
        if scorer == "arrow"
        else cosine_sim_col(F.col("va"), F.col("vb"))
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .distinct()
    )


def _probe_cells_udf(centroids: np.ndarray, n_probe: int):
    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        d = (centroids**2).sum(axis=1)[None, :] - 2.0 * (mat @ centroids.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    # asNondeterministic: the downstream explode() plants a size(col)>0
    # prefilter referencing this column, and Catalyst then duplicates a
    # deterministic UDF into the filter — the centroid matmul ran TWICE
    # per probe row (caught reading the captured plan, PLANS.md). Marking
    # it nondeterministic forces one materialization. (It IS deterministic
    # for fixed centroids; the flag only disables expression duplication.)
    return probe_cells.asNondeterministic()


def knn_join(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs k-nearest-neighbors: for every vector, its top-k
    neighbors by cosine similarity. Returns (a, b, sim, rk) with rk 1..k,
    ties broken by ascending neighbor id.

    This is the O(N^2) correctness baseline (Spark plans the self-join as a
    broadcast nested loop when one side fits); use :func:`ivf_knn_join` for
    corpora where N^2 scoring is off the table.
    """
    left = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    right = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    scored = (
        left.join(right, F.col("a") != F.col("b"))
        .select("a", "b", cosine_sim_col(F.col("va"), F.col("vb")).alias("sim"))
    )
    w = Window.partitionBy("a").orderBy(F.col("sim").desc(), F.col("b").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("a", "b", "sim", "rk")
    )


def _cell_knn_cogroup(k: int):
    """Per-cell scorer for the arrow path: one normalized matmul between
    the cell's probe matrix and member matrix, emitting each probe's top-k
    candidates within the cell."""

    def score(probes: pd.DataFrame, members: pd.DataFrame) -> pd.DataFrame:
        if probes.empty or members.empty:
            # empty object-dtype columns convert to any Arrow type
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        P = np.vstack(probes["va"].to_numpy()).astype(np.float64)
        D = np.vstack(members["vb"].to_numpy()).astype(np.float64)
        pn = np.linalg.norm(P, axis=1)
        dn = np.linalg.norm(D, axis=1)
        pn[pn == 0] = 1.0  # zero-norm vectors → sim 0 (cosine_sim_col contract)
        dn[dn == 0] = 1.0
        S = (P / pn[:, None]) @ (D / dn[:, None]).T  # (n_probes, n_members)
        a_ids = probes["a"].to_numpy()
        b_ids = members["b"].to_numpy()
        S[a_ids[:, None] == b_ids[None, :]] = -np.inf  # self-pairs out
        kk = min(k, S.shape[1])
        # per-row top-k by (sim desc, b asc): argsort a lexsort key
        order = np.lexsort((b_ids[None, :].repeat(len(a_ids), 0), -S), axis=1)[:, :kk]
        rows_a = np.repeat(a_ids, kk)
        rows_b = b_ids[order].ravel()
        rows_s = np.take_along_axis(S, order, axis=1).ravel()
        keep = np.isfinite(rows_s)
        return pd.DataFrame(
            {"a": rows_a[keep], "b": rows_b[keep], "sim": rows_s[keep]}
        )

    return score


def ivf_knn_join(
    df: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    scorer: str = "arrow",
) -> DataFrame:
    """IVF-bucketed approximate kNN join: score each vector only against
    vectors whose home cell is among its ``n_probe`` nearest cells.

    The N^2 cross join becomes an equi-join on ``cell`` — candidates per
    query drop from N to ~(n_probe/n_cells)·N, and the join shuffles on a
    partition-count-sized key. ``n_probe == n_cells`` degenerates to the
    exact :func:`knn_join` (the pytest equivalence anchor); recall at lower
    n_probe follows the usual IVF tradeoff.

    ``scorer``:

    * ``"arrow"`` (default) — cogroup probe and member sides by cell and
      score each cell with ONE normalized numpy matmul
      (``applyInPandas``), emitting per-cell top-k candidates; a final
      window picks the global top-k per query. Each member belongs to
      exactly one cell, so per-cell top-k union ⊇ global top-k — no recall
      loss vs scoring every pair. ~40x faster than the fold at sf0.1.
    * ``"fold"`` — JVM-side sequential-fold cosine on every joined pair;
      bit-identical to the DuckDB oracle folds, kept for parity checks.

    At 100 TB: write the vector table clustered by ``cell`` (repartition +
    sortWithinPartitions on cell at ingest) so the data side of this join is
    already co-located and only the probe side shuffles.
    """
    if scorer not in ("arrow", "fold"):
        raise ValueError(f"scorer must be 'arrow' or 'fold', got {scorer!r}")
    if centroids is None:
        centroids = train_ivf_centroids(df, n_cells, vec_col, id_col, seed=seed)
    data = add_ivf_cell(df, centroids, vec_col).select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "cell"
    )
    probes = (
        df.withColumn("__cells", _probe_cells_udf(centroids, n_probe)(F.col(vec_col)))
        .select(
            F.col(id_col).alias("a"),
            F.col(vec_col).alias("va"),
            F.explode("__cells").alias("cell"),
        )
    )
    return score_probes_against_cells(probes, data, k, dict(df.dtypes)[id_col], scorer)


def score_probes_against_cells(
    probes: DataFrame,
    data: DataFrame,
    k: int,
    id_type: str,
    scorer: str = "arrow",
) -> DataFrame:
    """Shared kNN-join tail: ``probes`` (a, va, cell — one row per probed
    cell) against ``data`` (b, vb, cell — each vector in its home cell),
    per-cell scoring, then a global top-k window per query. Used by both
    :func:`ivf_knn_join` (cells computed in-plan) and the persisted-index
    probe path (cells read from the index domain's partition layout)."""
    if scorer == "arrow":
        scored = (
            probes.groupBy("cell")
            .cogroup(data.groupBy("cell"))
            .applyInPandas(
                _cell_knn_cogroup(k), schema=f"a {id_type}, b {id_type}, sim double"
            )
        )
    else:
        scored = (
            probes.join(data, "cell")
            .filter(F.col("a") != F.col("b"))
            .select("a", "b", cosine_sim_col(F.col("va"), F.col("vb")).alias("sim"))
        )
    w = Window.partitionBy("a").orderBy(F.col("sim").desc(), F.col("b").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("a", "b", "sim", "rk")
    )
