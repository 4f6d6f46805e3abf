"""Deterministic sampling and sequence packing for training-data pipelines.

Every op here is *hash-deterministic*: no RNG state, so results are
reproducible across engines, reruns, task retries, and cluster sizes —
the property a 100 TB corpus pipeline actually needs (a `rand()` sample
changes under Spark task retry; an md5-threshold sample never does).
md5 (not xxhash64) is the hash on purpose: every engine computes the same
bytes, so each operator has an exact cross-engine SQL oracle.

* :func:`deterministic_sample` — Bernoulli(rate) by md5 threshold. A pure
  rowwise filter: zero shuffles, pipelines into any scan.
* :func:`stratified_sample` — exactly ``n`` rows per group (fewer when the
  group is smaller), chosen by hash order so the choice is stable. One
  shuffle on the group key.
* :func:`split_corpus` — train/val/test labels by hash range: a document's
  split depends only on its id, so membership survives corpus re-builds.
  Zero shuffle.
* :func:`mix_corpus` — per-source downsampling to token budgets (data
  mixing): a tiny per-source totals aggregate broadcast into the same
  md5-threshold filter. The corpus never shuffles.
* :func:`shuffle_assignments` / :func:`write_shuffled_export` — a
  reproducible global shuffle into ``num_files`` balanced training
  shards: ``file_id = hash % num_files``, in-file order by (hash, id).
  One shuffle; files balance by hash uniformity, and the same corpus +
  salt always produces the identical epoch order (``orderBy(rand())``
  does not survive a task retry, let alone a re-run).
* :func:`pack_sequences` — greedy contiguous sequence packing: assign each
  document to a token bin of ``capacity`` within its group, filling bins
  in id order (the LLM pre-training batch-packing shape). One shuffle on
  the group key; packing is embarrassingly parallel across groups, which
  is exactly how it distributes at scale (pack per language/source/shard,
  never globally — a global pack would serialize the corpus through one
  task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Hash values are uniform in [0, 2^32): the first 8 md5 hex chars.
_HASH_SPACE = 1 << 32


def _md5_u32(col: Column, salt: str) -> Column:
    """First 32 bits of md5(str(col) || salt) as a bigint in [0, 2^32).
    DuckDB twin: ``CAST('0x' || substr(md5(expr || salt), 1, 8) AS UBIGINT)``."""
    s = F.concat(col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 1, 8), 16, 10).cast("bigint")


def duckdb_md5_u32_sql(expr: str, salt: str) -> str:
    """The DuckDB expression computing the identical 32-bit hash."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || '{salt}'), 1, 8) AS UBIGINT)"


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff hash(id, salt) < rate·2^32 — a reproducible
    Bernoulli sample.

    Pure filter: no shuffle, no RNG, stable under task retries and
    re-runs; disjoint salts give independent samples (train/held-out
    splits). At 100 TB this composes with any scan at zero plan cost.
    """
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _HASH_SPACE)
    return df.filter(_md5_u32(F.col(id_col), salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n_per_group: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``n`` rows per group: rank rows inside each group by
    (hash, id) and keep the first ``n``. Balanced corpora across
    languages/sources/domains without a global sort.

    One shuffle on the group key. The per-group window task holds one
    group; groups are the unit of parallelism, so this is safe whenever
    no single group dominates the corpus — for the billion-row-group case
    apply :func:`deterministic_sample` first to thin the group below task
    size, then stratify (composition stays deterministic).
    """
    if n_per_group <= 0:
        raise ValueError(f"n_per_group must be positive, got {n_per_group}")
    w = Window.partitionBy(*group_cols).orderBy(
        _md5_u32(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_group)
        .drop("__rk")
    )


def mix_corpus(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count_col: Column | str,
    budgets: dict[str, int],
    salt: str = "",
) -> DataFrame:
    """Data mixing: deterministically downsample each source to (in
    expectation) its token budget. A source with ``total_tokens_s`` gets
    keep-rate ``min(1, budget_s / total_tokens_s)``; rows are kept by the
    same md5-threshold rule as :func:`deterministic_sample`, so the mix
    is reproducible and a document's membership is stable as long as its
    source's rate is. Sources absent from ``budgets`` are dropped
    (mixing is an explicit allocation, not a default-keep).

    Two-pass, both cheap at 100 TB: one map-side-combinable aggregation
    to per-source token totals (rows = number of sources), broadcast
    back into the rowwise threshold filter. The corpus itself never
    shuffles.
    """
    if not budgets:
        raise ValueError("budgets must be non-empty")
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {b}")
    toks = (
        F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    )
    totals = df.groupBy(source_col).agg(F.sum(toks).alias("__total"))
    budget_map = F.create_map(
        *[F.lit(x) for s, b in budgets.items() for x in (s, float(b))]
    )
    budget = budget_map[F.col(source_col)]
    rate = F.when(
        budget.isNull() | (F.col("__total") <= 0), F.lit(0.0)
    ).otherwise(F.least(F.lit(1.0), budget / F.col("__total").cast("double")))
    threshold = F.floor(rate * F.lit(float(_HASH_SPACE))).cast("bigint")
    return (
        df.join(F.broadcast(totals), source_col)
        .filter(_md5_u32(F.col(id_col), salt) < threshold)
        .drop("__total")
    )


def split_corpus(
    df: DataFrame, id_col: str, splits: dict[str, float], salt: str = ""
) -> DataFrame:
    """Assign every row a ``split`` label (train/val/test/...) by hash
    range: row goes to the first split whose cumulative probability
    exceeds ``hash(id, salt) / 2^32``. Fractions must sum to 1.

    Pure rowwise expression — zero shuffle, stable under retries, and a
    document keeps its split across corpus re-builds (membership depends
    only on its id), which is what keeps eval sets uncontaminated when
    the corpus grows. The last split absorbs the (sub-2^-32) rounding
    remainder so every row is labeled.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = _md5_u32(F.col(id_col), salt)
    names = list(splits)
    cum = 0.0
    chain = None
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(int(cum * _HASH_SPACE))
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    label = F.lit(names[-1]) if chain is None else chain.otherwise(F.lit(names[-1]))
    return df.withColumn("split", label)


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    token_count_col: Column | str,
    capacity: int,
) -> DataFrame:
    """Greedy contiguous sequence packing: within each group, walk
    documents in ``id_col`` order accumulating token counts; a document's
    bin is ``floor(tokens_before_it / capacity)`` — bins fill to at least
    ``capacity`` before the next one starts (the last document of a bin
    may overflow it; LLM packing truncates or bridges at the consumer).

    Output: input columns + ``bin`` (0-based within group) +
    ``bin_offset`` (the document's token start inside its bin's stream).
    One shuffle on the group key; each group packs independently — the
    scale unit is the group, never the corpus.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    toks = (
        F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(toks).over(w), F.lit(0).cast("long"))
    return df.select(
        "*",
        F.floor(before / F.lit(capacity)).cast("long").alias("bin"),
        (before % F.lit(capacity)).cast("long").alias("bin_offset"),
    )


def shuffle_assignments(
    df: DataFrame, id_col: str, num_files: int, salt: str = ""
) -> DataFrame:
    """Deterministic global shuffle: assign every row a ``file_id`` in
    ``[0, num_files)`` and a 1-based ``pos`` within its file, such that
    (file_id, pos) is a pseudo-random permutation of the corpus that is a
    pure function of (id, salt, num_files).

    Training-data export wants a global shuffle (decorrelate neighboring
    source documents) that is *reproducible*: the same corpus + seed must
    yield byte-identical epoch order across reruns, task retries, and
    engines — ``orderBy(rand())`` gives none of that. Here
    ``file_id = hash(id, salt) % num_files`` and ``pos`` ranks by
    ``(hash, id)`` inside the file, so the permutation is md5-determined.

    One shuffle (on ``file_id``) + per-file sort. Files are balanced by
    hash uniformity — no sampled range boundaries (``repartitionByRange``
    samples, breaking determinism). At 100 TB: size
    ``num_files ≈ corpus_bytes / 512 MB``; each window task sorts one
    file's worth (~512 MB), never the corpus. Disjoint salts give
    independent epoch orders.
    """
    if num_files <= 0:
        raise ValueError(f"num_files must be positive, got {num_files}")
    # materialize the hash once (r18): file_id lives in a Project and the
    # window sort key in a Window operator — separate operators, so the
    # inline form computed the md5 twice per row (write_shuffled_export
    # already carried __h for the same reason)
    h = _md5_u32(F.col(id_col), salt)
    with_file = df.withColumn("__sa_h", h).withColumn(
        "file_id", F.pmod(F.col("__sa_h"), F.lit(num_files)).cast("int")
    )
    w = Window.partitionBy("file_id").orderBy(
        F.col("__sa_h").asc(), F.col(id_col).asc()
    )
    return with_file.withColumn("pos", F.row_number().over(w)).drop("__sa_h")


def write_shuffled_export(
    spark,
    df: DataFrame,
    out_dir: str,
    id_col: str,
    num_files: int,
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Materialize :func:`shuffle_assignments` order to disk: one
    ``file=<i>/`` directory per file, rows stored in shuffle order (the
    on-disk row order IS the training order — no ``pos`` column needed).

    Exact 1:1 file→partition placement (the build path's
    ``exact_partition_slots`` trick) then an in-partition sort on
    ``(hash, id)``: one exchange, one sort, a partitioned write — the
    same single-shuffle shape as a KV domain build.
    """
    from elephantdb_spark.sharding import with_slot_column

    h = _md5_u32(F.col(id_col), salt)
    assigned = df.withColumn("file", F.pmod(h, F.lit(num_files)).cast("int")).withColumn(
        "__h", h
    )
    (
        with_slot_column(spark, assigned, num_files, shard_col_name="file")
        .repartition(num_files, F.col("__slot"))
        .sortWithinPartitions("file", "__h", id_col)
        .drop("__slot", "__h")
        .write.mode("errorifexists")
        .partitionBy("file")
        .format(fmt)
        .save(out_dir)
    )
