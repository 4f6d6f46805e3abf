#!/usr/bin/env python
"""Empirical scale validation (round 4, VERDICT item 1): measure the
headline operators at 1x and ~10x sf0.1 and report the scaling ratio.

The 10x corpus is synthesized from $SPARK_GRAFT_SF_DIR (default sf0.1) by
unioning N id-shifted copies, materialized to parquet in a temp dir so
both runs read the same physical shape. Text columns are SALTED per copy
(a copy-tag token inserted between tokens) so cross-copy texts are
disjoint: without that, 10 identical copies of every document would add
C(10,2) duplicate pairs per doc — a quadratic duplicate explosion that
measures the synthetic corpus, not the operator. The 1x corpus goes
through the same transform (1 copy) so per-row cost is identical and the
ratio isolates pure scale.

For shuffle-bound operators the pass criterion is ~linear (ratio <= ~N x
with overheads amortizing); the persisted-index probe additionally
demonstrates the sublinear serving path: cells scale with the corpus, so
a probe reads a bounded number of cells regardless of corpus size.

Prints ONE JSON line:
  {"metric": "scale_ratio_10x", "copies": N,
   "entries": {name: {"t1": s, "tN": s, "ratio": r}}}

Run AFTER bench.py (idle machine) — ratios are wall-clock sensitive.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from elephantdb_spark import DomainSpec, Engine, build_domain, update_domain
from elephantdb_spark.session import get_spark

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_COPIES = int(os.environ.get("EDB_SCALE_COPIES", "10"))
NUM_SHARDS = 32
ID_SHIFT = 1_000_000_000


def _replicate(df, n, shift_cols, salt_cols=()):
    parts = []
    for i in range(n):
        p = df
        for c in shift_cols:
            p = p.withColumn(c, (F.col(c) + F.lit(i * ID_SHIFT)).alias(c))
        for c in salt_cols:
            p = p.withColumn(c, F.regexp_replace(F.col(c), " ", f" c{i}x "))
        parts.append(p)
    return reduce(lambda a, b: a.unionByName(b), parts)


def materialize(spark, n: int, base: str) -> dict[str, str]:
    """Write the n-copy corpus to parquet; returns table -> path."""
    out_dir = os.path.join(tempfile.gettempdir(), f"edb_scale_{n}x")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    def read(t):
        return spark.read.parquet(os.path.join(base, f"{t}.parquet"))

    plans = {
        "lineitem": _replicate(read("lineitem"), n, ["l_orderkey"]),
        "documents": _replicate(read("documents"), n, ["doc_id"], ["text"]),
        "events": _replicate(read("events"), n, ["event_id", "user_id"]),
        "embeddings": _replicate(read("embeddings"), n, ["vec_id"]),
    }
    paths = {}
    for t, df in plans.items():
        p = os.path.join(out_dir, f"{t}.parquet")
        # CPUS files for BOTH corpora: the tables are far below
        # maxPartitionBytes, so file count IS the scan parallelism — a
        # single-file 1x corpus would run every scan-stage op on one core
        # while the n-file Nx corpus gets n, inverting the ratios (the 1x
        # side measured 10-70x slower on scan-bound entries before this).
        df.repartition(CPUS).write.mode("overwrite").parquet(p)
        paths[t] = p
    return paths


def run_entries(spark, paths: dict[str, str], n: int, tag: str) -> dict[str, float]:
    timings: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix=f"edb_scale_work_{tag}_")
    eng = Engine(spark, work)

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)
                from elephantdb_spark.operators.dedup import release_shingle_caches

                release_shingle_caches()
                spark.catalog.clearCache()

        return _T()

    lineitem = spark.read.parquet(paths["lineitem"])
    documents = spark.read.parquet(paths["documents"])
    embeddings = spark.read.parquet(paths["embeddings"])

    li_kv = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("key"),
        F.col("l_extendedprice").cast("string").cast("binary").alias("value"),
    )
    with timed("build_lineitem_kv"):
        build_domain(spark, li_kv, eng.domain_root("li"),
                     DomainSpec(num_shards=NUM_SHARDS), version=1)

    batch = li_kv.limit(5000).withColumn("value", F.lit(b"updated"))
    with timed("incremental_update_5k"):
        update_domain(spark, batch, eng.domain_root("li"), version=2)

    from elephantdb_spark.operators.dedup import (
        jaccard_shingle_pairs,
        minhash_lsh_pairs,
    )

    with timed("minhash_lsh_documents"):
        minhash_lsh_pairs(documents, "doc_id", "text",
                          num_perm=32, bands=8, threshold=0.5).count()

    # the bench's near-dup fixture generalized: per-copy, the first 250
    # doc texts reappear under shifted ids with the first 11 chars cut
    neardup_corpus = documents.select("doc_id", "text").unionByName(
        documents.filter((F.col("doc_id") % ID_SHIFT) < 250).select(
            (F.col("doc_id") + 500_000_000_000).alias("doc_id"),
            F.expr("substring(text, 12)").alias("text"),
        )
    )
    with timed("neardup_pairgen"):
        jaccard_shingle_pairs(
            neardup_corpus, "doc_id", "text", shingle_len=3, threshold=0.5
        ).count()

    from elephantdb_spark.analytics import load_events, sessionize, ts_from_nanos

    events = load_events(spark, os.path.dirname(paths["events"]))
    with timed("event_sessionize"):
        sessionize(
            events, ts_from_nanos(F.col("ts")), ["user_id"],
            [F.count(F.lit(1)).alias("n")],
        ).count()

    from elephantdb_spark.operators.ann import ivf_topk, train_ivf_centroids

    qvec = [float(x) for x in
            embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    with timed("ann_ivf_topk"):
        cents = train_ivf_centroids(embeddings, n_cells=16)
        ivf_topk(embeddings, qvec, k=10, n_cells=16, n_probe=4,
                 centroids=cents).collect()

    # persisted index: n_cells scales WITH the corpus (the 100 TB sizing
    # rule), so the probe reads a bounded fraction — expect ~flat probe
    # time across scales, ~linear build time
    from elephantdb_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_probe,
    )

    idx_root = os.path.join(work, "ivf_idx")
    with timed("ann_index_build"):
        build_ivf_index(spark, embeddings, idx_root, n_cells=16 * n, version=1)
    with timed("ann_index_probe"):
        ivf_index_probe(spark, idx_root, qvec, k=10, n_probe=4).collect()

    # curation stages (r4): rowwise scan ops should scale ~linearly with
    # zero shuffle; cap_per_source must stay ~linear even though the hot
    # 'big' source grows 10x (the threshold prefilter bounds its window)
    from elephantdb_spark.operators.curation import (
        build_vocab,
        cap_per_source,
        encode_documents,
        gopher_filter,
        normalize_text,
    )

    with timed("curation_normalize_gopher"):
        gopher_filter(
            normalize_text(documents, "text"), "doc_id", "text"
        ).agg(F.sum(F.col("kept").cast("long"))).collect()
    skew_docs = documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("big"))
        .otherwise(F.col("source")).alias("source"),
    )
    with timed("curation_cap_per_source"):
        cap_per_source(skew_docs, "doc_id", "source", cap=100, salt="b").count()
    with timed("curation_vocab_encode"):
        vocab = build_vocab(documents, "text", min_count=2, max_size=5000)
        encode_documents(documents, "doc_id", "text", vocab).count()

    from elephantdb_spark.operators.retrieval import bm25_topk

    queries_df = spark.createDataFrame(
        [(1, "spark shuffle join window"), (2, "hash table scan"),
         (3, "stream batch data pipeline"), (4, "vector merge sort")],
        "query_id int, query_text string",
    )
    with timed("bm25_search"):
        bm25_topk(documents, queries_df, "doc_id", "text", k=10).count()

    from elephantdb_spark.operators.dedup import strip_duplicate_lines

    with timed("strip_duplicate_lines"):
        strip_duplicate_lines(documents, "doc_id", "text").agg(
            F.sum("n_lines_removed")
        ).collect()

    shutil.rmtree(work, ignore_errors=True)
    return timings


def main() -> None:
    spark = get_spark(app_name="edb-scale", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sparkContext.setLogLevel("ERROR")

    p1 = materialize(spark, 1, BASE_SF)
    pn = materialize(spark, N_COPIES, BASE_SF)
    # warm code paths on the 1x corpus, then measure 1x, then Nx
    run_entries(spark, p1, 1, "warm")
    t1 = run_entries(spark, p1, 1, "x1")
    tn = run_entries(spark, pn, N_COPIES, "xN")

    entries = {
        k: {
            "t1": t1[k],
            f"t{N_COPIES}": tn[k],
            "ratio": round(tn[k] / t1[k], 2) if t1[k] > 0 else None,
        }
        for k in t1
    }
    print(json.dumps({
        "metric": f"scale_ratio_{N_COPIES}x",
        "copies": N_COPIES,
        "base": BASE_SF,
        "entries": entries,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
