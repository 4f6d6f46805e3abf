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


def _neardup_corpus(documents):
    """The shared near-dup fixture: per copy, the first 250 doc texts
    reappear under shifted ids with the first 11 chars cut. Used by both
    the pairgen/minhash timed entries and the recall measurement — one
    definition, so a tuning change cannot silently desynchronize the
    corpus the recall number was measured on."""
    return documents.select("doc_id", "text").unionByName(
        documents.filter((F.col("doc_id") % ID_SHIFT) < 250).select(
            (F.col("doc_id") + 500_000_000_000).alias("doc_id"),
            F.expr("substring(text, 12)").alias("text"),
        )
    )


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

    # bulk enrichment (r5): whole fact table probed against its domain —
    # probe exchange + per-task shard reads; expect ~linear (both sides
    # grow together, per-task work = probe_rows/shards + shard size)
    li_dom = eng.domain("li")
    li_probe = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("k")
    )
    # untimed worker warm: bulk_join is mapInPandas-backed; the m=4
    # entry runs CPUS concurrent python tasks and a cold fan-out would
    # bill ~1 s/worker of staggered imports (+ the one-time post-fork
    # JVM penalty) to whichever bulk_join entry runs first — the r5
    # fork-storm lesson applied to this section
    wdf0 = lineitem.select("l_orderkey").limit(50000).repartition(CPUS)
    wdf0.mapInPandas(lambda it: it, "l_orderkey long").count()
    lineitem.groupBy("l_linestatus").count().collect()  # absorb storm

    with timed("bulk_join_fact"):
        li_dom.bulk_join(li_probe, "k").agg(
            F.sum(F.col("value").isNotNull().cast("long"))
        ).collect()

    # sub-shard parallelism (r6, VERDICT r5 item 2): an 8-shard domain —
    # the parallelism-starved shape a 100 TB fact probing a small serving
    # domain hits — with and without tasks_per_shard=4. m1 is capped at
    # 8 tasks on 32 cores; m4 runs 32 row-group-sliced tasks. The m4/m1
    # gap should WIDEN at 10x (per-task probe slice grows 10x at m1).
    # 1 MiB parquet blocks: the default 128 MB block makes a bench-scale
    # shard ONE row group (no cut points — m>1 degenerates to overhead);
    # production shards are GBs with many row groups, which this
    # reproduces (~5 rgs/shard at 1x, ~50 at 10x)
    build_domain(spark, li_kv, eng.domain_root("li8"),  # untimed fixture
                 DomainSpec(num_shards=8,
                            persistence_opts={"parquet.block.size": 1 << 20}),
                 version=1)
    li8 = eng.domain("li8")
    with timed("bulk_join_8shard_m1"):
        # pinned m=1: the deliberately-starved shape (r7 made the
        # DEFAULT auto-select, so this entry must opt out explicitly)
        li8.bulk_join(li_probe, "k", tasks_per_shard=1).agg(
            F.sum(F.col("value").isNotNull().cast("long"))
        ).collect()
    with timed("bulk_join_8shard_m4"):
        li8.bulk_join(li_probe, "k", tasks_per_shard=4).agg(
            F.sum(F.col("value").isNotNull().cast("long"))
        ).collect()
    with timed("bulk_join_8shard_auto"):
        # the r7 DEFAULT: m auto-selected from the Catalyst probe-size
        # estimate (memory + parallelism arms) — should track the best
        # manual m above once the probe outgrows BULK_MIN_ROWS_PER_TASK
        li8.bulk_join(li_probe, "k").agg(
            F.sum(F.col("value").isNotNull().cast("long"))
        ).collect()

    # concurrent serving (r6, VERDICT r5 item 5): fixed 8x10x100-key load
    # against the Nx domain — the probe is row-group-pruned + batch-
    # streamed, so time should stay ~flat as the domain grows 10x
    import threading as _threading

    li_keys = [
        f"{r.l_orderkey}-{r.l_linenumber}".encode()
        for r in lineitem.select("l_orderkey", "l_linenumber")
        .limit(800).collect()
    ]

    def _serve_worker(tid, errs):
        try:
            batch = li_keys[tid * 100:(tid + 1) * 100]
            for _ in range(10):
                li_dom.local_multi_get(batch)
        except BaseException as e:
            errs.append(e)

    with timed("local_multiget_concurrent_8t"):
        errs: list[BaseException] = []
        ths = [
            _threading.Thread(target=_serve_worker, args=(t, errs))
            for t in range(8)
        ]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        if errs:
            raise errs[0]

    from elephantdb_spark.operators.dedup import (
        jaccard_shingle_pairs,
        minhash_lsh_pairs,
    )

    with timed("minhash_lsh_documents"):
        minhash_lsh_pairs(documents, "doc_id", "text",
                          num_perm=32, bands=8, threshold=0.5).count()

    neardup_corpus = _neardup_corpus(documents)
    with timed("neardup_pairgen"):
        jaccard_shingle_pairs(
            neardup_corpus, "doc_id", "text", shingle_len=3, threshold=0.5
        ).count()

    # incremental near-dup vs persisted signature history (r6, q104):
    # build = ONE corpus text pass + two single-shuffle domain builds —
    # ~linear; probe = batch signatures + two bulk_joins whose history
    # side never shuffles (tasks pyarrow-read their shards), so probe
    # cost is O(batch) + per-task shard reads — both sides grow with n,
    # expect ~linear, never super-linear
    from elephantdb_spark.extensions import _neardup_history_batch
    from elephantdb_spark.operators.neardup_history import (
        build_neardup_history,
        filter_against_neardup_history,
    )

    nd_root = eng.domain_root("neardup_history")
    with timed("neardup_history_build"):
        build_neardup_history(
            spark, documents, nd_root, "doc_id", "text",
            spec=DomainSpec(num_shards=NUM_SHARDS), version=1,
        )
    with timed("neardup_history_probe"):
        filter_against_neardup_history(
            spark, _neardup_history_batch(documents), nd_root,
            "doc_id", "text", cache_sigs=False,
        ).agg(F.sum(F.col("is_neardup").cast("long"))).collect()

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

    # BPE (r6, VERDICT r5 item 5): the round-0 pair aggregation and the
    # full driver-fast-path training run — both dominated by the ONE
    # corpus-sized pass, so ~linear; the in-memory merge loop is
    # corpus-size-independent (vocab-bounded)
    from elephantdb_spark.operators.bpe import (
        apply_bpe,
        initial_pair_counts,
        train_bpe,
    )

    with timed("bpe_pair_counts"):
        initial_pair_counts(documents, "text").orderBy(
            F.col("count").desc(), "a", "b"
        ).limit(20).collect()

    with timed("bpe_encode"):
        apply_bpe(
            documents, "doc_id", "text",
            [("e", "s"), ("es", "t"), ("t", "h"), ("th", "e"), ("i", "n")],
        ).agg(F.sum("n_bpe_tokens")).collect()

    with timed("bpe_train_1k"):
        train_bpe(documents, "text", 1000, min_pair_count=1)

    # --- round-5: the mapInPandas-heavy round-4 operators (VERDICT r4
    # item 2). Untimed worker warm first: a cold fan-out pays ~1 s/worker
    # of numpy/pandas import (staggered), which at CPUS=32 would bill
    # ~0.5-1 min of pure import to the FIRST wide python entry at 1x and
    # make its 10x ratio look absurdly sub-linear (warm at 10x). Warmed,
    # the ratios measure the per-byte slope.
    wdf = documents.select("doc_id").repartition(CPUS)
    for _ in range(3):  # fused chain stages each hold their own worker
        wdf = wdf.mapInPandas(lambda it: it, "doc_id long")
    wdf.count()
    # sacrificial JVM job: the first fork storm degrades the NEXT JVM
    # job ~7-8 s one time (see bench.py warm_python_workers) — absorb
    # it here so the first timed entry below measures the operator
    lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()

    from elephantdb_spark.operators.dedup import repeated_span_profile

    with timed("repeated_span_profile"):
        repeated_span_profile(
            neardup_corpus, "doc_id", "text", gram_chars=40, stride=20
        ).agg(F.sum("n_hot_spans")).collect()

    from elephantdb_spark.operators.html import extract_html_text
    from elephantdb_spark.sources.warc import build_warc, warc_records_df

    def _gen_warcs(batches):
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                html = "<html><body><p>" + str(text) + "</p></body></html>"
                payloads.append(build_warc([
                    {"warc_type": "warcinfo", "block": b"i\r\n"},
                    {"warc_type": "response",
                     "target_uri": f"http://ex.com/{did}",
                     "block": b"HTTP/1.1 200 OK\r\n\r\n" + html.encode()},
                ]))
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "warc": payloads})

    docs_rep = documents.select("doc_id", "text").repartition(CPUS)
    with timed("warc_ingest_chain"):
        recs = warc_records_df(
            docs_rep.mapInPandas(_gen_warcs, "doc_id long, warc binary"),
            "doc_id", "warc",
        )
        extract_html_text(
            recs.select(F.col("id").alias("doc_id"),
                        F.decode(F.col("body"), "UTF-8").alias("html")),
            "doc_id", "html",
        ).agg(F.sum(F.length("text"))).collect()

    # html-only (no WARC layer): isolates the parser slope
    def _gen_html(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "html": ["<html><head><title>t</title></head><body><p>"
                         + str(t) + "</p></body></html>" for t in pdf["text"]],
            })

    with timed("html_text_extraction"):
        extract_html_text(
            docs_rep.mapInPandas(_gen_html, "doc_id long, html string"),
            "doc_id", "html",
        ).agg(F.sum(F.length("text"))).collect()

    from elephantdb_spark.operators.multimodal import (
        MULTIMODAL_SCHEMA,
        resize_images,
        sample_frames_df,
    )

    def _gen_jpegs(batches):
        import numpy as _np
        import pandas as _pd

        from elephantdb_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            payloads = []
            for n in pdf["n_chars"]:
                n = int(n)
                w, h = n % 32 + 1, n % 16 + 1
                ys, xs = _np.mgrid[0:h, 0:w]
                arr = _np.stack(
                    [_np.clip(xs * 3 + ys * 2 + 40 * i, 0, 255)
                     for i in range(3)], -1
                ).astype(_np.uint8)
                payloads.append(encode_jpeg(arr, quality=85))
            yield _pd.DataFrame({
                "id": pdf["doc_id"], "payload": payloads,
                "meta": [{"media_type": "image/jpeg", "lang": None,
                          "source": "synth"}] * len(pdf),
            })

    def _gen_gifs(batches):
        import pandas as _pd

        from elephantdb_spark.operators.gif import synth_gif

        for pdf in batches:
            yield _pd.DataFrame({
                "id": pdf["doc_id"],
                "payload": [
                    synth_gif(int(n) % 16 + 4, int(n) % 8 + 4, int(n) % 8 + 2)
                    for n in pdf["n_chars"]
                ],
                "meta": [{"media_type": "image/gif", "lang": None,
                          "source": "synth"}] * len(pdf),
            })

    docs_nc = documents.select("doc_id", "n_chars").repartition(CPUS)
    with timed("jpeg_roundtrip_resize"):
        resize_images(
            docs_nc.mapInPandas(_gen_jpegs, MULTIMODAL_SCHEMA), 16, 16
        ).agg(F.sum(F.length("payload"))).collect()

    with timed("gif_frame_sampling"):
        sample_frames_df(
            docs_nc.mapInPandas(_gen_gifs, MULTIMODAL_SCHEMA), every_n=2
        ).count()

    # MJPEG-AVI sampled-frame decode (r6, VERDICT r5 item 5): RIFF walk
    # + every-2nd-frame baseline-JPEG decode, pure per-row python —
    # expect ~linear with corpus size
    def _gen_avis(batches):
        import pandas as _pd

        from elephantdb_spark.operators.avi import synth_avi

        for pdf in batches:
            yield _pd.DataFrame({
                "id": pdf["doc_id"],
                "payload": [
                    synth_avi(int(n) % 16 + 8, int(n) % 8 + 8, int(n) % 6 + 2)
                    for n in pdf["n_chars"]
                ],
                "meta": [{"media_type": "video/x-msvideo", "lang": None,
                          "source": "synth"}] * len(pdf),
            })

    with timed("avi_frame_sampling"):
        sample_frames_df(
            docs_nc.mapInPandas(_gen_avis, MULTIMODAL_SCHEMA), every_n=2
        ).count()

    from elephantdb_spark.operators.sampling import write_shuffled_export

    export_dir = os.path.join(work, "export")
    with timed("shuffled_export_write"):
        write_shuffled_export(spark, documents, export_dir, "doc_id",
                              16 * n, "ep0")

    shutil.rmtree(work, ignore_errors=True)
    return timings


def run_scale_critical(spark, paths: dict[str, str], n: int, tag: str) -> dict:
    """VERDICT r6 item 6: a ≥30× spot-check of the TWO probes whose
    design carries the 100 TB scale argument — the auto-tuned bulk_join
    (does the default plan keep per-task memory bounded and parallelism
    provisioned as the probe grows?) and the neardup-history probe (two
    bulk_joins whose history side never shuffles). Fixtures are built
    untimed; returns timings plus the auto-chosen tasks_per_shard as
    provenance."""
    timings: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix=f"edb_scale_crit_{tag}_")
    eng = Engine(spark, work)

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)
                from elephantdb_spark.operators.dedup import (
                    release_shingle_caches,
                )

                release_shingle_caches()
                spark.catalog.clearCache()

        return _T()

    lineitem = spark.read.parquet(paths["lineitem"])
    documents = spark.read.parquet(paths["documents"])
    li_kv = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("key"),
        F.col("l_extendedprice").cast("string").cast("binary").alias("value"),
    )
    build_domain(spark, li_kv, eng.domain_root("li8"),  # untimed fixture
                 DomainSpec(num_shards=8,
                            persistence_opts={"parquet.block.size": 1 << 20}),
                 version=1)
    li8 = eng.domain("li8")
    li_probe = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("k")
    )
    # untimed python-worker warm + sacrificial JVM job (the fork-storm
    # lesson — see run_entries)
    wdf = lineitem.select("l_orderkey").limit(50000).repartition(CPUS)
    wdf.mapInPandas(lambda it: it, "l_orderkey long").count()
    lineitem.groupBy("l_linestatus").count().collect()

    auto_m = li8._auto_tasks_per_shard(li_probe)
    with timed("bulk_join_8shard_auto"):
        li8.bulk_join(li_probe, "k").agg(
            F.sum(F.col("value").isNotNull().cast("long"))
        ).collect()

    from elephantdb_spark.extensions import _neardup_history_batch
    from elephantdb_spark.operators.neardup_history import (
        build_neardup_history,
        filter_against_neardup_history,
    )

    nd_root = eng.domain_root("neardup_history")
    build_neardup_history(  # untimed fixture
        spark, documents, nd_root, "doc_id", "text",
        spec=DomainSpec(num_shards=NUM_SHARDS), version=1,
    )
    with timed("neardup_history_probe"):
        filter_against_neardup_history(
            spark, _neardup_history_batch(documents), nd_root,
            "doc_id", "text", cache_sigs=False,
        ).agg(F.sum(F.col("is_neardup").cast("long"))).collect()

    shutil.rmtree(work, ignore_errors=True)
    timings["_auto_tasks_per_shard"] = auto_m
    return timings


def run_scale_serving(spark, paths: dict[str, str], n: int, tag: str) -> dict:
    """VERDICT r6 item 2 done-criterion: re-measure the FIXED 8x10x100-key
    concurrent serving workload as the domain grows Nx, now that
    ``local_multi_get`` bisects a cached per-file row-group (min,max)
    bound array instead of walking O(num_row_groups) Thrift stats per
    probe per file. The domain fixture matches ``run_entries`` (32-shard
    lineitem KV); the workload is identical at 1x and Nx, so the ratio
    isolates per-probe cost vs domain depth. Timed min-of-3 passes per
    phase (the r7 de-noising protocol) — the first untimed pass also
    absorbs handle-open/bound-build cost, which is once-per-file-ever."""
    import threading as _threading

    timings: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix=f"edb_scale_serve_{tag}_")
    eng = Engine(spark, work)

    lineitem = spark.read.parquet(paths["lineitem"])
    li_kv = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("key"),
        F.col("l_extendedprice").cast("string").cast("binary").alias("value"),
    )
    # EDB_SCALE_BLOCK (bytes) pins the parquet row-group cap below the
    # serving default — the same trick as the bulk_join li8 fixture: at
    # bench scale a 32-shard lineitem slice is far below one 16 MiB
    # group, so reproducing the production many-row-group shard shape
    # needs a sub-scale cap (1 MiB ≈ a 1 GB production shard's 64-group
    # layout at 1/1000 the bytes)
    popts = {}
    blk = os.environ.get("EDB_SCALE_BLOCK")
    if blk:
        popts["parquet.block.size"] = int(blk)
    build_domain(spark, li_kv, eng.domain_root("li"),  # untimed fixture
                 DomainSpec(num_shards=NUM_SHARDS, persistence_opts=popts),
                 version=1)
    li_dom = eng.domain("li")

    li_keys = [
        f"{r.l_orderkey}-{r.l_linenumber}".encode()
        for r in lineitem.select("l_orderkey", "l_linenumber")
        .limit(800).collect()
    ]

    def _serve_worker(tid, errs):
        try:
            batch = li_keys[tid * 100:(tid + 1) * 100]
            for _ in range(10):
                li_dom.local_multi_get(batch)
        except BaseException as e:
            errs.append(e)

    def _one_pass() -> float:
        errs: list[BaseException] = []
        ths = [
            _threading.Thread(target=_serve_worker, args=(t, errs))
            for t in range(8)
        ]
        t0 = time.perf_counter()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        if errs:
            raise errs[0]
        return time.perf_counter() - t0

    _one_pass()  # untimed warm: file handles + bound arrays built here
    timings["local_multiget_concurrent_8t"] = round(
        min(_one_pass() for _ in range(3)), 3
    )
    # layout provenance: the default-cap curve's shape is explained by
    # groups-per-shard (flat only once groups >> keys-per-shard-per-batch)
    rep = li_dom.layout_report()
    timings["_max_row_groups_per_shard"] = max(
        (s["row_groups"] for s in rep["shards"].values() if s["present"]),
        default=0,
    )
    shutil.rmtree(work, ignore_errors=True)
    return timings


def run_scale_fanout(spark) -> dict:
    """Serving cross-shard fanout: the win must GROW with shard count
    AT CONSTANT PER-SHARD WORK (the 100 TB shape: more shards of the
    same size, a scattered batch touches more of them).

    A multiGet batch over S shards costs the SUM of per-shard probes
    serially but ~ceil(S/width)·max fanned out (keyval/core.clj:
    118-134). Fixture: lineitem KV at (8 shards, 1× corpus) vs
    (64 shards, 8× corpus) — per-shard bytes identical — with the
    DEFAULT 16 MiB layout (per-shard work is one C-side group decode,
    which releases the GIL; a deliberately shredded 64 KiB layout makes
    the probe Python-overhead-bound and fanout measures ~1×, an honest
    negative recorded in SCALE.md) and the decoded-group cache
    DISABLED so every pass pays the decode. One caller thread,
    1000-key scattered batch, min-of-5 warm passes per point."""
    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="edb_scale_fanout_")
    eng = Engine(spark, work)
    from elephantdb_spark.engine import Domain

    base = spark.read.parquet(os.path.join(BASE_SF, "lineitem.parquet"))
    keys = [
        f"{r.l_orderkey}-{r.l_linenumber}".encode()
        for r in base.select("l_orderkey", "l_linenumber")
        .limit(1000).collect()
    ]
    # cache disabled so EVERY pass pays the cold probe; with the default
    # 16 MiB layout the uncached path is still the whole-group C decode
    # (SERVING_BULK_DECODE_MAX), i.e. exactly the work a 100 TB domain's
    # scattered batch pays per shard — and the work fanout parallelizes
    for shards, copies in ((8, 1), (64, 8)):
        paths = materialize(spark, copies, BASE_SF)
        li_kv = spark.read.parquet(paths["lineitem"]).select(
            F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
            .cast("binary").alias("key"),
            F.col("l_extendedprice").cast("string").cast("binary")
            .alias("value"),
        )
        name = f"li{shards}"
        build_domain(
            spark, li_kv, eng.domain_root(name),
            DomainSpec(num_shards=shards,
                       persistence_opts={"serving_cache_bytes": 0}),
            version=1,
        )
        point = {}
        for mode, width in (("serial", 1), ("fanout8", 8)):
            dom = Domain(spark, eng.domain_root(name))
            dom._fanout_threads = width
            dom.local_multi_get(keys)  # untimed warm: handles + bounds
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                dom.local_multi_get(keys)
                best = min(best, time.perf_counter() - t0)
            point[mode] = round(best, 4)
            point[mode + "_raw"] = best
        # ratio from the RAW floats: a fanout8 best under ~50 µs rounds
        # to 0.0 and a ratio over rounded values would divide by zero
        point["win"] = round(
            point.pop("serial_raw") / max(point.pop("fanout8_raw"), 1e-9), 2
        )
        point["copies"] = copies
        out[f"shards{shards}"] = point
    shutil.rmtree(work, ignore_errors=True)
    return out


def run_scale_bloom_miss(spark, paths: dict[str, str], n: int, tag: str) -> dict:
    """VERDICT r7 item 2: measure the Bloom-sidecar miss win where it is
    STRUCTURAL. An in-range miss (the key falls inside some row group's
    (min,max) bounds) pays that group's decode on the plain path, and
    group size grows with the domain toward the 16 MiB serving cap —
    while a sidecar "no" stays O(1) in memory regardless of scale. So the
    FIXED 1000-key miss workload should cost ~flat with bloom and ~Nx
    without. Default serving layout (no block-size override): at sf0.1 a
    32-shard lineitem slice is one small group, at Nx the same shard is
    one Nx-bigger group — exactly the shape bloom.py's docstring argues
    from. Misses are "orderkey-8" keys: linenumber stops at 7, so the key
    never exists but sorts between real keys (bound index cannot exclude
    it)."""
    timings: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix=f"edb_scale_bloom_{tag}_")
    eng = Engine(spark, work)
    lineitem = spark.read.parquet(paths["lineitem"])
    li_kv = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("key"),
        F.col("l_extendedprice").cast("string").cast("binary").alias("value"),
    )
    build_domain(spark, li_kv, eng.domain_root("li_plain"),  # untimed
                 DomainSpec(num_shards=NUM_SHARDS), version=1)
    build_domain(spark, li_kv, eng.domain_root("li_bloom"),  # untimed
                 DomainSpec(num_shards=NUM_SHARDS,
                            persistence_opts={"bloom_fpp": 0.01}),
                 version=1)
    plain = eng.domain("li_plain")
    bloom = eng.domain("li_bloom")
    miss_keys = sorted({
        f"{r.l_orderkey}-8".encode()
        for r in lineitem.select("l_orderkey").limit(1100).collect()
    })[:1000]

    for name, dom in [("miss_plain", plain), ("miss_bloom", bloom)]:
        got = dom.local_multi_get(miss_keys)  # untimed warm: handles+bounds
        assert all(v is None for v in got.values())
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            dom.local_multi_get(miss_keys)
            t = time.perf_counter() - t0
            best = min(best, t) if best is not None else t
        timings[name] = round(best, 3)
    shutil.rmtree(work, ignore_errors=True)
    return timings


def measure_lsh_recall(spark, paths: dict[str, str]) -> dict:
    """VERDICT r4 item 6: recall/precision of the MinHash-LSH scale tier
    vs the exact Jaccard tier at the production banding (32 perm,
    8 bands, threshold 0.6) on the Nx corpus. The exact tier is the
    ground truth BY CONSTRUCTION (it enumerates every candidate pair
    above the shingle-Jaccard threshold); LSH loses a true pair only
    when no band collides (the probabilistic miss this measures) and
    adds none (its verify join recomputes exact Jaccard)."""
    from elephantdb_spark.operators.dedup import (
        jaccard_shingle_pairs,
        minhash_lsh_pairs,
        release_shingle_caches,
    )

    documents = spark.read.parquet(paths["documents"])
    corpus = _neardup_corpus(documents)
    truth = {
        (r["a"], r["b"])
        for r in jaccard_shingle_pairs(
            corpus, "doc_id", "text", shingle_len=3, threshold=0.6
        ).collect()
    }
    got = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(
            corpus, "doc_id", "text", num_perm=32, bands=8, threshold=0.6
        ).collect()
    }
    release_shingle_caches()
    tp = len(truth & got)
    return {
        "true_pairs": len(truth),
        "lsh_pairs": len(got),
        "recall": round(tp / len(truth), 4) if truth else None,
        "precision": round(tp / len(got), 4) if got else None,
    }


def main() -> None:
    spark = get_spark(app_name="edb-scale", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sparkContext.setLogLevel("ERROR")

    pn = materialize(spark, N_COPIES, BASE_SF)

    if os.environ.get("EDB_SCALE_CRITICAL") == "1":
        # ≥30× spot-check of the two scale-critical probes (r6 item 6)
        p1 = materialize(spark, 1, BASE_SF)
        run_scale_critical(spark, p1, 1, "warm")
        t1 = run_scale_critical(spark, p1, 1, "x1")
        tn = run_scale_critical(spark, pn, N_COPIES, "xN")
        entries = {
            k: {
                "t1": t1[k],
                f"t{N_COPIES}": tn[k],
                "ratio": round(tn[k] / t1[k], 2) if t1[k] > 0 else None,
            }
            for k in t1 if not k.startswith("_")
        }
        print(json.dumps({
            "metric": f"scale_critical_{N_COPIES}x",
            "copies": N_COPIES,
            "base": BASE_SF,
            "auto_tasks_per_shard": {
                "x1": t1["_auto_tasks_per_shard"],
                f"x{N_COPIES}": tn["_auto_tasks_per_shard"],
            },
            "entries": entries,
        }))
        spark.stop()
        return

    if os.environ.get("EDB_SCALE_SERVING") == "1":
        # focused re-measure of the fixed-workload concurrent serving
        # probe (r6 item 2 done-criterion) — bound-index probe path
        p1 = materialize(spark, 1, BASE_SF)
        t1 = run_scale_serving(spark, p1, 1, "x1")
        tn = run_scale_serving(spark, pn, N_COPIES, "xN")
        entries = {
            k: {
                "t1": t1[k],
                f"t{N_COPIES}": tn[k],
                "ratio": round(tn[k] / t1[k], 2) if t1[k] > 0 else None,
            }
            for k in t1 if not k.startswith("_")
        }
        print(json.dumps({
            "metric": f"scale_serving_{N_COPIES}x",
            "copies": N_COPIES,
            "base": BASE_SF,
            "max_row_groups_per_shard": {
                "x1": t1.get("_max_row_groups_per_shard"),
                f"x{N_COPIES}": tn.get("_max_row_groups_per_shard"),
            },
            "entries": entries,
        }))
        spark.stop()
        return

    if os.environ.get("EDB_SCALE_FANOUT") == "1":
        # serving cross-shard fanout: win vs shard count at constant
        # per-shard bytes (r8) — replication is per-point inside
        print(json.dumps({
            "metric": "serving_fanout_by_shards",
            "base": BASE_SF,
            "entries": run_scale_fanout(spark),
        }))
        spark.stop()
        return

    if os.environ.get("EDB_SCALE_BLOOM") == "1":
        # bloom miss win at scale (r7 verdict item 2): fixed miss
        # workload, default 16 MiB-capped layout, 1x vs Nx
        p1 = materialize(spark, 1, BASE_SF)
        run_scale_bloom_miss(spark, p1, 1, "warm")
        t1 = run_scale_bloom_miss(spark, p1, 1, "x1")
        tn = run_scale_bloom_miss(spark, pn, N_COPIES, "xN")
        print(json.dumps({
            "metric": f"bloom_miss_{N_COPIES}x",
            "copies": N_COPIES,
            "base": BASE_SF,
            "workload": "1000 in-range miss keys, local_multi_get, min of 3",
            "entries": {
                "miss_plain": {"t1": t1["miss_plain"],
                               f"t{N_COPIES}": tn["miss_plain"]},
                "miss_bloom": {"t1": t1["miss_bloom"],
                               f"t{N_COPIES}": tn["miss_bloom"]},
            },
            "bloom_win_x1": round(t1["miss_plain"] / t1["miss_bloom"], 2),
            f"bloom_win_x{N_COPIES}": round(
                tn["miss_plain"] / tn["miss_bloom"], 2
            ),
        }))
        spark.stop()
        return

    if os.environ.get("EDB_SCALE_RECALL") == "1":
        # recall mode: one measurement on the Nx corpus, own JSON line
        print(json.dumps({
            "metric": f"lsh_recall_{N_COPIES}x",
            "banding": {"num_perm": 32, "bands": 8, "threshold": 0.6},
            **measure_lsh_recall(spark, pn),
        }))
        spark.stop()
        return

    # warm code paths on the 1x corpus, then measure 1x, then Nx
    p1 = materialize(spark, 1, BASE_SF)
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
