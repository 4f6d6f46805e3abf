"""Event-time analytics + IVF ANN + stateful streaming tests.

The oracle-checked halves of q32/q33 run via test_parity's parameterized
sweep; here we cover what SQL can't: approx-sketch error bounds (E5), IVF
probe-width equivalence/recall, and applyInPandasWithState cross-batch
state.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elephantdb_spark.analytics import approx_stats, sessionize, ts_from_nanos, ts_micros
from elephantdb_spark.operators.ann import brute_force_topk, ivf_topk, train_ivf_centroids
from elephantdb_spark.streaming.stateful import running_totals

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from elephantdb_spark.analytics import load_events

    return load_events(spark, SF).cache()


@pytest.fixture(scope="module")
def emb(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_ts_micros_exact_above_2_53(spark):
    # doubles lose unit precision past 2^53; the decimal path must not
    ns = 1704067589165275999
    row = spark.createDataFrame([(ns,)], "ts long").select(
        ts_micros(F.col("ts")).alias("us")
    ).first()
    assert row["us"] == ns // 1000


def test_approx_stats_error_bounds(spark, events):
    exact_users = events.select("user_id").distinct().count()
    exact_types = events.select("event_type").distinct().count()
    exact_median = events.approxQuantile("value", [0.5], 0.0)[0]

    row = approx_stats(events, ["user_id", "event_type"], "value", [0.5]).first()
    assert abs(row["approx_distinct_user_id"] - exact_users) <= max(2, 0.15 * exact_users)
    assert row["approx_distinct_event_type"] == exact_types  # tiny cardinality: exact
    lo, hi = events.approxQuantile("value", [0.4, 0.6], 0.0)
    assert lo <= row["approx_quantiles"][0] <= hi
    assert abs(row["approx_quantiles"][0] - exact_median) < 0.2 * max(1.0, abs(exact_median))


def test_sessions_never_overlap_and_cover_all_events(spark, events):
    sess = sessionize(
        events, ts_from_nanos(F.col("ts")), ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
    )
    rows = sess.orderBy("user_id", "sess_start_us").collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    gap_us = 30 * 60 * 1_000_000
    for spans in by_user.values():
        for a, b in zip(spans, spans[1:]):
            # next session starts strictly after previous end (= last+gap)
            assert b["sess_start_us"] >= a["sess_end_us"]
        for r in spans:
            assert r["sess_end_us"] - r["sess_start_us"] >= gap_us


def test_ivf_full_probe_equals_brute_force(spark, emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = train_ivf_centroids(emb, n_cells=8)
    exact = brute_force_topk(emb, q, k=10).collect()
    full = ivf_topk(emb, q, k=10, n_cells=8, n_probe=8, centroids=cents).collect()
    assert [(r["id"], round(r["sim"], 9)) for r in exact] == [
        (r["id"], round(r["sim"], 9)) for r in full
    ]


def test_ivf_partial_probe_recall(spark, emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = train_ivf_centroids(emb, n_cells=8)
    exact_ids = {r["id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx_ids = {
        r["id"]
        for r in ivf_topk(emb, q, k=10, n_cells=8, n_probe=3, centroids=cents).collect()
    }
    assert len(exact_ids & approx_ids) >= 5  # recall@10 >= 0.5 with 3/8 probes


def test_ivf_centroids_deterministic(spark, emb):
    a = train_ivf_centroids(emb, n_cells=4, iters=3)
    b = train_ivf_centroids(emb, n_cells=4, iters=3)
    assert (a == b).all()


def test_streaming_window_agg_with_watermark(spark, events, tmp_path):
    """The q32 tumbling-window operator run as a real Structured Stream:
    file source, event-time watermark, append mode. Windows emitted once
    the watermark passes them must equal the batch computation."""
    import glob
    import shutil
    import tempfile

    feed = str(tmp_path / "wfeed")
    os.makedirs(feed)
    sample = events.filter(F.col("user_id") < 20).select(
        F.timestamp_micros(ts_micros(F.col("ts"))).alias("ts"), "value"
    )
    max_ts = sample.agg(F.max("ts")).first()[0]

    def drop(df, fname):
        staging = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        shutil.copy(
            glob.glob(os.path.join(staging, "part-*.parquet"))[0],
            os.path.join(feed, f"{fname}.parquet"),
        )
        shutil.rmtree(staging)

    def sentinel(days):
        return (
            spark.createDataFrame([(max_ts, 0.0)], "ts timestamp, value double")
            .select((F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"), "value")
        )

    cp = str(tmp_path / "wcp")
    out = str(tmp_path / "wout")

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema("ts timestamp, value double")
            .load(feed)
            .withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros(F.col("window.start")).alias("ws_us"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # query 1 drains the data + a far-future sentinel: its final watermark
    # (persisted in the checkpoint) passes every real window. Append mode
    # emits a window only in a batch AFTER the watermark passes it, so a
    # second drained query — whose batch starts at that watermark — is the
    # deterministic way to observe every emission.
    drop(sample, "b1")
    drop(sentinel(10), "b2")
    run()
    drop(sentinel(20), "b3")
    run()
    got = {r["ws_us"]: r["n"] for r in spark.read.parquet(out).collect()}
    expected = {
        r["ws_us"]: r["n"]
        for r in sample.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros(F.col("window.start")).alias("ws_us"), "n")
        .collect()
    }
    # every real window closed by the sentinel watermark must match batch
    for ws, n in expected.items():
        assert got.get(ws) == n, (ws, n, got.get(ws))


def test_running_totals_stateful_across_batches(spark, events, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    sample = events.filter(F.col("user_id") < 10).select("user_id", "value", "event_id")

    def drop_batch(pred, fname):
        import glob
        import shutil
        import tempfile

        staging = tempfile.mkdtemp()
        sample.filter(pred).select("user_id", "value").coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        shutil.copy(
            glob.glob(os.path.join(staging, "part-*.parquet"))[0],
            os.path.join(feed, f"{fname}.parquet"),
        )
        shutil.rmtree(staging)

    drop_batch(F.col("event_id") % 2 == 0, "b1")
    drop_batch(F.col("event_id") % 2 == 1, "b2")

    stream = (
        spark.readStream.format("parquet")
        .schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches → real cross-batch state
        .load(feed)
    )
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode appends one row per key per batch; cumulative n is
    # monotone, so the final state per key is its max-n row
    updates = spark.table("totals").collect()
    final: dict[int, tuple] = {}
    for r in updates:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["sum_value"])

    expected = {
        r["user_id"]: (r["n"], r["s"])
        for r in sample.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(expected)
    for uid, (n, s) in expected.items():
        assert final[uid][0] == n
        assert abs(final[uid][1] - s) < 1e-6


def test_knn_join_matches_numpy(spark, emb):
    from elephantdb_spark.operators.ann import knn_join

    rows = emb.orderBy("vec_id").collect()
    import numpy as np

    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    got = knn_join(emb, k=3).collect()
    by_a = {}
    for r in got:
        by_a.setdefault(r.a, []).append((r.rk, r.b))
    for i, a in enumerate(ids):
        want = [
            ids[j]
            for j in sorted(
                (j for j in range(len(ids)) if j != i),
                key=lambda j: (-sims[i, j], ids[j]),
            )[:3]
        ]
        assert [b for _, b in sorted(by_a[a])] == want, a


def test_ivf_knn_join_full_probe_equals_exact(spark, emb):
    from elephantdb_spark.operators.ann import ivf_knn_join, knn_join, train_ivf_centroids

    cents = train_ivf_centroids(emb, n_cells=8)
    exact = {(r.a, r.rk): (r.b, round(r.sim, 9)) for r in knn_join(emb, k=3).collect()}
    full = {
        (r.a, r.rk): (r.b, round(r.sim, 9))
        for r in ivf_knn_join(
            emb, k=3, n_cells=8, n_probe=8, centroids=cents, scorer="fold"
        ).collect()
    }
    assert exact == full


def test_ivf_knn_join_arrow_matches_fold(spark, emb):
    """The vectorized matmul scorer returns the same neighbors as the
    bit-exact fold scorer (sims agree to float tolerance; neighbor sets and
    ranks identical away from exact ties)."""
    from elephantdb_spark.operators.ann import ivf_knn_join, train_ivf_centroids

    cents = train_ivf_centroids(emb, n_cells=8)
    fold = ivf_knn_join(
        emb, k=3, n_cells=8, n_probe=8, centroids=cents, scorer="fold"
    ).collect()
    arrow = ivf_knn_join(
        emb, k=3, n_cells=8, n_probe=8, centroids=cents, scorer="arrow"
    ).collect()
    fold_n = {r.a: {r2.b for r2 in fold if r2.a == r.a} for r in fold}
    arrow_n = {r.a: {r2.b for r2 in arrow if r2.a == r.a} for r in arrow}
    assert fold_n == arrow_n
    fold_sim = {(r.a, r.b): r.sim for r in fold}
    for r in arrow:
        assert abs(fold_sim[(r.a, r.b)] - r.sim) < 1e-8, (r.a, r.b)


def test_ivf_knn_join_partial_probe_recall(spark, emb):
    from elephantdb_spark.operators.ann import ivf_knn_join, knn_join, train_ivf_centroids

    cents = train_ivf_centroids(emb, n_cells=8)
    exact = {(r.a, r.b) for r in knn_join(emb, k=3).collect()}
    approx = {
        (r.a, r.b)
        for r in ivf_knn_join(
            emb, k=3, n_cells=8, n_probe=3, centroids=cents
        ).collect()
    }
    # every returned neighbor set is per-query top-3 of the probed subset;
    # with 3/8 probes expect solid-but-imperfect overall recall
    assert len(exact & approx) / len(exact) >= 0.5


def test_embedding_neardup_scorers_agree(spark, emb):
    """LSH-bucketed near-dup pairs: constructed near-duplicates are found,
    and the arrow and fold verification scorers agree."""
    import numpy as np
    from pyspark.sql import functions as F

    from elephantdb_spark.operators.ann import embedding_neardup_pairs

    base = emb.limit(20).collect()
    rows = []
    for r in base:
        v = np.array(list(r.embedding), dtype=np.float32)
        rows.append((int(r.vec_id), [float(x) for x in v]))
        # near-duplicate: tiny perturbation of the same direction
        rows.append((int(r.vec_id) + 100000, [float(x) for x in v * 1.0001]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    arrow = {
        (r.a, r.b)
        for r in embedding_neardup_pairs(df, threshold=0.999, scorer="arrow").collect()
    }
    fold = {
        (r.a, r.b)
        for r in embedding_neardup_pairs(df, threshold=0.999, scorer="fold").collect()
    }
    constructed = {(int(r.vec_id), int(r.vec_id) + 100000) for r in base}
    assert constructed <= arrow  # every planted near-dup found
    assert arrow == fold


def test_multi_grain_rollup_merge_consistency(spark, events):
    """Coarse grains derived from fine partials equal direct aggregation
    of raw events at that grain — and the raw table is scanned only for
    the finest grain."""
    from elephantdb_spark.analytics import multi_grain_rollup, ts_from_nanos

    grains = multi_grain_rollup(
        events, ts_from_nanos(F.col("ts")), ["event_type"], "value",
        grains=["1 hour", "6 hours", "1 day"],
    )
    direct_daily = (
        events.withColumn("__w", F.window(ts_from_nanos(F.col("ts")), "1 day"))
        .groupBy("__w", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.unix_micros(F.col("__w.start")).alias("ws_us"), "event_type",
                "n_events", "sum_value")
    )
    merged = {
        (r.ws_us, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in grains["1 day"].collect()
    }
    direct = {
        (r.ws_us, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in direct_daily.collect()
    }
    assert merged == direct
    # total row conservation at every grain
    total = events.count()
    for g, df in grains.items():
        assert df.agg(F.sum("n_events")).first()[0] == total, g


def test_asof_join_edge_cases(spark):
    from elephantdb_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 50, "e3"), (3, 7, "e4")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [
            (1, 10, 100, 1.0),     # equal ts → inclusive match for e1
            (1, 15, 101, None),    # null value field must not splice older price
            (2, 60, 200, 3.0),     # after e3 → e3 gets no match
            (2, 50, 201, 4.0),
            (2, 50, 202, 5.0),     # tie on (k,ts): max rk wins
        ],
        "k long, ts long, rk long, price double",
    )
    got = {
        r.name: (r.rk, r.price)
        for r in asof_join(
            left, right, "k", "k", "ts", "ts", ["rk", "price"], tie_break="rk"
        ).collect()
    }
    assert got["e0"] == (None, None)        # nothing at-or-before 5
    assert got["e1"] == (100, 1.0)          # inclusive equality
    assert got["e2"] == (101, None)         # latest row wins even w/ null field
    assert got["e3"] == (202, 5.0)          # tie-break by rk desc, inclusive
    assert got["e4"] == (None, None)        # key with no right rows


def test_range_join_edge_cases(spark):
    from elephantdb_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, 10, "p10"), (1, 19, "p19"), (1, 20, "p20"), (1, 100, "p100"),
         (2, 15, "p2_15")],
        "k long, ts long, name string",
    )
    intervals = spark.createDataFrame(
        [
            (1, 10, 20, "A"),    # [10,20): start-inclusive, end-exclusive
            (1, 15, 205, "B"),   # spans many buckets (width 10)
            (1, 30, 30, "Z"),    # degenerate — dropped
            (2, 0, 16, "C"),
        ],
        "k long, s long, e long, ivl string",
    )
    got = {
        (r.name, r.ivl)
        for r in range_join(
            points, intervals, "k", "k", "ts", "s", "e", bucket_width=10
        ).collect()
    }
    assert got == {
        ("p10", "A"),            # ts == start matches
        ("p19", "A"), ("p19", "B"),
        ("p20", "B"),            # ts == A's end does NOT match A
        ("p100", "B"),           # deep inside the long interval
        ("p2_15", "C"),
    }


def test_streaming_sessionize_with_watermark(spark, events, tmp_path):
    """The q33 session operator run as a real Structured Stream:
    session_window + watermark, append mode, two drained queries sharing a
    checkpoint (sessions emit only after the watermark passes them — same
    protocol as the windowed-agg streaming test). Closed sessions must
    equal the batch sessionize."""
    import glob
    import shutil
    import tempfile

    feed = str(tmp_path / "sfeed")
    os.makedirs(feed)
    sample = events.filter(F.col("user_id") < 10).select(
        "user_id", F.timestamp_micros(ts_micros(F.col("ts"))).alias("ts")
    )
    max_ts = sample.agg(F.max("ts")).first()[0]

    def drop(df, fname):
        staging = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        shutil.copy(
            glob.glob(os.path.join(staging, "part-*.parquet"))[0],
            os.path.join(feed, f"{fname}.parquet"),
        )
        shutil.rmtree(staging)

    def sentinel(days):
        return (
            spark.createDataFrame([(999999, max_ts)], "user_id long, ts timestamp")
            .select("user_id", (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"))
        )

    cp = str(tmp_path / "scp")
    out = str(tmp_path / "sout")

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema("user_id long, ts timestamp")
            .load(feed)
            .withWatermark("ts", "1 minute")
            .groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.unix_micros(F.col("session_window.start")).alias("sess_start_us"),
                F.unix_micros(F.col("session_window.end")).alias("sess_end_us"),
                "n_events",
            )
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drop(sample, "b1")
    drop(sentinel(10), "b2")
    run()
    drop(sentinel(20), "b3")
    run()

    got = {
        (r.user_id, r.sess_start_us, r.sess_end_us): r.n_events
        for r in spark.read.parquet(out).collect()
        if r.user_id != 999999
    }
    expected = {
        (r.user_id, r.sess_start_us, r.sess_end_us): r.n_events
        for r in sessionize(
            events.filter(F.col("user_id") < 10),
            ts_from_nanos(F.col("ts")), ["user_id"],
            [F.count(F.lit(1)).alias("n_events")],
        ).collect()
    }
    for k, n in expected.items():
        assert got.get(k) == n, (k, n, got.get(k))
