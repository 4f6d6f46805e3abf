#!/usr/bin/env python
"""Benchmark harness: headline engine operations at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (the LAST stdout line — the driver's tail
capture parses it, so it must stay small; VERDICT r7 item 1: the r7
line embedded every raw pass and overflowed the capture, leaving the
official artifact ``parsed: null``):
  {"metric": "total_bench_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "serving": {...}, "sf": 0.1,
   "passes": N, "provenance": {...scalars only...}}
The full per-pass raw timings (the min-merge audit trail) go to a
round-stamped side file ``BENCH_raw_passes_r{N}.json`` next to this
script instead (named by the line's ``queries_file``; the unstamped
``BENCH_raw_passes.json`` stays as a latest-run alias).

The suite covers the reference's two real workloads — bulk domain build
(shard+sort+write) and point/multi-point serving reads — plus the extension
operators (dedup, similarity, text analysis) at the same scale.

De-noising protocol (VERDICT r6 item 8): the host carries EXTERNAL
tenant load, so single-pass figures vary ±50% run to run and every round
re-litigated phantom regressions. The recorded ``queries`` are now the
per-entry MINIMUM over $SPARK_GRAFT_BENCH_PASSES warm passes (default 3)
in ONE JVM — min is the right estimator for structural cost under
one-sided noise — with every raw pass and a load-average provenance
block kept alongside so the merge is auditable.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from elephantdb_spark import DomainSpec, Engine, build_domain, update_domain
from elephantdb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NUM_SHARDS = 32


def _sf_tag(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


# Serving windows drawn per pass, UNCONDITIONALLY (r11 VERDICT item 1,
# superseding the r10 contended-only retry): the engine's measured
# intermittent-JVM-self-noise envelope spreads uncontended ~1.4 s
# windows across 5-10k keys/s (SCALE.md §r11s2), so one sample per pass
# under-reads the engine whenever it lands in a trough — the official
# driver figure fell three straight rounds (7,921 -> 6,354 -> 5,901) on
# ext-0.0 windows while the 9-sample solo fold read 10,045.  The
# min-fold is the right estimator for intermittent self-noise, but only
# with enough samples; k=3 windows x 3 passes gives the driver run the
# same >=9-sample fold the solo runs already draw, for +~8 s on a ~65 s
# bench.
SERVING_WINDOWS_PER_PASS = 3


def fold_serving_windows(run_window, k: int = None) -> tuple[list, dict, bool]:
    """Draw ``k`` serving windows unconditionally, plus ONE extra only
    when every unconditional window was externally contended (the r10
    gate, kept on top of the r11 unconditional sampling — self-noise
    never fires it, ext busy cores do).  Returns (all windows drawn in
    order, the kept min-wall window, retried) where ``retried`` is true
    iff the contention gate drew the extra window — computed against the
    EFFECTIVE k this call used, not the module default, so callers can
    never misreport it under a non-default or clamped k (ADVICE r13
    item 1).  Pure policy: ``run_window`` does the measuring, so tests
    can pin the fold without a SparkSession."""
    # total over the advertised signature (ADVICE r12): k<=0 would make
    # the kept-min below raise on an empty list — the policy always
    # draws at least one window
    k = SERVING_WINDOWS_PER_PASS if k is None else max(1, k)
    windows = [run_window() for _ in range(k)]
    if windows and all(w["contended"] for w in windows):
        windows.append(run_window())
    kept = min(windows, key=lambda w: w["wall"])
    return windows, kept, len(windows) > k


def build_final_serving(servings: list, best_idx: int) -> dict:
    """Fold the per-pass serving blocks into the final line's block.

    The scalar figures (keys/sec, latency percentiles, contended, ...)
    come from the best pass: each pass's block is already the min-fold
    of its k windows, so the best pass's figure IS the min over every
    window drawn this run, and its ``contended``/``ext_busy_cores``
    describe exactly the kept window that produced that figure.  Two
    fields are run-scoped instead (ADVICE r12: a line reader must never
    see >9 windows with ``serving_retried: false``):

    - ``windows``: the concatenation of every sample drawn across all
      passes (>=9 on a default 3-pass run) — the audit trail the fold
      must never hide;
    - ``serving_retried``: true when ANY pass's contention gate fired,
      since that pass's extra draw rides the concatenated list even
      when a different pass supplied the kept block.

    Pure (no Spark, no I/O) so the sparkless contract tests can pin the
    exact construction main() ships.

    Total over its advertised inputs (ADVICE r13 item 2, matching the
    totality treatment fold_serving_windows got): an empty ``servings``
    or out-of-range ``best_idx`` raises a clear ValueError instead of a
    bare IndexError deep in the fold.
    """
    if not servings:
        raise ValueError("build_final_serving: servings must be non-empty")
    if not 0 <= best_idx < len(servings):
        raise ValueError(
            f"build_final_serving: best_idx {best_idx} out of range "
            f"for {len(servings)} pass(es)"
        )
    final = dict(servings[best_idx])
    final["windows"] = [w for s in servings for w in s.get("windows", [])]
    final["serving_retried"] = any(
        s.get("serving_retried") for s in servings
    )
    return final


# ---- serving-window instrument (module-level so envelope_probe.py ----
# ---- measures with the IDENTICAL code — VERDICT r13 item 2) ----------

# one serving window = SERVING_THREADS threads x SERVING_BATCHES batches
# of SERVING_BATCH_KEYS keys through ONE Domain handle (8,000 lookups)
SERVING_THREADS = 8
SERVING_BATCHES = 10
SERVING_BATCH_KEYS = 100
SERVING_KEYS_PER_WINDOW = SERVING_THREADS * SERVING_BATCHES * SERVING_BATCH_KEYS

# contention verdict threshold: >cpus/4 EXTERNAL busy cores in-window
CONTENDED_BUSY_CORES = CPUS / 4.0


def _reset_peak_rss() -> bool:
    """Reset the kernel's VmHWM watermark so the recorded peak is
    IN-WINDOW (ru_maxrss is a lifetime high-watermark: any earlier
    phase that peaked higher would freeze the delta at 0 and hide a
    probe-memory regression)."""
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
        return True
    except OSError:
        return False


def _peak_rss_kb() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss


def spark_jvm_pid(spark) -> int | None:
    """PID of the live Spark JVM (our biggest CPU consumer), found once
    so the external-cores instrument can subtract its tree."""
    try:
        return int(
            spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
        )
    except Exception:
        return None


def _cpu_totals(jvm_pid: int | None) -> tuple[float, float] | None:
    """(host_busy_cpu_sec, own_tree_cpu_sec) at this instant.

    The delta of these two over a window gives EXTERNAL busy cores:
    (host_busy_delta - own_delta) / wall.  Unlike the 1-min loadavg
    — which lags by a minute and counts the bench's OWN 32-core
    Spark stages from the preceding entries — this measures other
    tenants' CPU during the window itself.  Own tree = this process
    (rusage SELF) + reaped children (rusage CHILDREN) + the live
    Spark JVM's utime/stime/cutime/cstime from /proc; idle pyspark
    workers (live, unreaped JVM grandchildren) are not counted but
    run no Spark jobs during the pure-pyarrow serving window.
    Returns None when /proc is unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        if parts[0] != "cpu":
            return None
        jiffies = [float(x) for x in parts[1:]]
        hz = float(os.sysconf("SC_CLK_TCK"))
        idle = jiffies[3] + (jiffies[4] if len(jiffies) > 4 else 0.0)
        busy = (sum(jiffies) - idle) / hz
    except (OSError, ValueError, IndexError):
        return None
    own = 0.0
    for who in (resource.RUSAGE_SELF, resource.RUSAGE_CHILDREN):
        ru = resource.getrusage(who)
        own += ru.ru_utime + ru.ru_stime
    if jvm_pid is not None:
        try:
            with open(f"/proc/{jvm_pid}/stat") as f:
                # comm may contain spaces/parens: split after the
                # LAST ')' — fields utime stime cutime cstime are
                # then tokens 11-14 (state is token 0)
                rest = f.read().rsplit(")", 1)[1].split()
            own += sum(float(rest[i]) for i in (11, 12, 13, 14)) / hz
        except (OSError, ValueError, IndexError):
            pass
    return busy, own


def serving_window(domain, keys, jvm_pid: int | None = None) -> dict:
    """One serving window: SERVING_THREADS threads x SERVING_BATCHES
    batches of SERVING_BATCH_KEYS keys through ONE Domain handle.
    Measures wall, per-call latencies, in-window peak-RSS delta, and
    the window's contention verdict (in-window EXTERNAL busy cores >
    CONTENDED_BUSY_CORES; 1-min loadavg only as provenance / non-Linux
    fallback)."""
    lats: list[float] = []
    hits: dict[int, int] = {}
    errs: list[BaseException] = []

    def _serve_worker(tid):
        try:
            batch = keys[tid * SERVING_BATCH_KEYS:(tid + 1) * SERVING_BATCH_KEYS]
            mine = []
            for _ in range(SERVING_BATCHES):
                c0 = time.perf_counter()
                res = domain.local_multi_get(batch)
                mine.append(time.perf_counter() - c0)
                hits[tid] = sum(v is not None for v in res.values())
            lats.extend(mine)
        except BaseException as e:  # surfaced after join, not a KeyError
            errs.append(e)

    windowed = _reset_peak_rss()
    rss_before_kb = _peak_rss_kb()
    la0 = os.getloadavg()[0]
    cpu0 = _cpu_totals(jvm_pid)
    t0 = time.perf_counter()
    ts = [
        threading.Thread(target=_serve_worker, args=(t,))
        for t in range(SERVING_THREADS)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    cpu1 = _cpu_totals(jvm_pid)
    if errs:
        raise errs[0]
    assert all(
        hits[t] == len(set(
            keys[t * SERVING_BATCH_KEYS:(t + 1) * SERVING_BATCH_KEYS]
        ))
        for t in range(SERVING_THREADS)
    ), hits
    if cpu0 is not None and cpu1 is not None and wall > 0:
        ext_busy = max(0.0, (cpu1[0] - cpu0[0]) - (cpu1[1] - cpu0[1])) / wall
    else:
        ext_busy = None
    loadavg = max(la0, os.getloadavg()[0])
    # contention verdict: >cpus/4 EXTERNAL busy cores during the
    # window itself.  The 1-min loadavg is kept as provenance but is
    # NOT the verdict — it lags by a minute and brands the bench's
    # own preceding Spark stages as contention (observed: a solo r11
    # window at loadavg 12.4 with ~0 external load set the all-time
    # serving record).  Loadavg is only the fallback verdict where
    # /proc is unavailable.
    contended = (
        ext_busy > CONTENDED_BUSY_CORES if ext_busy is not None
        else loadavg > CONTENDED_BUSY_CORES
    )
    return {
        "wall": wall,
        "lats": lats,
        "loadavg_1m": loadavg,
        "ext_busy_cores": ext_busy,
        "rss_delta_mib": (_peak_rss_kb() - rss_before_kb) / 1024.0,
        "rss_windowed": windowed,
        "contended": contended,
    }


# ---- session-envelope serving gate (VERDICT r13 item 1) ---------------
#
# r13 proved the host serving envelope is a time-varying REGIME, not a
# constant: identical engine bytes drew window floors from 1.044 s to
# 2.992 s (2.9x) within one session, with in-window external cores ~0
# throughout (SCALE.md §r13).  An absolute keys/s bar therefore cannot
# distinguish regime from regression here.  The gate is now
# envelope-RELATIVE: the official serving figure is judged against the
# best window of a same-session standalone probe run BRACKETING the
# bench (ENVELOPE_WINDOWS_PER_SIDE windows before pass 0 and after the
# last pass, same domain shape, same serving_window instrument).
# Criterion (PLANS.md §r14): official keys/s within ENVELOPE_TOLERANCE
# of the probe's best-window keys/s ⇒ regime-consistent; worse ⇒
# investigate as a regression.

ENVELOPE_TOLERANCE = 1.25


def parse_envelope_windows(raw, default: int = 4) -> int:
    """Parse $SPARK_GRAFT_ENVELOPE_WINDOWS into a window count.

    Best-effort like the envelope gate itself (ADVICE r14): a malformed
    value must degrade to the default with a stderr warning, never raise
    at import time — ``bench`` is imported sparkless by the probe and
    the test suite, and a shell typo in the env var must not break
    those imports.  Negative values clamp to 0 (bracket disabled)."""
    try:
        return max(0, int(raw))
    except (TypeError, ValueError):
        print(
            f"WARN: SPARK_GRAFT_ENVELOPE_WINDOWS={raw!r} is not an "
            f"integer; using default {default}",
            file=sys.stderr,
        )
        return default


ENVELOPE_WINDOWS_PER_SIDE = parse_envelope_windows(
    os.environ.get("SPARK_GRAFT_ENVELOPE_WINDOWS", "4")
)


def draw_bracket_leg(draw_one, count: int, out: list) -> None:
    """Append ``count`` serving windows drawn by ``draw_one()`` to
    ``out``, one at a time, so a mid-leg failure keeps every
    already-drawn window in ``out`` (ADVICE r15: the old list
    comprehension discarded k-1 good windows when window k raised —
    envelope_probe.py salvages partial artifacts; the bench bracket
    now matches that posture).  The exception still propagates to the
    caller's best-effort WARN path."""
    for _ in range(count):
        out.append(draw_one())


def build_envelope_fixture(spark, sf_dir: str = None):
    """The official serving fixture, rebuilt standalone: lineitem_kv at
    ``sf_dir`` in a throwaway work dir plus the 1000-key probe draw the
    bench's serving entry uses.  Returns (domain, keys, work_dir); the
    caller owns the work dir.  One untimed warm probe runs first so the
    bracket windows measure the same cache-warm regime as the official
    kept window (which follows earlier warm entries)."""
    sf_dir = SF_DIR if sf_dir is None else sf_dir
    work = tempfile.mkdtemp(prefix="edb_envelope_")
    # a failed build must not leak the work dir (ADVICE r14): the
    # caller only learns the path from a SUCCESSFUL return, so on any
    # raise the dir is ours to remove before re-raising
    try:
        eng = Engine(spark, work)
        lineitem = spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")
        )
        li_kv = lineitem.select(
            F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
            .cast("binary").alias("key"),
            F.col("l_extendedprice").cast("string").cast("binary")
            .alias("value"),
        )
        build_domain(spark, li_kv, eng.domain_root("lineitem_kv"),
                     DomainSpec(num_shards=NUM_SHARDS), version=1)
        dom = eng.domain("lineitem_kv")
        keys = [
            f"{r.l_orderkey}-{r.l_linenumber}".encode()
            for r in lineitem.select("l_orderkey", "l_linenumber")
            .limit(1000).collect()
        ]
        dom.local_multi_get(keys)  # untimed warm: handles + decoded groups
        return dom, keys, work
    except BaseException:
        shutil.rmtree(work, ignore_errors=True)
        raise


def compact_window(w: dict) -> list:
    """[wall_sec, ext_busy_cores] audit form (the serving windows list's
    shape) — drops the per-call latency vector."""
    return [
        round(w["wall"], 3),
        round(w["ext_busy_cores"], 1)
        if w.get("ext_busy_cores") is not None else None,
    ]


def build_envelope_block(
    pre_windows: list, post_windows: list, official_keys_per_sec: float,
    tolerance: float = ENVELOPE_TOLERANCE,
    keys_per_window: int = SERVING_KEYS_PER_WINDOW,
    discard_window: dict | None = None,
) -> dict | None:
    """Fold the bracketing probe windows into the line's envelope
    verdict (pure — sparkless tests pin it).

    ``regime_consistent`` is true iff the official figure is within
    ``tolerance`` of the session probe's best-window keys/s, i.e.
    official * tolerance >= probe_best.  A consistent-but-low round
    means the HOST regime was degraded (the probe saw the same
    envelope); an INconsistent round means the official draw was slower
    than the same session's demonstrated envelope and must be
    investigated as a regression.  Returns None when no usable probe
    windows exist (the line then carries envelope: null — an honest
    absent gate, never a fabricated verdict).

    ``discard_window`` (VERDICT r14 item 4) is the untimed warmup
    window drawn before the pre-bracket leg on a fresh JVM: three of
    seven r14 solo runs — exactly the fresh-JVM-after-idle launches —
    drew pre-floors >=3.5 s against post-floors <=1.0 s, confounding
    launch warmup with host regime.  The discard's wall is RECORDED
    (``discard_wall_sec``) so the warmup cost stays auditable, but it
    is EXCLUDED from the floors and the verdict: the pre-floor now
    measures the host envelope at launch, not JIT/page-cache warmup."""
    pre = [w for w in (pre_windows or []) if w.get("wall", 0) > 0]
    post = [w for w in (post_windows or []) if w.get("wall", 0) > 0]
    walls = [w["wall"] for w in pre + post]
    if not walls or not official_keys_per_sec:
        return None
    probe_best = keys_per_window / min(walls)
    return {
        "probe_best_keys_per_sec": round(probe_best, 1),
        "official_over_probe_best": round(
            official_keys_per_sec / probe_best, 3
        ),
        "regime_consistent": bool(
            official_keys_per_sec * tolerance >= probe_best
        ),
        "tolerance": tolerance,
        "pre_floor_sec": round(min(w["wall"] for w in pre), 3) if pre else None,
        "post_floor_sec": round(min(w["wall"] for w in post), 3) if post else None,
        "n_windows": len(walls),
        "discard_wall_sec": (
            round(discard_window["wall"], 3)
            if discard_window and discard_window.get("wall", 0) > 0
            else None
        ),
    }


def run_pass(spark, pass_idx: int) -> tuple[dict, dict]:
    """One full pass over every timed entry in a fresh work dir (domains
    rebuilt — the build entries are part of the suite); returns
    (timings, serving_stats). The session is shared across passes, so
    pass 2+ measure steady-state JVM cost."""
    work = tempfile.mkdtemp(prefix=f"edb_bench_p{pass_idx}_")
    eng = Engine(spark, work)
    timings: dict[str, float] = {}

    def read(name):
        return spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)
                # cache hygiene between entries (round-2 verdict: a leaked
                # shingle-index persist taxed every subsequent entry with
                # storage-memory eviction/GC pressure). Outside the timed
                # window; both calls are no-ops when nothing is cached.
                from elephantdb_spark.operators.dedup import (
                    release_shingle_caches,
                )

                release_shingle_caches()
                spark.catalog.clearCache()

        return _T()

    lineitem = read("lineitem")
    customer = read("customer")
    documents = read("documents")
    embeddings = read("embeddings")

    def warm_python_workers():
        """Untimed: fork + import-warm the Arrow python workers. Idle
        workers are reclaimed during long JVM-only stretches, and a cold
        fan-out (pandas/numpy import per forked worker, ~1 s each,
        staggered) would otherwise bill 5-10 s to the next wide
        mapInPandas entry. THREE chained identity stages because fused
        python stages each hold their own worker — a 3-stage pipeline
        (e.g. the WARC chain) needs 3*CPUS live workers.

        Ends with a sacrificial JVM shuffle job: the fork storm's
        aftermath (page-cache/allocator churn from ~100 fresh processes)
        measurably degrades the NEXT JVM job by ~7-8 s ONE TIME, then
        clears (r5 root-cause of the build_lineitem_kv bench regression:
        r4 introduced this helper right before that entry — isolated
        repro: storm→build 11.5 s, storm→build→build 4.4 s, no-storm
        control 3.6 s). Absorb it here, untimed."""
        df = documents.select("doc_id").repartition(CPUS)
        for _ in range(3):
            df = df.mapInPandas(lambda it: it, "doc_id long")
        df.count()
        lineitem.groupBy("l_returnflag").agg(
            F.sum("l_quantity")
        ).collect()  # sacrificial JVM job eats the post-fork penalty

    # Untimed warmup: one tiny end-to-end build + read compiles the codegen
    # paths, starts the shuffle service, and loads the parquet committer
    # classes, so the timed entries measure steady-state operator cost
    # rather than first-query JVM initialization (~4 s of pure warmup
    # otherwise lands on whichever entry runs first).
    from elephantdb_spark.sources import kv_from_columns

    warm_kv = kv_from_columns(customer.limit(1000), "c_custkey", "c_name")
    build_domain(spark, warm_kv, eng.domain_root("warmup_kv"),
                 DomainSpec(num_shards=4), version=1)
    wdom = eng.domain("warmup_kv")
    wdom.get(b"1")
    # >32 keys exercises the SQL IN-expression + broadcast-left-join shape
    # the timed multiget compiles
    wdom.multi_get([str(i).encode() for i in range(40)])
    customer.groupBy("c_mktsegment").count().collect()
    # compile the big text-profile expression (stopword filter lambda +
    # rolling-hash fold): its whole-stage-codegen compilation alone is
    # ~2.5 s and would land on the timed entry (measured: first call
    # 3.4 s, steady state 0.7-0.9 s at sf0.1)
    from elephantdb_spark.functions.text import text_profile as _tp

    _tp(documents.limit(50), "text").agg(
        F.sum("n_tokens"), F.max("fp"), F.avg("stop_ratio"), F.avg("avg_tok_len")
    ).collect()
    warm_python_workers()

    # --- 1. bulk build: the reference's core workload (A4-A8) -------------
    li_kv = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("key"),
        F.col("l_extendedprice").cast("string").cast("binary").alias("value"),
    )
    with timed("build_lineitem_kv"):
        build_domain(spark, li_kv, eng.domain_root("lineitem_kv"),
                     DomainSpec(num_shards=NUM_SHARDS), version=1)

    # unique-key fast path: no LWW window → single-shuffle build
    # (orders: o_orderkey is genuinely unique in the synthetic data;
    # lineitem's (orderkey, linenumber) is NOT, so it must use LWW)
    orders_kv = read("orders").select(
        F.col("o_orderkey").cast("string").cast("binary").alias("key"),
        F.col("o_totalprice").cast("string").cast("binary").alias("value"),
    )
    with timed("build_orders_kv_nodedup"):
        build_domain(spark, orders_kv, eng.domain_root("orders_kv_nd"),
                     DomainSpec(num_shards=NUM_SHARDS), version=1,
                     dedup="none")

    cust_kv = customer.select(
        F.col("c_custkey").cast("string").cast("binary").alias("key"),
        F.col("c_name").cast("binary").alias("value"),
    )
    with timed("build_customer_kv"):
        build_domain(spark, cust_kv, eng.domain_root("customer_kv"),
                     DomainSpec(num_shards=NUM_SHARDS), version=1)

    # --- 2. serving reads (A1/A2/A15, core.clj:108-172,212-216) ----------
    dom = eng.domain("lineitem_kv")
    li_keys = [f"{r.l_orderkey}-{r.l_linenumber}".encode()
               for r in lineitem.select("l_orderkey", "l_linenumber").limit(1000).collect()]

    with timed("multiget_1000"):
        n = dom.multi_get_df(li_keys).count()
        assert n == len(li_keys)

    cdom = eng.domain("customer_kv")
    with timed("point_get_x20"):
        for i in range(1, 21):
            cdom.get(str(i).encode())

    # serving-layer local probe (pyarrow, no Spark job — the reference's
    # actual read path shape: local persistence probe per key)
    with timed("local_get_x100"):
        for i in range(1, 101):
            cdom.local_get(str(i).encode())

    with timed("local_multiget_1000"):
        got = dom.local_multi_get(li_keys)
        # li_keys may repeat (lineitem (orderkey, linenumber) is not unique
        # in the synthetic data) and the result is keyed by key
        assert sum(v is not None for v in got.values()) == len(set(li_keys))

    # miss-heavy serving with/without the Bloom sidecar (bloom.py): the
    # misses are IN-RANGE (linenumber 8 never exists but sorts between
    # real keys), so the bound index cannot exclude them (the
    # reference's cheap B-tree miss, JavaBerkDB.java:70-82). Since the
    # decoded-group cache (r8) absorbs first-touch miss decodes at this
    # fixture scale on BOTH domains, the two entries are expected ~equal
    # here — the sidecar's structural win lives in the at-budget regime
    # and is measured in BENCH_scale.json's bloom_miss block, where the
    # domain outgrows the cache. Fixture build untimed.
    li_kv_b = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("key"),
        F.col("l_extendedprice").cast("string").cast("binary").alias("value"),
    )
    build_domain(spark, li_kv_b, eng.domain_root("lineitem_kv_bloom"),
                 DomainSpec(num_shards=NUM_SHARDS,
                            persistence_opts={"bloom_fpp": 0.01}),
                 version=1)
    bdom = eng.domain("lineitem_kv_bloom")
    miss_keys = sorted({
        f"{k.split(b'-')[0].decode()}-8".encode() for k in li_keys
    })
    # warm BOTH domains with a full untimed miss pass: the plain domain
    # enters this entry cache-warm from the earlier hit entries, so
    # without this the bloom entry times 32 first-touch group fills
    # against steady-state lookups — an asymmetry, not a comparison
    bdom.local_multi_get(miss_keys)
    dom.local_multi_get(miss_keys)
    with timed("local_multiget_miss_bloom"):
        got = bdom.local_multi_get(miss_keys)
        assert all(v is None for v in got.values())
    with timed("local_multiget_miss_plain"):
        got = dom.local_multi_get(miss_keys)
        assert all(v is None for v in got.values())

    # concurrent serving throughput (VERDICT r4 item 3): the reference's
    # daemon serves from 64 Thrift worker threads (common/thrift.clj:
    # 111-118); drive 8 threads of multi_get batches through ONE Domain
    # handle — exercises the _pq_cache under concurrency. The recorded
    # value is wall seconds for 8x10 batches of 100 keys (8000 key
    # lookups); bench JSON stays one-number-per-entry, qps = 8000/value.
    # The window runner itself is module-level (serving_window) so the
    # standalone envelope probe measures with the IDENTICAL instrument
    # (VERDICT r13 item 2).
    _jvm_pid = spark_jvm_pid(spark)

    # k unconditional windows, min-fold (r11 VERDICT item 1) — policy
    # and rationale live on fold_serving_windows / the module constant
    windows, kept, retried = fold_serving_windows(
        lambda: serving_window(dom, li_keys, jvm_pid=_jvm_pid)
    )
    wall, call_lat = kept["wall"], kept["lats"]
    timings["local_multiget_concurrent_8t"] = round(wall, 3)
    # serving-throughput figures (VERDICT r5 item 8): the reference's
    # anchor is a 64-thread THsHaServer (common/thrift.clj:111-118);
    # report keys/sec plus per-key latency percentiles so rounds compare
    # as serving throughput, and the probe's driver-side peak-RSS delta
    # (bounded by LOCAL_PROBE_BATCH_ROWS streaming — VERDICT r5 item 4)
    call_lat.sort()
    _n = len(call_lat)
    serving_stats = {
        "keys_per_sec": round(SERVING_KEYS_PER_WINDOW / wall, 1),
        "per_key_p50_ms": round(
            call_lat[_n // 2] / SERVING_BATCH_KEYS * 1000, 4
        ),
        "per_key_p99_ms": round(
            call_lat[min(_n - 1, _n * 99 // 100)] / SERVING_BATCH_KEYS * 1000,
            4,
        ),
        "batch_keys": SERVING_BATCH_KEYS,
        "threads": SERVING_THREADS,
        "peak_rss_delta_mib": round(kept["rss_delta_mib"], 1),
        # false = clear_refs unavailable: the delta degrades to the
        # lifetime-watermark semantics and can under-report
        "peak_rss_windowed": kept["rss_windowed"],
        # resident decoded-group cache after the run (r8: the hot-probe
        # memory tier — serving figures above are cache-warm by design,
        # the repeat-batch workload is what the cache exists for)
        "rg_cache_mib": round(dom._rg_cache_nbytes / 2**20, 2),
        # 1-min loadavg of the KEPT window — provenance/continuity only
        # (r8 VERDICT item 4); the contention VERDICT below uses the
        # in-window external-cores measure, which the loadavg is not
        "loadavg_1m": round(kept["loadavg_1m"], 2),
        # average EXTERNAL busy cores during the kept window (host
        # /proc/stat busy delta minus our own process tree); null where
        # /proc is unavailable
        "ext_busy_cores": (
            round(kept["ext_busy_cores"], 1)
            if kept["ext_busy_cores"] is not None else None
        ),
        # machine-visible contention verdict for the kept window
        # (r10 VERDICT item 2): external busy cores > cpus/4
        "contended": kept["contended"],
        # true when the external-contention gate fired and an EXTRA
        # window ran beyond the unconditional k (r11: the k windows
        # themselves are not "retries" — they are the estimator).
        # Reported by the fold itself against the effective k it used
        # (ADVICE r13 item 1: deriving it here from the module constant
        # would misreport under any non-default k)
        "serving_retried": retried,
        # audit trail for the kept-min (every window incl. discarded:
        # [wall_sec, ext_busy_cores]) — the fold must never hide how
        # much it changed the figure; main() concatenates the per-pass
        # lists so the FINAL line carries all >=9 samples
        "windows": [
            [round(w["wall"], 3),
             round(w["ext_busy_cores"], 1)
             if w["ext_busy_cores"] is not None else None]
            for w in windows
        ],
    }

    # the same workload with the decoded-group cache DISABLED (r8): the
    # honest cold-path figure — at 100 TB a uniform-random probe stream
    # misses the cache and pays exactly this path, so both numbers stay
    # on the record (PLANS.md r8 serving section)
    from elephantdb_spark.engine import Domain as _Domain

    cold_dom = _Domain(spark, eng.domain_root("lineitem_kv"))
    cold_dom._rg_cache_budget = 0
    cold_dom.local_multi_get([b"warm"])  # open handles untimed
    # same harness as the warm entry (one window, no gate — this entry
    # exists as the warm entry's structural contrast, not a headline)
    timings["local_multiget_concurrent_8t_nocache"] = round(
        serving_window(cold_dom, li_keys, jvm_pid=_jvm_pid)["wall"], 3
    )

    # bulk enrichment (r5): the WHOLE lineitem fact probed against its
    # KV domain — one probe-side exchange, zero domain-side shuffle
    # (tasks read their shard files directly)
    with timed("bulk_join_600k"):
        n_hit = (
            dom.bulk_join(
                lineitem.select(
                    F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
                    .cast("binary").alias("k")
                ),
                "k",
            )
            .agg(F.sum(F.col("value").isNotNull().cast("long")))
            .collect()[0][0]
        )
        assert n_hit > 0

    # sub-shard parallel enrichment (r6): an 8-shard domain (the
    # parallelism-starved shape) probed by the whole fact with
    # tasks_per_shard=4 — 32 slice tasks instead of 8, each reading only
    # its row-group range of the shard file
    # 1 MiB parquet blocks: at sf0.1 a shard is ~5 MB, which the default
    # 128 MB block makes ONE row group — no cut points, so m>1 would
    # degenerate to overhead. Production shards are GBs (many row
    # groups); the small block reproduces that shape at bench scale.
    build_domain(  # untimed fixture
        spark, li_kv, eng.domain_root("lineitem_kv8"),
        DomainSpec(num_shards=8,
                   persistence_opts={"parquet.block.size": 1 << 20}),
        version=1,
    )
    dom8 = eng.domain("lineitem_kv8")
    probe8 = lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
        .cast("binary").alias("k")
    )
    with timed("bulk_join_8shard_subshard4"):
        n_hit = (
            dom8.bulk_join(probe8, "k", tasks_per_shard=4)
            .agg(F.sum(F.col("value").isNotNull().cast("long")))
            .collect()[0][0]
        )
        assert n_hit > 0

    # the DEFAULT path (r7): tasks_per_shard auto-selected from the
    # Catalyst probe-size estimate — the judge compares this against the
    # best manual m above (at this probe size the estimate may correctly
    # choose m=1: the parallelism arm only lifts m when every slice
    # still gets BULK_MIN_ROWS_PER_TASK probe rows)
    with timed("bulk_join_8shard_auto"):
        n_hit = (
            dom8.bulk_join(probe8, "k")
            .agg(F.sum(F.col("value").isNotNull().cast("long")))
            .collect()[0][0]
        )
        assert n_hit > 0

    with timed("scan_count"):
        dom.count()

    with timed("full_scan_agg"):
        dom.scan().agg(F.max(F.length("value"))).collect()

    # --- 3. incremental update (A20) --------------------------------------
    batch = li_kv.limit(5000).withColumn("value", F.lit(b"updated"))
    with timed("incremental_update_5k"):
        update_domain(spark, batch, eng.domain_root("lineitem_kv"), version=2)

    # incremental update WITH the opt-in self-heal (r8): same 5k batch
    # against a fragmented domain whose spec carries compact_after_files,
    # so the timed window includes the in-publish merge of every shard
    # past the threshold — the cost a self-healing A20 append pays
    build_domain(  # untimed fixture: ~5 small files per shard
        spark, li_kv, eng.domain_root("lineitem_kv_heal"),
        DomainSpec(num_shards=NUM_SHARDS,
                   persistence_opts={"maxRecordsPerFile": 4000,
                                     "compact_after_files": 2}),
        version=1,
    )
    with timed("incremental_update_5k_selfheal"):
        update_domain(spark, batch, eng.domain_root("lineitem_kv_heal"),
                      version=2)
    assert (
        eng.domain("lineitem_kv_heal").layout_report(2)["max_files_per_shard"]
        <= 2
    )

    # --- 3b. compaction (round-4): merge fragmented shard files ----------
    from elephantdb_spark import compact_domain

    frag_root = eng.domain_root("orders_kv_frag")
    build_domain(  # untimed fixture: ~5 small files per shard
        spark, orders_kv, frag_root,
        DomainSpec(num_shards=NUM_SHARDS,
                   persistence_opts={"maxRecordsPerFile": 1000}),
        version=1, dedup="none",
    )
    with timed("compact_domain"):
        compact_domain(spark, frag_root, version=2)

    # --- 4. extension operators -------------------------------------------
    from elephantdb_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from elephantdb_spark.operators.ann import brute_force_topk

    with timed("dedup_exact_documents"):
        exact_dedup(documents, ["text"], "doc_id").count()

    # incremental dedup: persist the corpus seen-set as a digest domain,
    # then flag an ingestion batch with broadcast joins (q80 shape)
    from elephantdb_spark.operators.history import (
        build_dedup_history,
        filter_against_history,
    )

    hist_root = eng.domain_root("doc_digest_history")
    with timed("dedup_history_build"):
        build_dedup_history(
            spark, documents, hist_root, ["text"], "doc_id",
            DomainSpec(num_shards=NUM_SHARDS), version=1,
        )
    # the q80 fixture helper — one definition of the batch shape, so the
    # bench and the driver query cannot drift
    from elephantdb_spark.extensions import _history_batch

    with timed("dedup_history_filter"):
        filter_against_history(
            spark, _history_batch(documents), hist_root, ["text"]
        ).count()

    # incremental NEAR-dup: persist the corpus MinHash state (band index +
    # signatures) as a domain pair, then flag an ingestion batch with two
    # bulk_joins + the agreement estimator (q104 shape, production
    # xxhash64 mode)
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
        ).count()

    # lockstep compaction of a fragmented history (r7): untimed fixture
    # builds the same history with per-file splits (the cluster-scale
    # fragmentation shape), timed entry collapses both sub-domains to
    # one file per shard at one shared version
    from elephantdb_spark.operators.neardup_history import (
        compact_neardup_history,
    )

    ndf_root = eng.domain_root("neardup_history_frag")
    build_neardup_history(  # untimed fixture
        spark, documents, ndf_root, "doc_id", "text",
        spec=DomainSpec(num_shards=NUM_SHARDS,
                        persistence_opts={"maxRecordsPerFile": 50}),
        version=1,
    )
    with timed("neardup_history_compact"):
        # returns 2 ⇔ real compaction happened (no-op returns version 1)
        assert compact_neardup_history(spark, ndf_root, version=2) == 2

    with timed("minhash_lsh_documents"):
        minhash_lsh_pairs(documents, "doc_id", "text",
                          num_perm=32, bands=8, threshold=0.5).count()

    qvec = [float(x) for x in
            embeddings.filter(F.col("vec_id") == 0).first()["embedding"]]
    with timed("ann_bruteforce_topk"):
        brute_force_topk(embeddings, qvec, k=10).collect()

    from elephantdb_spark.analytics import sessionize, ts_from_nanos, tumbling_window_agg
    from elephantdb_spark.operators.ann import ivf_topk, train_ivf_centroids

    from elephantdb_spark.analytics import load_events

    events = load_events(spark, SF_DIR)  # ts normalized to long nanos
    with timed("event_window_agg"):
        tumbling_window_agg(
            events, ts_from_nanos(F.col("ts")), ["event_type"],
            [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")],
        ).count()

    with timed("event_sessionize"):
        sessionize(
            events, ts_from_nanos(F.col("ts")), ["user_id"],
            [F.count(F.lit(1)).alias("n")],
        ).count()

    with timed("ann_ivf_topk"):
        cents = train_ivf_centroids(embeddings, n_cells=16)
        ivf_topk(embeddings, qvec, k=10, n_cells=16, n_probe=4,
                 centroids=cents).collect()

    from elephantdb_spark.operators.ann import ivf_knn_join

    # all-pairs top-10 neighbors via cell-cogrouped matmul scoring
    with timed("ann_knn_join_ivf"):
        ivf_knn_join(embeddings, k=10, n_cells=16, n_probe=4,
                     centroids=cents).count()

    # persisted-index serving surface (round-4): train+publish once, then
    # probe as a partition-pruned read — the build amortizes across probes
    from elephantdb_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_probe,
    )

    idx_root = os.path.join(work, "emb_ivf_idx")
    with timed("ann_index_build"):
        build_ivf_index(spark, embeddings, idx_root, n_cells=16, version=1)
    with timed("ann_index_probe"):
        ivf_index_probe(spark, idx_root, qvec, k=10, n_probe=4).collect()

    from elephantdb_spark.operators.ann_index import ivf_index_knn_join

    # batch serving path: 50 probes against the persisted index, cells
    # from the partition layout, arrow cogroup scorer
    with timed("ann_index_knn_join"):
        ivf_index_knn_join(
            spark, idx_root,
            embeddings.filter(F.col("vec_id") < 50),
            k=10, n_probe=4,
        ).count()

    # incremental index maintenance: 100-vector batch merged into touched
    # cells, untouched cells copy-forwarded (the A20 path for ANN)
    from elephantdb_spark.operators.ann_index import update_ivf_index

    with timed("ann_index_update"):
        update_ivf_index(
            spark,
            embeddings.filter(F.col("vec_id") < 100)
            .select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"),
            idx_root, version=2,
        )

    from elephantdb_spark.operators.multimodal import attach_payload, extract_features

    # binary-payload plumbing: mapInPandas feature extraction over Arrow
    # batches (the shape real image/audio decode rides on)
    warm_python_workers()

    with timed("multimodal_features"):
        extract_features(
            attach_payload(documents, "doc_id", "text", "lang", "source")
        ).agg(F.sum("n_bytes")).collect()

    # real media decode throughput: synthesize one PCM16 WAV per document
    # and decode with the stdlib-wave extractor (the q76 path)
    from elephantdb_spark.operators.multimodal import (
        MULTIMODAL_SCHEMA,
        extract_media_features,
        synth_wav,
    )

    def _gen_wavs(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                "id": pdf["doc_id"],
                "payload": [synth_wav(int(n)) for n in pdf["n_chars"]],
                "meta": [
                    {"media_type": "audio/wav", "lang": None, "source": "synth"}
                ] * len(pdf),
            })

    with timed("wav_decode_features"):
        extract_media_features(
            documents.select("doc_id", "n_chars").repartition(CPUS).mapInPandas(
                _gen_wavs, MULTIMODAL_SCHEMA
            )
        ).agg(F.sum("duration_ms")).collect()

    # real PNG decode throughput: synthesize one 8-bit PNG per document
    # and decode with the stdlib-zlib unfiltering extractor (the q92 path)
    from elephantdb_spark.operators.multimodal import synth_png

    def _gen_pngs(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                "id": pdf["doc_id"],
                "payload": [
                    synth_png(int(n) % 64 + 1, int(n) % 32 + 1, int(n) % 4 + 1)
                    for n in pdf["n_chars"]
                ],
                "meta": [
                    {"media_type": "image/png", "lang": None, "source": "synth"}
                ] * len(pdf),
            })

    with timed("png_decode_features"):
        extract_media_features(
            documents.select("doc_id", "n_chars").repartition(CPUS).mapInPandas(
                _gen_pngs, MULTIMODAL_SCHEMA
            )
        ).agg(F.sum("width")).collect()

    # real compressed-image round-trip: per-doc baseline JPEG encode →
    # full entropy decode → nearest-neighbor resize → re-encode
    from elephantdb_spark.operators.multimodal import resize_images

    def _gen_jpegs(batches):
        import numpy as _np
        import pandas as _pd

        from elephantdb_spark.operators.jpeg import encode_jpeg

        def synth(n):
            w, h = n % 32 + 1, n % 16 + 1
            ys, xs = _np.mgrid[0:h, 0:w]
            arr = _np.stack(
                [_np.clip(xs * 3 + ys * 2 + 40 * i, 0, 255) for i in range(3)],
                -1,
            ).astype(_np.uint8)
            return encode_jpeg(arr, quality=85)

        for pdf in batches:
            yield _pd.DataFrame({
                "id": pdf["doc_id"],
                "payload": [synth(int(n)) for n in pdf["n_chars"]],
                "meta": [
                    {"media_type": "image/jpeg", "lang": None, "source": "synth"}
                ] * len(pdf),
            })

    # real video-frame sampling: per-doc animated GIF -> LZW decode ->
    # every-2nd-frame explode (the q95 path)
    from elephantdb_spark.operators.multimodal import sample_frames_df

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
                "meta": [
                    {"media_type": "image/gif", "lang": None, "source": "synth"}
                ] * len(pdf),
            })

    with timed("gif_frame_sampling"):
        sample_frames_df(
            documents.select("doc_id", "n_chars").repartition(CPUS).mapInPandas(
                _gen_gifs, MULTIMODAL_SCHEMA
            ),
            every_n=2,
        ).count()

    # real codec-compressed video (r5): per-doc MJPEG AVI -> RIFF walk ->
    # sampled-frame baseline-JPEG decode (only every-2nd frame decodes)
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
                "meta": [
                    {"media_type": "video/x-msvideo", "lang": None,
                     "source": "synth"}
                ] * len(pdf),
            })

    with timed("avi_frame_sampling"):
        sample_frames_df(
            documents.select("doc_id", "n_chars").repartition(CPUS).mapInPandas(
                _gen_avis, MULTIMODAL_SCHEMA
            ),
            every_n=2,
        ).count()

    with timed("jpeg_roundtrip_resize"):
        resize_images(
            documents.select("doc_id", "n_chars").repartition(CPUS).mapInPandas(
                _gen_jpegs, MULTIMODAL_SCHEMA
            ),
            16, 16,
        ).agg(F.sum(F.length("payload"))).collect()

    from elephantdb_spark.operators.temporal import asof_join

    # as-of join at both plan shapes: the per-key window plan and the
    # hot-key-safe time-bucketed plan (1 h buckets over nanosecond ts) —
    # regressions in either stay visible per-query
    ev = events.select("user_id", "ts", "event_id", "value")
    asof_right = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("value").alias("ref_value")
    )
    asof_left = ev.select("user_id", "ts", "event_id")
    with timed("asof_join_events"):
        asof_join(
            asof_left, asof_right, "user_id", "user_id", "ts", "ts",
            ["ref_value"],
        ).count()
    with timed("asof_join_events_bucketed"):
        asof_join(
            asof_left, asof_right, "user_id", "user_id", "ts", "ts",
            ["ref_value"], time_bucket_width=3_600_000_000_000,
        ).count()

    from elephantdb_spark.functions.text import text_profile

    with timed("text_analysis_documents"):
        text_profile(documents, "text").agg(
            F.sum("n_tokens"), F.max("fp"), F.avg("stop_ratio"), F.avg("avg_tok_len")
        ).collect()

    from elephantdb_spark.functions.text import token_count_col
    from elephantdb_spark.operators.quality import (
        contamination_hits,
        repetition_profile,
        tfidf_topk,
    )
    from elephantdb_spark.operators.sampling import pack_sequences

    # zero-shuffle scan-stage repetition signals (Gopher quality filters)
    with timed("quality_repetition_profile"):
        repetition_profile(documents, "doc_id", "text").agg(
            F.avg("dup_ngram_frac"), F.avg("top_ngram_frac")
        ).collect()

    # broadcast-benchmark contamination sweep (corpus side never shuffles)
    with timed("quality_contamination"):
        contamination_hits(
            documents.filter(F.col("doc_id") % 41 != 0),
            documents.filter(F.col("doc_id") % 41 == 0),
            "doc_id", "text", 3,
        ).count()

    with timed("quality_tfidf_topk"):
        tfidf_topk(documents, "doc_id", "text", 3).count()

    # BM25 probe-query ranking: broadcast query terms, one token-stream
    # scan + 1-row stats scan, fixed-point scores, two-stage top-k
    from elephantdb_spark.extensions import _BM25_QUERIES
    from elephantdb_spark.operators.retrieval import bm25_topk

    with timed("bm25_search"):
        bm25_topk(
            documents,
            spark.createDataFrame(_BM25_QUERIES, "query_id int, query_text string"),
            "doc_id", "text", k=10,
        ).count()

    # windowed cumulative-sum sequence packing per language
    with timed("sampling_pack_sequences"):
        pack_sequences(
            documents.select("doc_id", "lang", "text"), ["lang"], "doc_id",
            token_count_col(F.col("text")), 512,
        ).count()

    # reproducible global shuffle into balanced training shards: one
    # exchange (exact file→partition slots) + in-partition sort + write
    from elephantdb_spark.operators.sampling import write_shuffled_export

    export_dir = os.path.join(tempfile.mkdtemp(prefix="edb_bench_exp_"), "shards")
    with timed("shuffled_export_write"):
        write_shuffled_export(spark, documents, export_dir, "doc_id", 16, "ep0")
    shutil.rmtree(os.path.dirname(export_dir), ignore_errors=True)

    from elephantdb_spark.functions.redact import pii_count_col, redact_pii
    from elephantdb_spark.operators.components import connected_components
    from elephantdb_spark.operators.dedup import jaccard_shingle_pairs
    from elephantdb_spark.operators.lm import train_ngram_lm

    # near-dup graph → clusters, timed in two stages (round-2 verdict: the
    # single 14.6 s entry hid whether pair generation or the iterative CC
    # rounds dominate). Pair-gen materializes via eager localCheckpoint
    # (RDD-level storage — survives the between-entry clearCache) so the
    # components entry times ONLY the label-propagation rounds.
    neardup_corpus = documents.select("doc_id", "text").unionByName(
        documents.filter(F.col("doc_id") < 250).select(
            (F.col("doc_id") + 200_000).alias("doc_id"),
            F.expr("substring(text, 12)").alias("text"),
        )
    )
    with timed("neardup_pairgen"):
        cc_pairs = jaccard_shingle_pairs(
            neardup_corpus, "doc_id", "text", shingle_len=3, threshold=0.5
        ).localCheckpoint(eager=True)
    with timed("neardup_components"):
        connected_components(cc_pairs, "a", "b").count()
    cc_pairs.unpersist()

    # repeated-substring profile (ExactSubstr-lite): strided char grams,
    # digest-keyed distinct-doc counts, broadcast hot set
    from elephantdb_spark.operators.dedup import repeated_span_profile

    with timed("repeated_span_profile"):
        repeated_span_profile(
            neardup_corpus, "doc_id", "text", gram_chars=40, stride=20
        ).agg(F.sum("n_hot_spans")).collect()

    # bigram LM training: explode + count + per-prefix window
    with timed("lm_train_bigram"):
        train_ngram_lm(documents, "text", n=2).count()

    # BPE (r5): round-0 merge statistics (the per-iteration aggregation
    # shape) and the zero-shuffle corpus encode with a fixed merge table
    from elephantdb_spark.operators.bpe import apply_bpe, initial_pair_counts

    with timed("bpe_pair_counts"):
        initial_pair_counts(documents, "text").orderBy(
            F.col("count").desc(), "a", "b"
        ).limit(20).collect()

    with timed("bpe_encode"):
        apply_bpe(
            documents, "doc_id", "text",
            [("e", "s"), ("es", "t"), ("t", "h"), ("th", "e"), ("i", "n")],
        ).agg(F.sum("n_bpe_tokens")).collect()

    # full production-shape training run (r6): ONE corpus pass + the
    # driver-side incremental merge loop — 1000 requested merges complete
    # in ~the cost of the corpus pass (the synthetic vocab saturates at
    # ~107 merges; a real 1M-word vocab adds only in-memory loop time)
    from elephantdb_spark.operators.bpe import train_bpe

    with timed("bpe_train_1k"):
        assert len(train_bpe(documents, "text", 1000, min_pair_count=1)) > 50

    # skew path (verdict r2 item 8): detect hot keys then join through the
    # explicit salting operator on synthetic celebrity-key data (~1/3 of
    # all event rows collapsed onto one user_id)
    from elephantdb_spark.functions.skew import hot_keys, salted_join

    skewed = events.select(
        F.when(F.col("event_id") % 3 == 0, F.lit(1))
        .otherwise(F.col("user_id")).alias("user_id"),
        "value",
    )
    user_dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    # hot-key floor scales with the SF so the bench also runs at sf0.01
    # (~1/3 of event rows land on user_id 1 at any SF)
    hot_floor = max(100, events.count() // 6)
    with timed("skew_hot_keys_salted_join"):
        assert 1 in hot_keys(skewed, "user_id", min_rows=hot_floor)
        salted_join(skewed, user_dim, "user_id", num_salts=8).count()

    # curation stages (operators/curation): scan-stage normalize + rule
    # filter; skew-aware per-source cap; vocab build + broadcast encode
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

    # HTML main-text extraction (stdlib parser, mapInPandas scan stage):
    # per-doc page template -> title + block text (the q96 path)
    from elephantdb_spark.operators.html import extract_html_text

    warm_python_workers()

    wrapped_html = documents.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title><style>p{}</style></head><body><h1>H</h1><p>"),
            F.replace(F.col("text"), F.lit(" the "), F.lit("</p><p>")),
            F.lit("</p><script>var x=1;</script></body></html>"),
        ).alias("html"),
    ).repartition(CPUS)
    with timed("html_text_extraction"):
        extract_html_text(wrapped_html, "doc_id", "html").agg(
            F.sum(F.length("text"))
        ).collect()

    # WARC archive explode + HTTP strip + HTML extract: the q97 ingest
    # chain over per-doc synthesized archives
    from elephantdb_spark.sources.warc import warc_records_df

    def _gen_warcs(batches):
        import pandas as _pd

        from elephantdb_spark.sources.warc import build_warc

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

    with timed("warc_ingest_chain"):
        recs = warc_records_df(
            documents.select("doc_id", "text").repartition(CPUS).mapInPandas(
                _gen_warcs, "doc_id long, warc binary"
            ),
            "doc_id", "warc",
        )
        extract_html_text(
            recs.select(F.col("id").alias("doc_id"),
                        F.decode(F.col("body"), "UTF-8").alias("html")),
            "doc_id", "html",
        ).agg(F.sum(F.length("text"))).collect()

    # regex-chain redaction sweep (JVM regexp, scan-stage)
    with timed("redact_pii_sweep"):
        documents.select(
            F.sum(F.length(redact_pii(F.col("text")))),
            F.sum(pii_count_col(F.col("text"), "email")),
        ).collect()

    shutil.rmtree(work, ignore_errors=True)
    return timings, serving_stats


def main() -> None:
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    spark = get_spark(app_name="edb-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sparkContext.setLogLevel("ERROR")

    load_before = os.getloadavg()
    t_wall0 = time.perf_counter()

    # session-envelope bracket, leg 1 (VERDICT r13 item 1): probe the
    # host's serving envelope with the official instrument BEFORE the
    # passes; leg 2 runs after them, so the regime during the official
    # draw is bounded from both sides.  Best-effort: a probe failure
    # degrades the line's envelope to null, never kills the bench.
    env_pre: list[dict] = []
    env_post: list[dict] = []
    env_discard: dict | None = None
    env_dom = env_keys = None
    env_work = None
    if ENVELOPE_WINDOWS_PER_SIDE > 0:
        try:
            env_dom, env_keys, env_work = build_envelope_fixture(spark)
            _env_jvm = spark_jvm_pid(spark)
            # warmup-discard window (VERDICT r14 item 4): the first
            # full-shape window after a fresh JVM pays JIT + thread-pool
            # + page-cache warmup the fixture's single warm multi_get
            # does not cover (r14: fresh-JVM pre-floors >=3.5 s vs
            # post-floors <=1.0 s on identical bytes).  Draw one window,
            # record it, exclude it from the bracket floors/verdict.
            env_discard = serving_window(
                env_dom, env_keys, jvm_pid=_env_jvm
            )
            draw_bracket_leg(
                lambda: serving_window(env_dom, env_keys, jvm_pid=_env_jvm),
                ENVELOPE_WINDOWS_PER_SIDE, env_pre,
            )
        except Exception as e:
            print(f"WARN: envelope pre-bracket failed: {e}", file=sys.stderr)

    raw: list[dict] = []
    servings: list[dict] = []
    for p in range(passes):
        timings, serving_stats = run_pass(spark, p)
        raw.append(timings)
        servings.append(serving_stats)

    if env_dom is not None:
        try:
            _post_jvm = spark_jvm_pid(spark)
            draw_bracket_leg(
                lambda: serving_window(env_dom, env_keys, jvm_pid=_post_jvm),
                ENVELOPE_WINDOWS_PER_SIDE, env_post,
            )
        except Exception as e:
            print(f"WARN: envelope post-bracket failed: {e}", file=sys.stderr)
    if env_work is not None:
        shutil.rmtree(env_work, ignore_errors=True)
    spark.stop()

    # per-entry min-merge; total = sum of merged entries (the structural
    # cost of one pass on an idle machine, not passes x wall time)
    merged = {
        name: min(t[name] for t in raw if name in t) for name in raw[0]
    }
    # serving stats travel as a block: take the pass with the fastest
    # concurrent-probe wall time (its qps/latency figures are coherent).
    # Each pass's block is already the min-fold of its k unconditional
    # windows, so the chosen block's figure IS the min over all passes'
    # windows (r11 VERDICT item 1).  The final line's windows audit is
    # the CONCATENATION across passes — every sample drawn this run,
    # >=9 on a default 3-pass run — so a low figure is distinguishable
    # from an under-sampled one without opening the raw-passes file.
    best_serving = min(
        range(len(raw)),
        key=lambda i: raw[i].get("local_multiget_concurrent_8t", float("inf")),
    )
    final_serving = build_final_serving(servings, best_serving)
    # envelope-relative serving verdict (VERDICT r13 item 1): scalars
    # ride the line; the full bracket window audit goes to the
    # raw-passes side file (the line budget stays bounded)
    final_serving["envelope"] = build_envelope_block(
        env_pre, env_post, final_serving.get("keys_per_sec"),
        discard_window=env_discard,
    )
    total = round(sum(merged.values()), 3)
    here = os.path.dirname(os.path.abspath(__file__))
    provenance = {
        "merge": "per-entry min over warm passes in one JVM",
        "pass_count": passes,
        "serving_from_pass": best_serving,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "wall_sec_all_passes": round(time.perf_counter() - t_wall0, 1),
        "cpus": CPUS,
    }
    # raw per-pass timings + per-pass serving blocks = the audit trail for
    # the min-merge; a side file, NEVER the stdout line (VERDICT r7 item 1).
    # Round-stamped (r9 VERDICT item 2): each run writes a fresh
    # BENCH_raw_passes_r{N}*.json so driver-run per-query history survives
    # across rounds; the final line's queries_file names the stamped file.
    provenance["raw_passes_file"] = write_raw_passes(here, {
        "queries": merged,
        "raw_passes": raw,
        "serving_passes": servings,
        # the FULL folded serving block incl. windows audit + envelope:
        # the stdout line may slim serving to scalars to fit the queries
        # map inside the driver's capture window (r19), so the complete
        # block must survive here
        "serving_final": final_serving,
        # full bracket audit: every envelope window as [wall, ext]
        "envelope_windows": {
            "discard": compact_window(env_discard) if env_discard else None,
            "pre": [compact_window(w) for w in env_pre],
            "post": [compact_window(w) for w in env_post],
        },
        "provenance": provenance,
    })
    print(build_final_line(total, merged, final_serving,
                           _sf_tag(SF_DIR), passes, provenance))


# The driver captures only the LAST 2,000 characters of stdout and parses
# the final line as JSON (measured: BENCH_r07/r08.json both carry exactly
# 2,000-char front-truncated tails -> parsed:null two rounds running, and
# every BENCH_r*.json tail since is exactly 2,000 chars).  The r18 VERDICT
# (item 1) requires the per-entry map ON the line — PERF_r18 computed
# nothing per-query because the line carried only the total — so the line
# is now built in TIERS: the queries map is the priority payload and the
# serving/provenance blocks degrade to scalars when (and only when) the
# full blocks would push the line past the capture window.  Whatever the
# line drops stays in the round-stamped raw-passes side file ("queries",
# "serving_final", "provenance" keys; the line's queries_file names it).
# tests/test_bench_contract.py pins the budget so added entries can't
# regress this.  The hard bound is 1,999 (the capture window minus the
# line's own trailing newline); 1,990 leaves a 9-char guard.
FINAL_LINE_MAX_CHARS = 1990


def stamped_artifact_name(here: str, prefix: str) -> str:
    """Round-stamped ``{prefix}_r{N}[_k].json`` filename that does not
    exist yet.

    The round number is inferred as 1 + the highest driver-recorded
    ``BENCH_r{N}.json`` (the driver writes that file AFTER the round's
    bench run, so during round N the max on disk is N-1).  Extra runs
    inside one round (solo sessions, re-runs) get ``_2``, ``_3``, ...
    suffixes rather than ever reusing a name: per-run artifact history
    must survive across rounds (r9 VERDICT items 2/5 — the unstamped
    BENCH_raw_passes.json was overwritten in place each run, destroying
    round-over-round per-query diffs).  Shared by the raw-passes audit
    file and the envelope probe's PROBE_r{N}.json (VERDICT r13 item 2).
    """
    import re

    rounds = [0]
    try:
        names = os.listdir(here)
    except OSError:
        names = []
    for base in names:
        m = re.fullmatch(r"BENCH_r(\d+)\.json", base)
        if m:
            rounds.append(int(m.group(1)))
    rnd = max(rounds) + 1
    name = f"{prefix}_r{rnd:02d}.json"
    k = 2
    while os.path.exists(os.path.join(here, name)):
        name = f"{prefix}_r{rnd:02d}_{k}.json"
        k += 1
    return name


def stamped_raw_passes_name(here: str) -> str:
    """The raw-passes audit file's round-stamped name (see
    :func:`stamped_artifact_name`)."""
    return stamped_artifact_name(here, "BENCH_raw_passes")


def write_raw_passes(here: str, payload: dict) -> str | None:
    """Write the raw-passes audit payload to a fresh round-stamped file.

    Never clobbers an existing stamped file: the name comes from
    :func:`stamped_raw_passes_name` and the create is exclusive
    (``"x"``), retrying with the next free suffix on a race.  The chosen
    name is recorded into ``payload["provenance"]["raw_passes_file"]``
    before dumping (the on-disk artifact self-describes) and returned
    for the stdout line.  Also refreshes the unstamped
    ``BENCH_raw_passes.json`` latest-run alias for existing tooling —
    that alias is the ONLY file this writer may overwrite.

    Failure honesty (ADVICE r10 item 1): when the stamped create fails
    (read-only checkout, or all 100 race retries exhausted) the stdout
    line must not advertise a file that was never written — provenance
    degrades to the alias name if the alias write succeeded, else to
    None, and ``raw_passes_degraded`` records why.
    """
    name = stamped_raw_passes_name(here)
    prov = payload.setdefault("provenance", {})
    stamped_ok = False
    for _ in range(100):
        prov["raw_passes_file"] = name
        try:
            with open(os.path.join(here, name), "x") as f:
                json.dump(payload, f, indent=1)
            stamped_ok = True
            break
        except FileExistsError:  # raced a concurrent run
            name = stamped_raw_passes_name(here)
        except OSError as e:  # a read-only checkout must not kill the bench
            print(f"WARN: could not write {name}: {e}", file=sys.stderr)
            break
    if not stamped_ok:
        # degrade BEFORE the alias dump so the on-disk alias (the only
        # surviving artifact) self-describes with the truth
        prov["raw_passes_file"] = "BENCH_raw_passes.json"
        prov["raw_passes_degraded"] = "stamped write failed; alias only"
    try:
        with open(os.path.join(here, "BENCH_raw_passes.json"), "w") as f:
            json.dump(payload, f, indent=1)
    except OSError as e:
        print(f"WARN: could not refresh latest alias: {e}", file=sys.stderr)
        if not stamped_ok:  # nothing on disk at all
            prov["raw_passes_file"] = None
            prov["raw_passes_degraded"] = "no raw-passes artifact written"
    return prov["raw_passes_file"]


def slim_serving(serving, level: int) -> dict | None:
    """Scalar subsets of the serving block for the tiered line builder.

    Level 1 keeps the headline figures plus the contention/regime
    verdicts (drops the windows audit list and the envelope details —
    both stay in the raw-passes side file's ``serving_final``).  Level 2
    keeps only keys/sec + the two verdicts.  The envelope's
    ``regime_consistent`` bit is hoisted to the top of the slim block so
    the regime verdict survives every tier that carries serving at all.
    """
    if not serving:
        return serving
    keys = (
        ("keys_per_sec", "per_key_p50_ms", "per_key_p99_ms",
         "contended", "serving_retried")
        if level <= 1 else ("keys_per_sec", "contended")
    )
    out = {k: serving[k] for k in keys if k in serving}
    env = serving.get("envelope")
    if env is not None:
        out["regime_consistent"] = env.get("regime_consistent")
    return out


def build_final_line(total, merged, serving, sf, passes, provenance) -> str:
    """Compact machine-readable last stdout line (<= FINAL_LINE_MAX_CHARS).

    The per-entry ``queries`` map is the priority payload (r18 VERDICT
    item 1: the driver's PERF comparison reads per-entry seconds from
    THIS line; the side file is not consulted).  Tiers, first that fits:

    0. everything the pre-r19 line carried, plus queries at 3 decimals;
    1. queries at 3 decimals, serving slimmed to scalars, provenance
       reduced to the pass count (the full blocks live in the side file);
    2. queries at 2 decimals, serving at its minimal scalar form;
    3. queries at 2 decimals, no serving;
    4. legacy no-queries line (honest degrade — the capture window is a
       hard driver bound and a corrupt line loses the total too);
    5. bare scalars.
    """
    queries_file = (provenance or {}).get(
        "raw_passes_file", "BENCH_raw_passes.json"
    )

    def q(nd):
        return {k: round(float(v), nd) for k, v in (merged or {}).items()}

    head = {"metric": "total_bench_sec", "value": total, "unit": "sec"}
    tiers = [
        dict(head, n_queries=len(merged), queries=q(3), serving=serving,
             sf=sf, passes=passes, provenance=provenance,
             queries_file=queries_file),
        dict(head, n_queries=len(merged), queries=q(3),
             serving=slim_serving(serving, 1), sf=sf, passes=passes,
             queries_file=queries_file),
        dict(head, queries=q(2), serving=slim_serving(serving, 2), sf=sf,
             passes=passes, queries_file=queries_file),
        dict(head, queries=q(2), sf=sf, passes=passes,
             queries_file=queries_file),
        dict(head, n_queries=len(merged), sf=sf, passes=passes,
             queries_file=queries_file),
        {"metric": "total_bench_sec", "value": round(float(total), 3),
         "unit": "sec"},
    ]
    for tier in tiers:
        line = json.dumps(tier, separators=(",", ":"))
        if len(line) <= FINAL_LINE_MAX_CHARS:
            return line
    # absolute driver-contract guarantee; unreachable (the last tier
    # is ~60 chars), but the budget must hold UNCONDITIONALLY
    return line[:FINAL_LINE_MAX_CHARS]


if __name__ == "__main__":
    main()
