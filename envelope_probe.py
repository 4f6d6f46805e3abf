#!/usr/bin/env python
"""Standalone serving-envelope probe (VERDICT r13 items 1-2).

The r13 session measured a 2.9x same-bytes swing in the host's serving
window floor (1.044 s -> 2.992 s across three identical probes on an
engine byte-identical to the 9,651.9 keys/s r12 tree, with in-window
external cores ~0 throughout — SCALE.md §r13).  The classification
"host regime, not regression" rested on a /tmp-only script; this file
is that instrument, committed and round-stamped so the classification
is re-runnable verbatim from git.

What it does: builds the bench's exact serving fixture (lineitem_kv at
$SPARK_GRAFT_SF_DIR, 32 shards, the 1000-key draw, one untimed warm
probe), then draws N (default 24, $SPARK_GRAFT_PROBE_WINDOWS) serving
windows of the official shape — 8 threads x 10 batches of 100 keys
through ONE Domain handle with the in-window /proc external-cores
instrument — by calling bench.py's ``serving_window`` itself, so the
probe and the official bench measure with IDENTICAL code.  Writes a
round-stamped ``PROBE_r{N}[_k].json`` next to this script
(exclusive-create, never clobbers a stamped artifact) and prints one
compact JSON summary line.

Reading a probe against an official BENCH_r{N}.json uses the criterion
in PLANS.md §r14: official serving keys/s within ENVELOPE_TOLERANCE
(1.25x) of the session probe's best-window keys/s ⇒ regime-consistent;
worse ⇒ investigate as a regression.  bench.py also runs a smaller
bracket of the same windows before/after its passes and ships the
verdict on its own line (``serving.envelope``); this standalone form
exists for focused envelope studies at the session's chosen moment —
the r13 methodology was 24 windows at the idlest observable state.

The reference's serving path this instrument protects is the multiGet
scatter-gather (elephantdb keyval/core.clj:118-134).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import (  # noqa: E402  (the shared instrument — VERDICT r13 item 2)
    CPUS,
    SERVING_KEYS_PER_WINDOW,
    SF_DIR,
    _sf_tag,
    build_envelope_fixture,
    compact_window,
    serving_window,
    spark_jvm_pid,
    stamped_artifact_name,
)

PROBE_WINDOWS = max(1, int(os.environ.get("SPARK_GRAFT_PROBE_WINDOWS", "24")))
QUIET_EXT_CORES = 0.5  # a window counts as externally quiet below this


def fold_probe_windows(
    windows: list, keys_per_window: int = SERVING_KEYS_PER_WINDOW
) -> dict:
    """Fold drawn windows into the probe's summary (pure — the sparkless
    tests pin it).  The FLOOR (min wall) is the figure the envelope
    criterion consumes: it is the session's demonstrated serving
    capability, and under one-sided noise the min is the right
    estimator (same rationale as the bench's per-entry min-merge).

    Raises ValueError on an empty window list — a probe that measured
    nothing must fail loudly, never emit a fabricated envelope."""
    if not windows:
        raise ValueError("fold_probe_windows: no windows drawn")
    walls = sorted(w["wall"] for w in windows)
    exts = [w.get("ext_busy_cores") for w in windows]
    known_exts = [e for e in exts if e is not None]
    floor = walls[0]
    return {
        "floor_wall_sec": round(floor, 3),
        "best_keys_per_sec": round(keys_per_window / floor, 1),
        # statistics.median (ADVICE r14): the old upper-middle sample
        # overstated the typical wall for even window counts (the
        # default 24); the true median averages the two middle samples
        "median_wall_sec": round(statistics.median(walls), 3),
        "worst_wall_sec": round(walls[-1], 3),
        "n_windows": len(windows),
        # how many windows the external-cores instrument read as quiet —
        # 22/24 quiet with a 2.9x floor swing is the r13 signature of
        # sub-/proc interference (regime), not tenant CPU
        "n_quiet": sum(1 for e in known_exts if e <= QUIET_EXT_CORES),
        "max_ext_busy_cores": (
            round(max(known_exts), 1) if known_exts else None
        ),
        "n_contended": sum(1 for w in windows if w.get("contended")),
        # full audit: every window as [wall_sec, ext_busy_cores]
        "windows": [compact_window(w) for w in windows],
    }


def write_probe_artifact(here: str, payload: dict) -> str | None:
    """Write the probe payload to a fresh round-stamped PROBE file.

    Exclusive-create like the bench's raw-passes writer: a stamped
    artifact is never clobbered (re-runs get ``_2``/``_3`` suffixes),
    and on total failure the function returns None after warning —
    the stdout summary then carries an honest null artifact name."""
    name = stamped_artifact_name(here, "PROBE")
    for _ in range(100):
        payload["artifact"] = name
        try:
            with open(os.path.join(here, name), "x") as f:
                json.dump(payload, f, indent=1)
            return name
        except FileExistsError:  # raced a concurrent run
            name = stamped_artifact_name(here, "PROBE")
        except OSError as e:
            print(f"WARN: could not write {name}: {e}", file=sys.stderr)
            break
    payload["artifact"] = None
    return None


def finalize_probe_summary(
    windows: list, requested: int, build_sec: float,
    load_before, load_after,
) -> dict:
    """Fold drawn windows into the artifact payload (pure — sparkless
    tests pin it).  A run that drew fewer windows than requested (the
    crash-salvage path below) is stamped ``partial: true`` so a
    short-sample floor is never mistaken for a full 24-window study;
    ``windows_requested`` always records the plan."""
    summary = fold_probe_windows(windows)
    summary["windows_requested"] = requested
    if len(windows) < requested:
        summary["partial"] = True
    summary["sf"] = _sf_tag(SF_DIR)
    summary["cpus"] = CPUS
    summary["fixture_build_sec"] = round(build_sec, 1)
    summary["loadavg_before"] = [round(x, 2) for x in load_before]
    summary["loadavg_after"] = [round(x, 2) for x in load_after]
    return summary


def main() -> None:
    from elephantdb_spark.session import get_spark

    spark = get_spark(app_name="edb-envelope-probe",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sparkContext.setLogLevel("ERROR")

    load_before = os.getloadavg()
    t0 = time.perf_counter()
    # fixture failure: build_envelope_fixture cleans its own work dir;
    # we still own the Spark session
    try:
        dom, keys, work = build_envelope_fixture(spark)
    except BaseException:
        spark.stop()
        raise
    build_sec = time.perf_counter() - t0
    jvm_pid = spark_jvm_pid(spark)

    # the window loop is try/finally (ADVICE r14): an exception at
    # window k must not leak the work dir or the Spark session, and the
    # k-1 already-drawn windows of a long run are salvaged into a
    # partial artifact rather than discarded
    windows: list[dict] = []
    err: BaseException | None = None
    try:
        for i in range(PROBE_WINDOWS):
            w = serving_window(dom, keys, jvm_pid=jvm_pid)
            windows.append(w)
            print(
                f"window {i + 1:2d}/{PROBE_WINDOWS}: wall {w['wall']:.3f}s "
                f"ext {w['ext_busy_cores'] if w['ext_busy_cores'] is None else round(w['ext_busy_cores'], 1)} "
                f"contended {w['contended']}",
                file=sys.stderr,
            )
    except BaseException as e:
        err = e
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    if err is not None and not windows:
        raise err  # nothing to salvage — fail as before

    summary = finalize_probe_summary(
        windows, PROBE_WINDOWS, build_sec, load_before, os.getloadavg()
    )
    if err is not None:
        summary["error"] = f"{type(err).__name__}: {err}"
    here = os.path.dirname(os.path.abspath(__file__))
    write_probe_artifact(here, summary)
    print(json.dumps(summary, separators=(",", ":")))
    if err is not None:
        raise err  # partial artifact written; the run still failed


if __name__ == "__main__":
    main()
