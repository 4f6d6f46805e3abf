"""Sparkless tests for envelope_probe.py (VERDICT r13 item 2).

The r13 host-regime classification rests on this instrument; its window
fold and artifact stamping must be pinned without a SparkSession so the
probe is verifiable from git alone.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_HERE = os.path.dirname(__file__)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def probe_mod():
    # envelope_probe imports the shared instrument from bench at module
    # load; both imports are side-effect-free (Spark only inside main())
    mod = _load(
        os.path.join(_HERE, "..", "envelope_probe.py"), "probe_under_test"
    )
    yield mod
    sys.modules.pop("probe_under_test", None)
    sys.modules.pop("bench", None)


def _win(wall, ext=0.0, contended=False):
    return {"wall": wall, "ext_busy_cores": ext, "contended": contended}


def test_fold_floor_and_best_keys_per_sec(probe_mod):
    """The floor (min wall) is the criterion figure: 8000 keys per
    window / floor = the session's demonstrated serving capability."""
    windows = [_win(2.1, 0.3), _win(1.044, 0.0), _win(1.5, 1.2)]
    s = probe_mod.fold_probe_windows(windows)
    assert s["floor_wall_sec"] == 1.044
    assert s["best_keys_per_sec"] == round(8000 / 1.044, 1)  # 7662.8
    assert s["median_wall_sec"] == 1.5
    assert s["worst_wall_sec"] == 2.1
    assert s["n_windows"] == 3
    assert s["windows"] == [[2.1, 0.3], [1.044, 0.0], [1.5, 1.2]]


def test_fold_quiet_and_contention_census(probe_mod):
    """22/24 quiet windows alongside a large floor swing is the r13
    sub-/proc-interference signature — the fold must count it."""
    windows = (
        [_win(1.1 + 0.01 * i, 0.0) for i in range(22)]
        + [_win(2.9, 9.4, True), _win(2.4, 0.4)]
    )
    s = probe_mod.fold_probe_windows(windows)
    assert s["n_windows"] == 24
    assert s["n_quiet"] == 23  # ext <= 0.5 counts as quiet (0.4 does)
    assert s["n_contended"] == 1
    assert s["max_ext_busy_cores"] == 9.4


def test_fold_handles_null_ext_instrument(probe_mod):
    """Where /proc is unavailable the ext instrument reads None per
    window; the fold must not crash and must report max_ext as null."""
    windows = [_win(1.2, None), _win(1.4, None)]
    s = probe_mod.fold_probe_windows(windows)
    assert s["max_ext_busy_cores"] is None
    assert s["n_quiet"] == 0  # unknown is never claimed quiet
    assert s["windows"] == [[1.2, None], [1.4, None]]


def test_fold_empty_raises(probe_mod):
    """A probe that drew nothing must fail loudly, never emit a
    fabricated envelope."""
    with pytest.raises(ValueError, match="no windows"):
        probe_mod.fold_probe_windows([])


def test_write_probe_artifact_stamps_and_never_clobbers(
    probe_mod, tmp_path
):
    """PROBE artifacts ride the same round-stamping as the raw-passes
    chain: round = 1 + max BENCH_r{N}.json on disk, re-runs uniquify,
    an existing stamped file is never overwritten."""
    (tmp_path / "BENCH_r13.json").write_text("{}")
    payload = {"floor_wall_sec": 1.044}
    name = probe_mod.write_probe_artifact(str(tmp_path), payload)
    assert name == "PROBE_r14.json"
    on_disk = json.loads((tmp_path / name).read_text())
    assert on_disk["floor_wall_sec"] == 1.044
    assert on_disk["artifact"] == name  # self-describing

    # second run in the same round: _2 suffix, first file untouched
    name2 = probe_mod.write_probe_artifact(str(tmp_path), {"x": 1})
    assert name2 == "PROBE_r14_2.json"
    assert json.loads((tmp_path / "PROBE_r14.json").read_text())[
        "floor_wall_sec"
    ] == 1.044


def test_write_probe_artifact_degrades_to_none_on_failure(
    probe_mod, tmp_path
):
    """Total write failure returns None and marks the payload — the
    stdout summary never advertises a file that was never written."""
    target = tmp_path / "not_a_dir"
    target.write_text("")  # a FILE: open(join(file, name)) -> OSError
    payload = {"x": 1}
    assert probe_mod.write_probe_artifact(str(target), payload) is None
    assert payload["artifact"] is None


# ---- property pins: fold + envelope verdict invariants -----------------

from hypothesis import given  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_walls = st.floats(min_value=0.05, max_value=60.0,
                   allow_nan=False, allow_infinity=False)
_exts = st.one_of(st.none(), st.floats(min_value=0.0, max_value=32.0,
                                       allow_nan=False))
_windows = st.lists(
    st.builds(lambda w, e: {"wall": w, "ext_busy_cores": e,
                            "contended": False},
              _walls, _exts),
    min_size=1, max_size=30,
)


@given(_windows)
def test_fold_probe_windows_invariants(probe_mod, windows):
    """floor = min wall exactly; best_keys_per_sec consistent with it;
    counts bounded by n_windows; inputs not mutated."""
    import copy

    snapshot = copy.deepcopy(windows)
    s = probe_mod.fold_probe_windows(windows)
    floor = min(w["wall"] for w in windows)
    assert s["floor_wall_sec"] == round(floor, 3)
    assert s["best_keys_per_sec"] == round(8000 / floor, 1)
    assert s["floor_wall_sec"] <= s["median_wall_sec"] <= s["worst_wall_sec"]
    assert s["n_windows"] == len(windows)
    assert 0 <= s["n_quiet"] <= len(windows)
    assert 0 <= s["n_contended"] <= len(windows)
    assert len(s["windows"]) == len(windows)
    assert windows == snapshot  # pure


@given(_windows, _windows,
       st.floats(min_value=10.0, max_value=100000.0, allow_nan=False))
def test_envelope_block_verdict_matches_definition(
    bench_mod, pre, post, official
):
    """regime_consistent must equal the PLANS.md §r14 definition
    exactly: official * tolerance >= keys_per_window / min(all walls);
    the verdict can never disagree with the recorded scalars."""
    env = bench_mod.build_envelope_block(pre, post, official)
    assert env is not None
    probe_best = 8000 / min(w["wall"] for w in pre + post)
    assert env["regime_consistent"] == (official * 1.25 >= probe_best)
    assert env["probe_best_keys_per_sec"] == round(probe_best, 1)
    # the ratio and the verdict agree up to rounding at the boundary
    if env["official_over_probe_best"] < 0.79:
        assert env["regime_consistent"] is False
    if env["official_over_probe_best"] > 0.81:
        assert env["regime_consistent"] is True


@pytest.fixture(scope="module")
def bench_mod(probe_mod):
    # the probe module imported bench under its canonical name
    return sys.modules["bench"]


# ---- ADVICE r14 + VERDICT r14 item 4 regression pins --------------------


def test_fold_even_count_median_is_true_median(probe_mod):
    """ADVICE r14: walls[len//2] was the UPPER-middle sample — for the
    default 24-window probe that overstated the typical wall.  The true
    median of an even count averages the two middle samples."""
    windows = [_win(w) for w in (1.0, 1.2, 1.4, 2.0)]
    s = probe_mod.fold_probe_windows(windows)
    assert s["median_wall_sec"] == 1.3  # (1.2 + 1.4) / 2, NOT 1.4
    # odd counts unchanged: the middle sample is still the median
    s3 = probe_mod.fold_probe_windows([_win(w) for w in (1.0, 1.5, 9.0)])
    assert s3["median_wall_sec"] == 1.5


def test_finalize_probe_summary_full_run_not_partial(probe_mod):
    """A run that drew every requested window carries no partial flag
    and records the plan in windows_requested."""
    windows = [_win(1.1), _win(1.2), _win(1.0)]
    s = probe_mod.finalize_probe_summary(
        windows, requested=3, build_sec=12.34,
        load_before=(1.0, 2.0, 3.0), load_after=(4.0, 5.0, 6.0),
    )
    assert "partial" not in s
    assert s["windows_requested"] == 3
    assert s["n_windows"] == 3
    assert s["fixture_build_sec"] == 12.3
    assert s["loadavg_before"] == [1.0, 2.0, 3.0]
    assert s["loadavg_after"] == [4.0, 5.0, 6.0]


def test_finalize_probe_summary_salvaged_run_is_partial(probe_mod):
    """ADVICE r14: a crash at window k now salvages the k-1 drawn
    windows into a partial artifact instead of discarding them — and
    the artifact must SAY it is partial so a short-sample floor is
    never read as a full study."""
    windows = [_win(1.1), _win(0.9)]
    s = probe_mod.finalize_probe_summary(
        windows, requested=24, build_sec=10.0,
        load_before=(0.0, 0.0, 0.0), load_after=(0.0, 0.0, 0.0),
    )
    assert s["partial"] is True
    assert s["windows_requested"] == 24
    assert s["n_windows"] == 2
    assert s["floor_wall_sec"] == 0.9  # the salvage keeps the fold


def test_finalize_probe_summary_empty_still_raises(probe_mod):
    """Zero drawn windows have nothing to salvage: the loud-failure
    contract of fold_probe_windows carries through."""
    with pytest.raises(ValueError, match="no windows"):
        probe_mod.finalize_probe_summary(
            [], requested=24, build_sec=1.0,
            load_before=(0, 0, 0), load_after=(0, 0, 0),
        )
