"""Tests for diff_raw_passes.py — the per-entry raw-passes comparator
(r10 VERDICT next-round item 3: the round-stamped artifact chain makes
driver-to-driver per-entry diffs possible; this tool consumes it)."""
from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_TOOL_PATH = os.path.join(os.path.dirname(__file__), "..", "diff_raw_passes.py")


@pytest.fixture(scope="module")
def tool():
    spec = importlib.util.spec_from_file_location("diff_under_test", _TOOL_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["diff_under_test"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("diff_under_test", None)


def test_diff_ratios_and_band(tool):
    old = {"a": 1.0, "b": 2.0, "c": 0.5, "gone": 1.0}
    new = {"a": 1.1, "b": 4.0, "c": 0.25, "added": 9.9}
    d = tool.diff(old, new, band=1.5)
    assert d["common_entries"] == 3
    assert d["only_old"] == ["gone"]
    assert d["only_new"] == ["added"]
    by_name = {r["entry"]: r for r in d["entries"]}
    assert by_name["a"]["ratio"] == 1.1
    assert by_name["b"]["ratio"] == 2.0
    assert by_name["c"]["ratio"] == 0.5
    assert [r["entry"] for r in d["slower_than_band"]] == ["b"]
    assert [r["entry"] for r in d["faster_than_band"]] == ["c"]
    # totals over COMMON entries only (added/dropped don't skew the ratio)
    assert d["total_old_sec"] == 3.5
    assert d["total_new_sec"] == 5.35
    # entries sorted worst-first
    assert [r["entry"] for r in d["entries"]] == ["b", "a", "c"]


def test_diff_zero_old_entry_is_incomparable_and_json_valid(tool, tmp_path, capsys):
    """A 0.0 old timing (sub-0.5 ms entries round to 0.000) must not
    produce float('inf') — json.dump would emit the non-RFC-8259
    `Infinity` literal, which jq/JS JSON.parse reject.  The row is
    reported as incomparable (null ratio) and leads the listing."""
    d = tool.diff({"a": 0.0, "b": 1.0}, {"a": 1.0, "b": 3.0}, band=1.5)
    by_name = {r["entry"]: r for r in d["entries"]}
    assert by_name["a"]["ratio"] is None
    assert [r["entry"] for r in d["incomparable"]] == ["a"]
    # incomparable rows lead, then finite worst-first
    assert [r["entry"] for r in d["entries"]] == ["a", "b"]
    # --json output must be strict-parseable end to end
    for name, q in (("old.json", {"a": 0.0}), ("new.json", {"a": 1.0})):
        (tmp_path / name).write_text(json.dumps({"queries": q}))
    tool.main([str(tmp_path / "old.json"), str(tmp_path / "new.json"),
               "--json"])
    out = capsys.readouterr().out
    parsed = json.loads(out, parse_constant=lambda c: pytest.fail(
        f"non-RFC JSON constant {c!r} in --json output"
    ))
    assert parsed["entries"][0]["ratio"] is None
    # text mode renders the no-ratio row without crashing on formatting
    tool.main([str(tmp_path / "old.json"), str(tmp_path / "new.json")])
    assert "old is 0, no ratio" in capsys.readouterr().out


def test_load_queries_rejects_non_raw_passes(tool, tmp_path):
    p = tmp_path / "not_raw.json"
    p.write_text(json.dumps({"metric": "total_bench_sec", "value": 1.0}))
    with pytest.raises(SystemExit):
        tool.load_queries(str(p))


def test_main_text_output_on_real_shapes(tool, tmp_path, capsys):
    for name, scale in (("old.json", 1.0), ("new.json", 1.4)):
        (tmp_path / name).write_text(json.dumps({
            "queries": {"q_fast": 0.1 * scale, "q_slow": 2.0 * scale},
            "provenance": {"loadavg_before": [1.0, 1.0, 1.0],
                           "loadavg_after": [2.0, 2.0, 2.0],
                           "pass_count": 3},
        }))
    tool.main([str(tmp_path / "old.json"), str(tmp_path / "new.json")])
    out = capsys.readouterr().out
    assert "common entries: 2" in out
    assert "ratio 1.4" in out
    assert "q_slow" in out


def test_main_json_output_parses(tool, tmp_path, capsys):
    for name in ("old.json", "new.json"):
        (tmp_path / name).write_text(json.dumps({
            "queries": {"q": 1.0}, "provenance": {"pass_count": 1},
        }))
    tool.main([str(tmp_path / "old.json"), str(tmp_path / "new.json"),
               "--json"])
    d = json.loads(capsys.readouterr().out)
    assert d["total_ratio"] == 1.0
    assert d["provenance"]["old"]["pass_count"] == 1


# ---- r15: --dist distribution triage (the refute-before-code check) ----


def _raw_passes_file(tmp_path, name, per_pass):
    """A minimal stamped raw-passes artifact: per_pass is a list of
    {entry: sec} dicts (one per pass)."""
    merged = {
        k: min(p[k] for p in per_pass if k in p)
        for k in {k for p in per_pass for k in p}
    }
    f = tmp_path / name
    f.write_text(json.dumps(
        {"queries": merged, "raw_passes": per_pass, "provenance": {}}
    ))
    return str(f)


def test_collect_samples_reads_every_pass_and_folded_artifacts(
    tool, tmp_path
):
    a = _raw_passes_file(tmp_path, "a.json",
                         [{"e": 1.0, "x": 9.0}, {"e": 2.0}])
    b = _raw_passes_file(tmp_path, "b.json", [{"e": 3.0}])
    # a folded artifact (no raw_passes) contributes its merged figure
    folded = tmp_path / "fold.json"
    folded.write_text(json.dumps({"queries": {"e": 0.5}}))
    got = tool.collect_samples([a, b, str(folded)], "e")
    assert got == [1.0, 2.0, 3.0, 0.5]
    assert tool.collect_samples([a], "missing") == []


def test_distribution_triage_verdicts(tool):
    """Overlapping ranges refute a fold-ratio regression claim; only a
    disjoint-slower distribution is structural evidence.  The r15
    worked example: old min best-of-21 spanning 1.48-7.32, new 12
    draws spanning 2.62-8.67 -> overlapping, refuted."""
    t = tool.distribution_triage(
        [1.484, 7.324, 3.1], [2.618, 8.672, 4.4]
    )
    assert t["verdict"] == "overlapping"
    assert t["old"] == {"n": 3, "min": 1.484, "max": 7.324}
    assert t["new"] == {"n": 3, "min": 2.618, "max": 8.672}
    # every new draw slower than every old draw: structural signature
    assert tool.distribution_triage([1.0, 1.2], [1.3, 2.0])[
        "verdict"] == "disjoint-slower"
    assert tool.distribution_triage([1.3, 2.0], [1.0, 1.2])[
        "verdict"] == "disjoint-faster"
    # boundary: a shared endpoint still overlaps (no strict-inequality
    # false alarm on equal draws)
    assert tool.distribution_triage([1.0, 2.0], [2.0, 3.0])[
        "verdict"] == "overlapping"
    # a side with no samples never fabricates a verdict
    assert tool.distribution_triage([], [1.0])["verdict"] == "insufficient"
    assert tool.distribution_triage([1.0], [])["verdict"] == "insufficient"


def test_main_dist_mode_annotates_out_of_band_rows(tool, tmp_path, capsys):
    old = _raw_passes_file(tmp_path, "old.json",
                           [{"hot": 1.0, "calm": 1.0}, {"hot": 6.0}])
    new = _raw_passes_file(tmp_path, "new.json",
                           [{"hot": 2.0, "calm": 1.05}, {"hot": 5.0}])
    tool.main([old, new, "--band", "1.5",
               "--dist-old", old, "--dist-new", new])
    out = capsys.readouterr().out
    # hot: fold 1.0 -> 2.0 = x2.0, out of band; samples overlap
    assert "<< slower than band" in out
    assert "dist: old n=2 [1.0, 6.0]  new n=2 [2.0, 5.0]  -> overlapping" in out
    # in-band rows carry no dist line
    assert out.count("dist:") == 1


def test_main_dist_requires_both_sides(tool, tmp_path, capsys):
    old = _raw_passes_file(tmp_path, "o2.json", [{"e": 1.0}])
    new = _raw_passes_file(tmp_path, "n2.json", [{"e": 1.0}])
    with pytest.raises(SystemExit):
        tool.main([old, new, "--dist-old", old])
    assert "together" in capsys.readouterr().err


def test_main_json_output_includes_dist(tool, tmp_path, capsys):
    old = _raw_passes_file(tmp_path, "o3.json", [{"e": 1.0}])
    new = _raw_passes_file(tmp_path, "n3.json", [{"e": 9.0}])
    tool.main([old, new, "--json",
               "--dist-old", old, "--dist-new", new])
    d = json.loads(capsys.readouterr().out)
    assert d["slower_than_band"][0]["dist"]["verdict"] == "disjoint-slower"
