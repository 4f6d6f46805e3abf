"""Per-entry diff of two round-stamped bench raw-passes artifacts.

The round-stamped ``BENCH_raw_passes_r{N}*.json`` chain (bench.py,
r10) exists so driver-run per-query history survives across rounds;
this tool is the consumer: a per-entry driver-to-driver (or
solo-to-solo) comparison that separates structural regressions from
host noise (r10 VERDICT item "Next round" 3).

Usage::

    python diff_raw_passes.py OLD.json NEW.json [--band 1.5]

Prints one line per common entry — old sec, new sec, new/old ratio —
sorted worst-first, then a summary: total ratio, entries outside the
noise band in each direction, and both runs' recorded loadavg
provenance (the established verdict heuristic: the host has external
tenant load and single-entry ratios inside ~1.5x are noise unless they
repeat across rounds on an uncontended window — SCALE.md r8-r10).
Exit code 0 on a completed comparison regardless of what it shows
(evidence tooling, not a gate); nonzero only for unusable inputs (a
missing/unreadable file, no ``queries`` map, bad flags).
"""
from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> tuple[dict[str, float], dict]:
    with open(path) as fh:
        data = json.load(fh)
    queries = data.get("queries")
    if not isinstance(queries, dict):
        raise SystemExit(f"{path}: no 'queries' map (not a raw-passes file?)")
    return {k: float(v) for k, v in queries.items()}, data.get("provenance", {})


def diff(old: dict[str, float], new: dict[str, float], band: float) -> dict:
    common = sorted(set(old) & set(new))
    rows = []
    for name in common:
        o, n = old[name], new[name]
        # a 0.0 old timing (sub-0.5 ms entries round to 0.000) has no
        # finite ratio; None keeps the --json output RFC-8259-valid
        # (json.dump would otherwise emit the non-standard Infinity)
        ratio = round(n / o, 3) if o > 0 else None
        rows.append({"entry": name, "old": o, "new": n, "ratio": ratio})
    # worst-first; incomparable (None-ratio) rows lead — they need eyes
    rows.sort(key=lambda r: (r["ratio"] is not None, -(r["ratio"] or 0.0)))
    total_old = sum(old[n] for n in common)
    total_new = sum(new[n] for n in common)
    return {
        "common_entries": len(common),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        "total_old_sec": round(total_old, 3),
        "total_new_sec": round(total_new, 3),
        "total_ratio": round(total_new / total_old, 3) if total_old else None,
        "incomparable": [r for r in rows if r["ratio"] is None],
        "slower_than_band": [
            r for r in rows if r["ratio"] is not None and r["ratio"] > band
        ],
        "faster_than_band": [
            r for r in rows
            if r["ratio"] is not None and r["ratio"] < 1.0 / band
        ],
        "entries": rows,
    }


def main(argv: list[str] | None = None) -> None:
    try:  # die quietly under `| head` instead of BrokenPipeError noise
        import signal

        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (ImportError, AttributeError, ValueError):
        pass  # no SIGPIPE (non-POSIX) or non-main thread (tests)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--band", type=float, default=1.5,
        help="noise band: |ratio| beyond this is flagged (default 1.5; "
        "the host's measured external-tenant variance — SCALE.md)",
    )
    ap.add_argument(
        "--json", action="store_true",
        help="emit the full diff object as one JSON document",
    )
    args = ap.parse_args(argv)
    old_q, old_prov = load_queries(args.old)
    new_q, new_prov = load_queries(args.new)
    d = diff(old_q, new_q, args.band)
    if args.json:
        d["provenance"] = {"old": old_prov, "new": new_prov}
        json.dump(d, sys.stdout, indent=1)
        print()
        return
    print(f"old: {args.old}  loadavg_before={old_prov.get('loadavg_before')} "
          f"after={old_prov.get('loadavg_after')} passes={old_prov.get('pass_count')}")
    print(f"new: {args.new}  loadavg_before={new_prov.get('loadavg_before')} "
          f"after={new_prov.get('loadavg_after')} passes={new_prov.get('pass_count')}")
    print(f"common entries: {d['common_entries']}  "
          f"total {d['total_old_sec']} -> {d['total_new_sec']} s "
          f"(ratio {d['total_ratio']})")
    if d["only_old"]:
        print(f"dropped entries: {', '.join(d['only_old'])}")
    if d["only_new"]:
        print(f"new entries: {', '.join(d['only_new'])}")
    for r in d["entries"]:
        if r["ratio"] is None:
            print(f"{r['entry']:42s} {r['old']:9.3f} {r['new']:9.3f} "
                  f"x--       << old is 0, no ratio")
            continue
        flag = ""
        if r["ratio"] > args.band:
            flag = "  << slower than band"
        elif r["ratio"] < 1.0 / args.band:
            flag = "  << faster than band"
        print(f"{r['entry']:42s} {r['old']:9.3f} {r['new']:9.3f} "
              f"x{r['ratio']:<7.3f}{flag}")


if __name__ == "__main__":
    main()
