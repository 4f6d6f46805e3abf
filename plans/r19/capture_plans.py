#!/usr/bin/env python
"""Capture .explain('formatted') for every declared query (r19 optimization
round, guide §1/§7.2): writes plans/r19/<stage>/<query>.txt plus a one-line
plan-shape summary (Exchange count, join strategies, Python-eval nodes,
pushed filters) to plans/r19/<stage>_summary.tsv.

Usage: python plans/r19/capture_plans.py <stage> [sf_dir] [only_csv]
  stage   e.g. "baseline" or "after"
  sf_dir  default /root/testdata/sf0.001
  only    optional comma-separated query names (default: all)
"""

from __future__ import annotations

import os
import re
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt.split("\n\n")[0])),
        "bhj": txt.count("BroadcastHashJoin"),
        "smj": txt.count("SortMergeJoin"),
        "shj": txt.count("ShuffledHashJoin"),
        "bnl": txt.count("BroadcastNestedLoopJoin"),
        "cartesian": txt.count("CartesianProduct"),
        "batch_py": txt.count("BatchEvalPython"),
        "arrow_py": txt.count("ArrowEvalPython"),
        "map_pandas": txt.count("MapInPandas") + txt.count("MapInArrow"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", txt)),
        "scans": txt.count("Scan parquet"),
        "sorts": len(re.findall(r"^\(\d+\) Sort\b", txt, re.M)),
        "window": len(re.findall(r"^\(\d+\) Window", txt, re.M)),
    }


def main() -> None:
    stage = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    out_dir = os.path.join(HERE, stage)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from elephantdb_spark.session import get_spark

    spark = get_spark(app_name=f"edb-plans-{stage}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    qs = entry.queries()
    rows = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            txt = plan_text(df)
            err = ""
        except Exception:
            txt = traceback.format_exc()
            err = "ERROR"
        dt = time.perf_counter() - t0
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        s = summarize(txt) if not err else {}
        rows.append((name, err, round(dt, 2), s))
        print(name, err or s, flush=True)
    with open(os.path.join(HERE, f"{stage}_summary.tsv"), "w") as fh:
        keys = ["exchanges", "bhj", "smj", "shj", "bnl", "cartesian",
                "batch_py", "arrow_py", "map_pandas", "pushed", "scans",
                "sorts", "window"]
        fh.write("query\terr\tplan_sec\t" + "\t".join(keys) + "\n")
        for name, err, dt, s in rows:
            fh.write(
                name + "\t" + err + "\t" + str(dt) + "\t"
                + "\t".join(str(s.get(k, "")) for k in keys) + "\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
