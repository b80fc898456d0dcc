#!/usr/bin/env python
"""Structural plan audit over the whole contract registry.

For every registry query, compiles the physical plan (no execution) and
reports the operators that determine 100×-scale behavior: exchange count,
broadcast count, parquet scan count, nested-loop/cartesian presence,
row-at-a-time Python UDF stages, and whether any parquet scan carries
pushed filters. The pytest plan lint (tests/test_plans_shape.py) enforces
the hard rules; this prints the full evidence table for a human audit.

Usage:
  python tools/plan_audit.py                # sf0.01, markdown table
  python tools/plan_audit.py --sf 0.1
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def audit_plan(p: str) -> dict:
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", p)),
        "broadcasts": len(re.findall(r"BroadcastExchange", p)),
        "scans": len(re.findall(r"Scan parquet", p)),
        "nlj": len(re.findall(r"BroadcastNestedLoopJoin", p)),
        "cartesian": "CartesianProduct" in p,
        "py_row_udf": "BatchEvalPython" in p,
        "arrow_udf": ("ArrowEvalPython" in p or "MapInPandas" in p
                      or "FlatMapGroupsInPandas" in p),
        # true iff at least one parquet scan carries a NON-EMPTY pushed
        # filter list (round-5 ADVICE: the old expression was dead logic
        # that reduced to a bare substring check and was never printed)
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", p)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from data_engineering_projects_spark.session import get_session
    from data_engineering_projects_spark import contract

    contract.load_all()
    sf_dir = f"/root/testdata/sf{args.sf}"
    spark = get_session("plan_audit", master=args.master,
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("| query | exch | bcast | scans | NLJ | cart | rowUDF | arrow "
          "| pushed |")
    print("|---|---|---|---|---|---|---|---|---|")
    worst: list[str] = []
    skipped: list[str] = []
    for name in sorted(contract.QUERIES):
        if name.startswith("streaming_"):
            # streaming queries execute on construction (availableNow run);
            # their shape is pinned by tests/test_streaming.py instead
            skipped.append(name)
            continue
        try:
            df = contract.QUERIES[name](spark, sf_dir)
            p = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - audit tool
            print(f"| {name} | ERROR: {str(ex)[:60]} |")
            continue
        a = audit_plan(p)
        flag = " ⚠" if (a["cartesian"] or a["py_row_udf"]) else ""
        print(f"| {name}{flag} | {a['exchanges']} | {a['broadcasts']} | "
              f"{a['scans']} | {a['nlj']} | "
              f"{'Y' if a['cartesian'] else '-'} | "
              f"{'Y' if a['py_row_udf'] else '-'} | "
              f"{'Y' if a['arrow_udf'] else '-'} | "
              f"{'Y' if a['pushed'] else '-'} |")
        if a["cartesian"] or a["py_row_udf"]:
            worst.append(name)
    print(f"\nskipped (streaming, executes on build): {len(skipped)}")
    if worst:
        print(f"VIOLATIONS: {worst}")
        return 1
    print("no cartesian products, no row-at-a-time Python UDFs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
