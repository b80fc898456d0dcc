#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries to files.

Optimization-round evidence tool: writes one
``plans/<tag>/<query>_<suffix>.txt`` per requested query so plan-shape
claims (Exchange counts, join strategies, PushedFilters, Python-eval
nodes) are checkable without running Spark.

Usage:
  python tools/plan_dump.py --tag r17 --suffix before            # all batch queries
  python tools/plan_dump.py --tag r17 --suffix after --only q1,q2
Streaming queries execute on construction; they are skipped unless
explicitly named with --only (then the post-hoc sink plan is dumped).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--tag", default="r17")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all batch)")
    args = ap.parse_args()

    from data_engineering_projects_spark.session import get_session
    from data_engineering_projects_spark import contract

    contract.load_all()
    sf_dir = f"/root/testdata/sf{args.sf}"
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("plan_dump", master=args.master,
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    names = (args.only.split(",") if args.only
             else [n for n in sorted(contract.QUERIES)
                   if not n.startswith("streaming_")])
    for name in names:
        try:
            df = contract.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # pragma: no cover - evidence tool
            plan = f"ERROR building plan: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
