#!/usr/bin/env python
"""Twin-stage audit: find AQE duplicate-materialization across the registry.

Round-13 root-cause follow-up: a persisted-but-unmaterialized relation is
recomputed once per CONCURRENT consumer stage (the cache only dedups
sequential reuse), which shows up at runtime as "twin" stages — two or
more stages in one query with identical task counts and identical
shuffle-write byte counts, each burning the same executor time. This
tool runs every batch registry query once (warmed session), captures
completed stages through the UI REST API, and reports twin groups whose
duplicated executor time exceeds a threshold — the signal that an eager
materialization (or exchange reuse) is missing.

Heuristic caveats (why this is an AUDIT, not a lint): genuinely
symmetric self-join sides write identical bytes but SHOULD be handled
by Spark's ReuseExchange when the exchanges are canonically identical;
a surviving twin therefore means either a missing eager persist or a
reuse the optimizer could not prove. Streaming queries are skipped
(their stages interleave sink/harness work).

Usage:
  python tools/twin_stage_audit.py [--sf 0.1] [--min-dup-sec 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.1")
    ap.add_argument("--min-dup-sec", type=float, default=0.5)
    ap.add_argument("--port", type=int, default=4046)
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"

    from pyspark.sql import SparkSession

    from data_engineering_projects_spark import contract
    from data_engineering_projects_spark.session import (_RUNTIME_CONFS,
                                                         _fast_local_dir)

    b = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "true")
         .config("spark.ui.port", str(args.port))
         .config("spark.ui.showConsoleProgress", "false"))
    fast = _fast_local_dir()
    if fast:
        b = b.config("spark.local.dir", fast)
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    contract.load_all()

    def stages():
        app = json.load(urllib.request.urlopen(
            f"http://localhost:{args.port}/api/v1/applications"))[0]["id"]
        return json.load(urllib.request.urlopen(
            f"http://localhost:{args.port}/api/v1/applications/{app}"
            f"/stages?status=complete&details=false"))

    names = [n for n in contract.QUERIES
             if not n.startswith("streaming_")]
    findings = []
    for name in sorted(names):
        try:
            contract.QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()  # warm (memos, JIT, caches)
            n0 = max((s["stageId"] for s in stages()), default=-1)
            contract.QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception as e:  # keep auditing the rest
            findings.append({"query": name, "error": str(e)[:120]})
            continue
        ss = [s for s in stages() if s["stageId"] > n0]
        groups: dict[tuple, list] = defaultdict(list)
        for s in ss:
            sig = (s["numCompleteTasks"], s.get("shuffleWriteBytes", 0))
            if sig[1] > 0:  # only exchange-producing stages
                groups[sig].append(s)
        for sig, twins in groups.items():
            if len(twins) < 2:
                continue
            runs = sorted(s["executorRunTime"] / 1000 for s in twins)
            dup_sec = sum(runs[:-1])  # all but one copy is duplication
            if dup_sec >= args.min_dup_sec:
                findings.append({
                    "query": name, "tasks": sig[0], "sh_w_bytes": sig[1],
                    "n_twins": len(twins),
                    "runs_sec": [round(r, 2) for r in runs],
                    "dup_sec": round(dup_sec, 2)})
    spark.stop()
    for f in findings:
        print(json.dumps(f))
    total = sum(f.get("dup_sec", 0) for f in findings)
    print(json.dumps({"summary": {
        "queries_audited": len(names),
        "twin_findings": len([f for f in findings if "dup_sec" in f]),
        "errors": len([f for f in findings if "error" in f]),
        "total_dup_sec": round(total, 2)}}))


if __name__ == "__main__":
    main()
