#!/usr/bin/env python
"""Full-registry differential sweep at driver strictness — the deep gate
behind the fast pytest suite.

Runs every oracle-backed contract query against DuckDB with the
repr-strict canon (tests/oracle.py), at a chosen scale factor and across
a list of shuffle-partition configs. Partition sweeps prove
order-independence (determinism by construction); the sf0.1 run is the
one that catches data-dependent boundary cases the sf0.01 compare can't
— it found the derived-ratio ROUND divergence in round 3
(embed_label_centroids: 0.616992/192 on the 6dp half-boundary).

Since round 6 every compare runs in BOTH canon modes (python-object
strict AND driver-style pandas via toPandas/fetchdf — see
tests/oracle.py), so dtype-coercion divergences (DuckDB HUGEINT→float64)
are part of the sweep. ``--out`` writes a machine-readable summary JSON
(sf, parts, ok/bad counts, failure names) for the evidence trail.

Usage:
  python tools/differential_sweep.py                 # sf0.01, parts 3/32/128
  python tools/differential_sweep.py --sf 0.1 --parts 32 --out SWEEP_r6.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--parts", default="3,32,128",
                    help="comma-separated shuffle-partition configs")
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--out", default=None,
                    help="write a JSON summary of the sweep to this path")
    args = ap.parse_args()

    from data_engineering_projects_spark.session import get_session
    from data_engineering_projects_spark import contract
    from oracle import compare

    contract.load_all()
    sf_dir = f"/root/testdata/sf{args.sf}"
    ok = bad = 0
    failures: list[dict] = []
    for parts in [int(p) for p in args.parts.split(",")]:
        spark = get_session(f"sweep{parts}", master=args.master,
                            shuffle_partitions=parts)
        spark.sparkContext.setLogLevel("ERROR")
        for name in sorted(contract.ORACLES):
            try:
                compare(contract.QUERIES[name](spark, sf_dir),
                        contract.ORACLES[name], sf_dir)
                ok += 1
            except Exception as ex:
                bad += 1
                failures.append({"parts": parts, "query": name,
                                 "error": str(ex)[:300]})
                print(f"FAIL parts={parts} {name}: {str(ex)[:300]}",
                      flush=True)
        spark.stop()
        print(f"parts={parts} done (ok={ok} bad={bad})", flush=True)
    print(f"TOTAL sf{args.sf}: {ok} ok / {bad} bad")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf": args.sf, "parts": args.parts,
                       "n_oracles": len(contract.ORACLES),
                       "canon_modes": ["python", "pandas"],
                       "ok": ok, "bad": bad, "failures": failures}, f,
                      indent=1)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
