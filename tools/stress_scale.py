"""Iterative-query stress at 2x-5x the largest driver fixture
(round-6 VERDICT item #7).

Claim under test: the three slowest batch queries are iterative, and
their cost at scale grows in PER-ROUND work (rows), not in ROUND COUNT:

- ``dedup_clusters_chain`` — star-contraction connected components over
  planted 64-id chains; rounds track log(diameter). Replicating the
  doc_id domain adds MORE chains of the same diameter, so rounds must
  stay flat while per-round time scales with rows.
- ``embed_top_eigenvector`` — 3 fixed power-iteration rounds.
- ``events_pagerank_types`` — 5 fixed PageRank rounds over the
  schema-bounded event-type node set.

Fixture: NOT driver data — a clearly-marked local derivation under
/tmp. Each scaled table unions k id-shifted copies of the sf0.1
parquet (ids offset by k * 10^9 per copy; the offset is a multiple of
64, so the planted chain structure of ``dedup_clusters_chain`` repeats
verbatim per copy and component diameters are unchanged). Timestamps,
text, and vectors are copied as-is: the queries under test key on ids/
types/dims, and value distributions are irrelevant to their plan shape.

Usage::

    python tools/stress_scale.py [--mults 1,2,5] [--base /root/testdata/sf0.1]

Prints one JSON line per (multiplier, query) with wall seconds and, for
the star-contraction query, the converged round count; plus a summary
line. Results are recorded in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_OFFSET = 1_000_000_000  # multiple of 64: chain layout repeats per copy

QUERIES = ["dedup_clusters_chain", "embed_top_eigenvector",
           "events_pagerank_types"]

#: table -> id column to shift per copy (other tables are symlinked).
SCALED = {"documents": "doc_id", "embeddings": "vec_id",
          "events": "event_id"}


def build_fixture(base: str, mult: int, out_dir: str) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in os.listdir(base):
        if not t.endswith(".parquet"):
            continue
        name = t[:-len(".parquet")]
        dst = os.path.join(out_dir, t)
        if os.path.exists(dst):
            continue
        if name in SCALED and mult > 1:
            idc = SCALED[name]
            copies = " UNION ALL ".join(
                f"SELECT * REPLACE ({idc} + {i * _OFFSET} AS {idc}) "
                f"FROM src" for i in range(mult))
            con.execute(f"CREATE OR REPLACE VIEW src AS "
                        f"SELECT * FROM '{base}/{t}'")
            con.execute(f"COPY ({copies}) TO '{dst}' (FORMAT PARQUET)")
        else:
            shutil.copyfile(os.path.join(base, t), dst)
    con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,2,5")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--master", default="local[16]")
    args = ap.parse_args()

    from data_engineering_projects_spark import contract
    from data_engineering_projects_spark.session import get_session
    from data_engineering_projects_spark.operators import clustering

    contract.load_all()
    spark = get_session("stress", master=args.master,
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # surface the star-contraction round count without changing the
    # contract query's signature: route the operator through a wrapper
    # that records stats for the duration of the stress run.
    rounds_box: dict = {}
    orig_ccs = clustering.connected_components_star

    def ccs_with_stats(pairs, src="doc_a", dst="doc_b", max_iters=30):
        return orig_ccs(pairs, src, dst, max_iters, stats=rounds_box)

    import data_engineering_projects_spark.contract.extensions as ext
    ext.connected_components_star = ccs_with_stats

    # warm JIT/codegen on each query once (bench.py's discipline) so the
    # mult=1 baseline is not inflated by first-run compilation.
    for name in QUERIES:
        contract.QUERIES[name](spark, args.base) \
            .write.format("noop").mode("overwrite").save()

    results = []
    for mult in [int(m) for m in args.mults.split(",")]:
        sf_dir = (args.base if mult == 1
                  else f"/tmp/depa_stress_x{mult}")
        if mult > 1:
            build_fixture(args.base, mult, sf_dir)
        for name in QUERIES:
            rounds_box.clear()
            t0 = time.perf_counter()
            contract.QUERIES[name](spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            rec = {"mult": mult, "query": name, "sec": round(dt, 2)}
            if rounds_box:
                rec["cc_rounds"] = rounds_box["rounds"]
            results.append(rec)
            print(json.dumps(rec), flush=True)
    summary = {}
    for name in QUERIES:
        rs = {r["mult"]: r for r in results if r["query"] == name}
        base_t = rs[min(rs)]["sec"]
        summary[name] = {
            m: {"sec": rs[m]["sec"],
                "time_ratio": round(rs[m]["sec"] / base_t, 2),
                **({"cc_rounds": rs[m]["cc_rounds"]}
                   if "cc_rounds" in rs[m] else {})}
            for m in sorted(rs)}
    print(json.dumps({"summary": summary}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
