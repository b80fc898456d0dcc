"""CLI entry point: run any contract query or list the catalog.

    python -m data_engineering_projects_spark list
    python -m data_engineering_projects_spark run aws_tti_top10 \
        [--sf-dir /root/testdata/sf0.01] [--show 20] [--out /path/parquet]
    python -m data_engineering_projects_spark explain dedup_minhash_lsh
    python -m data_engineering_projects_spark corpus \
        --sf-dir /root/testdata/sf0.01 --out /tmp/corpus_out

This is the "switch from the reference" surface: every analytics output
the reference's five pipelines produce exists here as a named query
(COVERAGE.md maps reference operators to names); any scheduler can shell
out to this instead of the reference's Airflow DAGs.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_engineering_projects_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list available queries")
    for cmd in ("run", "explain"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        sp.add_argument("--sf-dir",
                        default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                               "/root/testdata/sf0.01"))
        if cmd == "run":
            sp.add_argument("--show", type=int, default=20)
            sp.add_argument("--out", help="write result parquet here")
    cp = sub.add_parser(
        "corpus", help="run the end-to-end corpus prep pipeline "
        "(scrub -> quality gate -> dedup -> split) on a documents table")
    cp.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.01"))
    cp.add_argument("--out", help="write the final corpus parquet here")
    cp.add_argument("--quality-min", type=float, default=0.2)
    cp.add_argument("--jaccard-min", type=float, default=0.5)
    args = p.parse_args(argv)

    from . import contract
    contract.load_all()

    if args.cmd == "list":
        for name in sorted(contract.QUERIES):
            kind = "oracle-checked" if name in contract.ORACLES else "rows-only"
            print(f"{name:35s} {kind}")
        return 0

    if args.cmd == "corpus":
        from .pipelines.corpus import prepare_corpus
        from .session import get_session
        from .sources import load_table, widen
        spark = get_session("cli")
        spark.sparkContext.setLogLevel("ERROR")
        docs = widen(load_table(spark, args.sf_dir, "documents"))
        res = prepare_corpus(docs, quality_min=args.quality_min,
                             jaccard_min=args.jaccard_min)
        res.report.show(truncate=False)
        if args.out:
            res.docs.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            res.docs.show(10, truncate=False)
        res.unpersist()
        return 0

    if args.query not in contract.QUERIES:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2

    from .session import get_session
    spark = get_session("cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = contract.QUERIES[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
