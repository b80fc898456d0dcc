#!/usr/bin/env python
"""Out-of-process leg of the free-running reader race (round 16,
verdict #4 extension): a SEPARATE JVM/SparkSession looping
:func:`read_corpus_state` against a corpus state dir another process is
appending to and compacting. Unlike the in-process thread, this reader
shares nothing with the writer — no JVM, no Hadoop FileSystem cache, no
file-index state — so it models a genuinely independent job reading the
corpus mid-maintenance. Validates every successful read the same way:
exactly the rows of complete batches 0..k (batch b holds
k = b*1_000_000 + [0, rows_per_batch)). Loops until ``--stop-file``
appears, then prints one JSON stats line and exits 0."""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--rows-per-batch", type=int, required=True)
    ap.add_argument("--stop-file", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from data_engineering_projects_spark.streaming.jobs import (
        read_corpus_state)

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .appName("reader-race-child").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    rpb = args.rows_per_batch
    stats = {"reads": 0, "retryable": 0, "bad": 0, "bad_samples": []}
    while not os.path.exists(args.stop_file):
        try:
            ks = sorted(r["k"] for r in
                        read_corpus_state(spark, args.state).collect())
        except Exception:
            stats["retryable"] += 1
            time.sleep(0.05)
            continue
        stats["reads"] += 1
        if not ks:
            continue
        kmax = ks[-1] // 1_000_000
        want = [b * 1_000_000 + j
                for b in range(kmax + 1) for j in range(rpb)]
        if ks != want:
            stats["bad"] += 1
            if len(stats["bad_samples"]) < 3:
                by_batch: dict[int, int] = {}
                for k in ks:
                    by_batch[k // 1_000_000] = \
                        by_batch.get(k // 1_000_000, 0) + 1
                stats["bad_samples"].append(by_batch)
    print(json.dumps(stats), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
