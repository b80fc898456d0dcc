#!/usr/bin/env python
"""Executor-loss probe for the append/fold (tiered-compaction) path
(round 17, verdict #3 — round 16 proved the corpus BARRIER modes under
real executor loss; the fold/compaction protocol and its Spark jobs had
only single-process crash-storm coverage, which exercises the
driver-side marker protocol but not lost tasks/blocks mid-job on a
cluster).

Runs on ``local-cluster[2,1,1024]`` (real separate executor JVMs under
standalone workers) and drives a ~40-batch append+tiered-fold stream
(:func:`_append_batch_with_marker` + :func:`tiered_compact_append_state`
— the exact writer loop of ``run_tiered_stream``), with a free-running
concurrent reader thread validating every successful
:func:`read_corpus_state` against the complete-prefix invariant.
Mid-stream it SIGKILLs EVERY executor JVM of the app twice:

- once mid-APPEND: a delayed killer fires while the batch's
  ``new_rows.write`` job is running, so its tasks die with the JVMs;
- once mid-FOLD: the killer fires while ``compact_append_state``'s
  combined-rows write job is running.

Both jobs read parquet (file-sourced lineage, no truncated checkpoint
blocks — the difference from the r16 barrier leg, which MUST fail in
default mode), so Spark's task re-execution on the respawned executors
must complete them transparently; the marker/heal protocol must
converge with a final state IDENTICAL to an undisturbed run of the
same sequence, and the reader must never observe a partial or
duplicated batch. Emits one JSON line:
{"batches": N, "folds": F, "folds_ref": F0, "kills": K,
 "final_identical": bool, "reader": {"reads": R, "bad": B},
 "append_kill_batch": a, "fold_kill_nr": f}. Invoked standalone or by
tests/test_corpus_pipeline.py::test_cluster_executor_loss_fold_path in
a subprocess (a second SparkContext cannot share the pytest JVM).
"""
from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_BATCHES = 40
ROWS_PER_BATCH = 50
TRIGGER = 6
CAP = 12
APPEND_KILL_BATCH = 17      # mid-stream, between folds
FOLD_KILL_NR = 3            # the 3rd fold's combined write


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import data_engineering_projects_spark.streaming.jobs as J

    spark = (SparkSession.builder.master("local-cluster[2,1,1024]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .appName("cluster-fold-loss-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    def exec_pids() -> list[int]:
        out = []
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                with open(f"/proc/{p}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(
                        errors="ignore")
            except OSError:
                continue
            if "CoarseGrainedExecutorBackend" in cmd and app_id in cmd:
                out.append(int(p))
        return sorted(out)

    def wait_executors(n: int = 2, timeout: float = 90.0) -> None:
        deadline = time.time() + timeout
        while time.time() < deadline and len(exec_pids()) < n:
            time.sleep(0.5)

    kills = {"n": 0}

    def delayed_kill(delay: float) -> threading.Thread:
        def run():
            time.sleep(delay)
            for pid in exec_pids():
                try:
                    os.kill(pid, signal.SIGKILL)
                    kills["n"] += 1
                except OSError:
                    pass
        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t

    def batch_df(b: int):
        return spark.range(ROWS_PER_BATCH).select(
            (F.lit(b).cast("long") * 1_000_000 + F.col("id")).alias("k"))

    def drive(state: str, arm_kills: bool) -> int:
        folds = 0
        cache: dict[int, int] = {}
        fold_nr = {"n": 0}
        real_compact = J.compact_append_state

        def killing_compact(spark_, path, upto=None, since=None):
            fold_nr["n"] += 1
            if arm_kills and fold_nr["n"] == FOLD_KILL_NR:
                delayed_kill(0.3)   # lands inside the combined write
            return real_compact(spark_, path, upto=upto, since=since)

        J.compact_append_state = killing_compact
        try:
            for b in range(N_BATCHES):
                if arm_kills and b == APPEND_KILL_BATCH:
                    delayed_kill(0.3)  # lands inside the batch write
                J._append_batch_with_marker(
                    spark, state, b, lambda old, b=b: batch_df(b))
                if len(J._batch_dir_ids(state)) >= TRIGGER:
                    rng = J.tiered_compact_append_state(
                        spark, state, force_fold_at=CAP,
                        sizes_cache=cache)
                    if rng is not None:
                        folds += 1
        finally:
            J.compact_append_state = real_compact
        return folds

    def read_all(state: str) -> list[int]:
        return sorted(r["k"] for r in
                      J.read_corpus_state(spark, state).collect())

    wait_executors()

    # undisturbed reference sequence
    ref_state = tempfile.mkdtemp(prefix="fold_loss_ref_")
    shutil.rmtree(ref_state)
    folds_ref = drive(ref_state, arm_kills=False)
    want = read_all(ref_state)

    # kill leg, with a free-running validating reader
    state = tempfile.mkdtemp(prefix="fold_loss_")
    shutil.rmtree(state)
    stop = threading.Event()
    reader_stats = {"reads": 0, "bad": 0}

    def reader():
        while not stop.is_set():
            try:
                ks = read_all(state)
            except Exception:
                continue   # session-level churn while executors respawn
            reader_stats["reads"] += 1
            if not ks:
                continue
            kmax = ks[-1] // 1_000_000
            wanted = [b * 1_000_000 + j for b in range(kmax + 1)
                      for j in range(ROWS_PER_BATCH)]
            if ks != wanted:
                reader_stats["bad"] += 1

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()
    folds = drive(state, arm_kills=True)
    stop.set()
    rt.join(timeout=120)
    wait_executors()
    got = read_all(state)

    shutil.rmtree(ref_state, ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)
    print(json.dumps({"batches": N_BATCHES, "folds": folds,
                      "folds_ref": folds_ref, "kills": kills["n"],
                      "final_identical": got == want,
                      "reader": reader_stats,
                      "append_kill_batch": APPEND_KILL_BATCH,
                      "fold_kill_nr": FOLD_KILL_NR}))
    spark.stop()


if __name__ == "__main__":
    main()
