#!/usr/bin/env python
"""Executor-loss probe for STATEFUL Structured Streaming (round 17).

Rounds 16-17 proved executor loss for the corpus barrier modes and the
append/fold (tiered-compaction) path; both are file-sourced batch jobs
whose recovery is task re-execution over parquet lineage. Stateful
streaming recovery is a DIFFERENT code path: when an executor JVM dies
mid-microbatch, its state-store partitions (dedup fingerprints,
windowed-agg partials) are gone with the heap (HDFS-backed provider)
or the local RocksDB instance, and the respawned executor must reload
them from the checkpoint's delta/snapshot files before the retried
task can run — plus the file sink's commit log must keep the retried
batch exactly-once (orphan part-files from killed attempts must stay
invisible to a metadata-aware read).

This probe runs on ``local-cluster[2,1,1024]`` (real separate executor
JVMs) and drives two state shapes from the contract streaming family
through that recovery, for both state-store providers:

- :func:`dedup_stream` (``dropDuplicatesWithinWatermark`` —
  per-fingerprint keyed state), and
- :func:`hourly_rollup_stream` (event-time windowed aggregation —
  per-(window,user) partial aggregate state, finalized by watermark),

each over a deterministic file-source stream (one parquet file per
microbatch, mtime-ordered, ``maxFilesPerTrigger=1`` under
``Trigger.AvailableNow``) with planted exact-copy duplicates across
adjacent batches and a far-future flush row that pushes the watermark
past every real window. Per job a single UNDISTURBED reference run
(default provider) pins the expected sink rows; then one kill leg per
(job, provider) SIGKILLs EVERY executor JVM twice mid-stream (at two
different microbatch ids) and asserts the metadata-aware sink read is
IDENTICAL to the reference — which simultaneously asserts
cross-provider result parity and exactly-once under loss. Orphan
part-files left by killed attempts are counted (disk files vs files
the ``_spark_metadata`` read actually returns).

Emits one JSON line:
{"legs": [{"job": j, "provider": p, "kills": k, "batches": n,
           "identical": bool, "disk_files": d, "committed_files": c}],
 "kills_total": K, "all_identical": bool}
Invoked standalone or by
tests/test_streaming.py::test_cluster_executor_loss_stateful_streaming
in a subprocess (a second SparkContext cannot share the pytest JVM).
"""
from __future__ import annotations

import glob
import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_FILES = 18                 # real data files (one microbatch each)
ROWS_PER_FILE = 40
DUP_ROWS = 10                # odd files repeat 10 exact rows of file b-1
KILL_BATCHES = (5, 11)       # SIGKILL all executors when these start
ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType,
                                   TimestampType)

    from data_engineering_projects_spark.streaming.jobs import (
        dedup_stream, hourly_rollup_stream)

    spark = (SparkSession.builder.master("local-cluster[2,1,1024]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "false")
             .appName("cluster-stream-loss-probe").getOrCreate())
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

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("fp", StringType()),
    ])

    # --- deterministic input corpus: one file per microbatch ---------
    base_ms = 1_700_000_000_000
    in_dir = tempfile.mkdtemp(prefix="stream_loss_in_")

    def file_rows(b: int) -> list[tuple]:
        rows = []
        for i in range(ROWS_PER_FILE):
            src = b - 1 if (b % 2 == 1 and i < DUP_ROWS) else b
            ms = base_ms + src * 60_000 + i * 1_000
            rows.append((ms, (i % 4), float((src * 7 + i) % 100),
                         f"fp-{src}-{i}"))
        return rows

    for b in range(N_FILES):
        df = spark.createDataFrame(
            [(r[0], r[1], r[2], r[3]) for r in file_rows(b)],
            "ms long, user_id long, value double, fp string"
        ).select(F.timestamp_millis("ms").alias("ts"),
                 "user_id", "value", "fp").coalesce(1)
        df.write.mode("overwrite").parquet(f"{in_dir}/b{b:03d}.tmp")
        part = glob.glob(f"{in_dir}/b{b:03d}.tmp/part-*.parquet")[0]
        os.replace(part, f"{in_dir}/batch{b:03d}.parquet")
        shutil.rmtree(f"{in_dir}/b{b:03d}.tmp")
    # flush row a day later: watermark passes every real window
    flush = spark.createDataFrame(
        [(base_ms + 86_400_000, 0, 0.0, "fp-flush")],
        "ms long, user_id long, value double, fp string"
    ).select(F.timestamp_millis("ms").alias("ts"),
             "user_id", "value", "fp").coalesce(1)
    flush.write.mode("overwrite").parquet(f"{in_dir}/zf.tmp")
    part = glob.glob(f"{in_dir}/zf.tmp/part-*.parquet")[0]
    os.replace(part, f"{in_dir}/zflush.parquet")
    shutil.rmtree(f"{in_dir}/zf.tmp")
    # pin file-source ordering: strictly increasing mtimes
    t0 = time.time() - 3_600
    for i, name in enumerate(sorted(os.listdir(in_dir))):
        os.utime(os.path.join(in_dir, name), (t0 + i, t0 + i))

    JOBS = {
        "dedup": lambda src: dedup_stream(src, watermark="10 minutes"),
        "rollup": lambda src: hourly_rollup_stream(
            src.select("ts", "user_id", "value"),
            watermark="10 minutes", window_len="5 minutes"),
    }

    kills_total = {"n": 0}

    def run_query(job: str, provider: str, kill: bool,
                  workdir: str) -> dict:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider)
        sink = os.path.join(workdir, "sink")
        ckpt = os.path.join(workdir, "ckpt")
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(in_dir))
        q = (JOBS[job](src).writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())

        leg_kills = {"n": 0}
        if kill:
            def killer():
                fired = set()
                while q.isActive:
                    prog = q.lastProgress
                    if prog is not None:
                        bid = prog.get("batchId", -1)
                        for kb in KILL_BATCHES:
                            if bid >= kb and kb not in fired:
                                fired.add(kb)
                                time.sleep(0.2)  # land mid-next-batch
                                for pid in exec_pids():
                                    try:
                                        os.kill(pid, signal.SIGKILL)
                                        leg_kills["n"] += 1
                                        kills_total["n"] += 1
                                    except OSError:
                                        pass
                    if len(fired) == len(KILL_BATCHES):
                        return
                    time.sleep(0.1)
            kt = threading.Thread(target=killer, daemon=True)
            kt.start()
        q.awaitTermination()
        prog = q.lastProgress
        batches = (prog.get("batchId", -1) + 1) if prog else 0
        wait_executors()

        out = spark.read.parquet(sink)   # metadata-aware: committed only
        if job == "rollup":
            out = out.withColumn("avg_value", F.round("avg_value", 9))
        rows = sorted(tuple(r) for r in out.collect())
        committed = out.select(
            F.input_file_name().alias("f")).distinct().count()
        disk = len(glob.glob(os.path.join(sink, "part-*")))
        return {"rows": rows, "batches": batches,
                "kills": leg_kills["n"], "disk_files": disk,
                "committed_files": committed}

    wait_executors()
    root = tempfile.mkdtemp(prefix="stream_loss_")
    legs, refs = [], {}
    for job in JOBS:
        refs[job] = run_query(job, HDFS, kill=False,
                              workdir=os.path.join(root, f"ref_{job}"))
    for job in JOBS:
        for pname, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
            r = run_query(job, provider, kill=True,
                          workdir=os.path.join(root, f"{job}_{pname}"))
            legs.append({"job": job, "provider": pname,
                         "kills": r["kills"], "batches": r["batches"],
                         "identical": r["rows"] == refs[job]["rows"],
                         "n_rows": len(r["rows"]),
                         "disk_files": r["disk_files"],
                         "committed_files": r["committed_files"]})

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(in_dir, ignore_errors=True)
    print(json.dumps({"legs": legs, "kills_total": kills_total["n"],
                      "ref_rows": {j: len(refs[j]["rows"])
                                   for j in refs},
                      "all_identical": all(l["identical"]
                                           for l in legs)}))
    spark.stop()


if __name__ == "__main__":
    main()
