#!/usr/bin/env python
"""Measure and pin BENCH_ref.json — the idle reference and external-load
coefficient bench.py's absolute normalization rests on (round 17,
verdict #2: the r16 hand pin REF_MC_IDLE=0.21 had no re-pin protocol,
no drift detection, and was host-specific by construction).

Two constants, two different measurements:

- ``ref_mc_idle``: the idle-host time of bench's fixed-work multi-core
  probe (:func:`bench.mc_probe_once` — SHARED code, so the constant can
  never describe a drifted copy). Measured at bench-level JVM warmth
  (same three warm-ups bench runs, plus discarded probe reps), as the
  median across ALL idle rungs — idle rungs are INTERLEAVED between the
  loaded ones so progressive JIT warming cancels instead of masquerading
  as (negative) contention, which is exactly what a first naive ladder
  measured (rung-16 probe reading 0.92x idle).
- ``k_ext``: marginal slowdown per external busy core, fit on REAL
  contract queries (three shapes: columnar agg, shuffle-heavy text,
  Arrow mapInPandas) — NOT on the probe. Measured on this host, the
  tiny probe under-responds to pure spin hogs (its ~150 ms parallel
  burst rides scheduler bursts; and a suite query's stage wall is the
  MAX over its tasks, which inflates superlinearly under random
  contention, plus GC amplification) while the r16 window-B suite
  slowed 2.2x under 16 hogs. k_ext must describe what happens to the
  QUERIES, because that is what bench divides by; the probe brackets
  stay as the second, independent leg of the max() in
  :func:`bench.pass_slowdowns`.

External load E per measurement window is MEASURED via the same /proc
series bench uses (hog pids on the exclude list so they count as
external), not assumed from the hog count. Writes BENCH_ref.json
{ref_mc_idle, k_ext, n_cores, date, derivation, ladder} at the repo
root. Re-run whenever the container/JVM/host changes; bench falls back
to the r16 pin (n_cores=32 only) when the file is absent, and flags
``ref_mc.suspect`` when a quiet run's probe floor contradicts whichever
reference is active.
"""
from __future__ import annotations

import argparse
import datetime
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import (SF_DIR, _CpuSampler, external_busy_cores,  # noqa: E402
                   mc_probe_once)

# three suite shapes for the k fit: columnar agg, shuffle-heavy text
# pipeline, Arrow-batched mapInPandas
K_FIT_QUERIES = ["dbt_hourly_speed_metrics", "dedup_simhash_pairs",
                 "embed_knn_blas"]


# the --suite-fit subset: ~12 queries mirroring the suite's shape mix
# (barrier pipeline, checkpointed SCD2, model-DAG I/O, iterative graph,
# shuffle-heavy text dedup x2, Arrow mapInPandas x2, columnar aggs,
# join-agg, TF-IDF, sketches) so the fitted k describes the suite, not
# one operator class. Streaming queries are excluded: their fixed
# sink-lifecycle overhead slows under load too, but per-query medians
# there are min-of-1 by design and would add noise, not signal.
SUITE_FIT_SUBSET = [
    "corpus_extend_admissions", "orders_scd2_current",
    "dbt_model_dag_incremental", "embed_top_eigenvector",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "embed_knn_blas",
    "embed_pq_adc_topk", "dbt_hourly_speed_metrics",
    "star_region_revenue", "text_tfidf_top_terms", "events_sketch_drift",
]


def suite_fit(args) -> int:
    """Fit k_ext from bench ITSELF (round 17): run the representative
    subset idle and under ``--hogs`` spin loads via bench.py
    subprocesses (bench's own sampler measures E — the hogs are not
    bench's descendants, so they land on the external side by
    construction), then k = (raw_loaded / raw_idle - 1) / mean(E).
    This is the honest coefficient: the probe ladder under-responds to
    spin hogs (sub-second burst; see module docstring) while the suite
    — stage walls = max over tasks, GC, python workers — is what
    value_norm_abs actually divides. Requires an existing
    BENCH_ref.json (ladder mode) whose ref/probe fields it keeps;
    patches k_ext + derivation. Validation belongs on the FULL suite
    (window-B protocol), which this fit deliberately does not touch."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_path = args.out
    with open(ref_path) as f:
        ref = json.load(f)

    def run_bench(tag: str) -> dict:
        env = dict(os.environ,
                   SPARK_GRAFT_BENCH_ONLY=",".join(SUITE_FIT_SUBSET),
                   SPARK_GRAFT_BENCH_REPS="2",
                   SPARK_GRAFT_BENCH_DEADLINE="5000")
        rc = subprocess.run([sys.executable,
                             os.path.join(here, "bench.py")],
                            env=env, capture_output=True, text=True,
                            timeout=1800)
        if rc.returncode != 0:
            raise RuntimeError(f"bench {tag} failed: {rc.stderr[-800:]}")
        with open(os.path.join(here, "BENCH_detail.json")) as f:
            return json.load(f)

    hogs: list[subprocess.Popen] = []
    try:
        idle = run_bench("idle")
        for _ in range(args.hogs):
            hogs.append(subprocess.Popen(
                [sys.executable, "-c", "while True: pass"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
        time.sleep(1.5)
        loaded = run_bench("loaded")
    finally:
        for p in hogs:
            p.send_signal(signal.SIGKILL)
        for p in hogs:
            p.wait()
    exts = [e for e in loaded["ext_busy_cores"] if e is not None]
    e_mean = sum(exts) / max(len(exts), 1)
    slow = loaded["value"] / idle["value"]
    if e_mean < 1.0 or slow <= 1.02:
        print(json.dumps({"error": "no usable load signal",
                          "slow": slow, "e_mean": e_mean}))
        return 1
    k = (slow - 1.0) / e_mean
    fit = {"hogs": args.hogs, "idle_raw": idle["value"],
           "loaded_raw": loaded["value"], "slowdown": round(slow, 3),
           "ext_mean": round(e_mean, 2), "k_ext": round(k, 4),
           "idle_ext": idle["ext_busy_cores"],
           "loaded_ext": loaded["ext_busy_cores"],
           "loaded_cal_mc": loaded["calibration_mc"]["samples"],
           "subset": SUITE_FIT_SUBSET}
    print(json.dumps(fit))
    base = (f"{ref.get('derivation_base', '')}; k_ext suite-fit "
            f"{args.hogs} hogs on {len(SUITE_FIT_SUBSET)}-query subset")
    ref.update({"k_ext": round(k, 4), "derivation_base": base,
                "derivation": base,
                "date": datetime.date.today().isoformat(),
                "suite_fit": fit})
    if not args.dry_run:
        with open(ref_path, "w") as f:
            json.dump(ref, f, indent=1)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="8,16,32",
                    help="comma-separated hog counts (idle rungs are "
                         "interleaved automatically)")
    ap.add_argument("--probe-samples", type=int, default=5)
    ap.add_argument("--query-samples", type=int, default=2)
    ap.add_argument("--suite-fit", action="store_true",
                    help="fit k_ext from bench subset runs (idle vs "
                         "--hogs) instead of the probe ladder; patches "
                         "an existing BENCH_ref.json")
    ap.add_argument("--hogs", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ref.json"))
    ap.add_argument("--dry-run", action="store_true",
                    help="measure and print, do not write the file")
    args = ap.parse_args()
    if args.suite_fit:
        return suite_fit(args)

    from data_engineering_projects_spark import contract
    from data_engineering_projects_spark.session import (
        free_local_checkpoint, get_session)

    n_cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    contract.load_all()
    spark = get_session("load-calibration")
    spark.sparkContext.setLogLevel("ERROR")

    def run_query(name: str) -> float:
        t0 = time.perf_counter()
        df = contract.QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        free_local_checkpoint(df, deep=True)
        return dt

    # bench-level warmth: the same three warm-ups bench runs, then
    # discarded probe reps and one discarded rep of each fit query
    contract.QUERIES["aws_tti_top10"](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    spark.range(n_cores).repartition(n_cores) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    contract.QUERIES["dedup_simhash"](spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    for _ in range(6):
        mc_probe_once(spark, n_cores)
    for q in K_FIT_QUERIES:
        run_query(q)

    hogs: list[subprocess.Popen] = []
    sampler = _CpuSampler(interval=0.5)
    sampler.start()

    def set_hogs(n: int) -> None:
        while len(hogs) < n:
            p = subprocess.Popen(
                [sys.executable, "-c", "while True: pass"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            hogs.append(p)
            sampler.exclude_pids.add(p.pid)
        while len(hogs) > n:
            p = hogs.pop()
            p.send_signal(signal.SIGKILL)
            p.wait()

    loaded = [int(r) for r in args.rungs.split(",")]
    # interleave idle baselines: 0, r1, 0, r2, 0, ... 0
    schedule: list[int] = [0]
    for r in loaded:
        schedule += [r, 0]

    ladder = []
    try:
        for rung in schedule:
            set_hogs(rung)
            time.sleep(1.5)  # let the scheduler settle
            times, windows = [], []
            for _ in range(args.probe_samples):
                t0 = time.perf_counter()
                times.append(mc_probe_once(spark, n_cores))
                windows.append((t0, time.perf_counter()))
            qtimes: dict[str, float] = {}
            for q in K_FIT_QUERIES:
                ts = []
                for _ in range(args.query_samples):
                    t0 = time.perf_counter()
                    ts.append(run_query(q))
                    windows.append((t0, time.perf_counter()))
                qtimes[q] = round(min(ts), 3)
            med = sorted(times)[len(times) // 2]
            exts = [external_busy_cores(sampler.series, w0, w1,
                                        sampler.clk)
                    for w0, w1 in windows]
            exts = [e for e in exts if e is not None]
            ext = (sorted(exts)[len(exts) // 2] if exts else None)
            ladder.append({"hogs": rung, "probe_sec": round(med, 4),
                           "probe_samples": [round(t, 4) for t in times],
                           "queries": qtimes,
                           "ext_cores": None if ext is None
                           else round(ext, 2)})
            print(json.dumps(ladder[-1]), flush=True)
    finally:
        set_hogs(0)
        sampler.stop()
        spark.stop()

    idle_rungs = [r for r in ladder if r["hogs"] == 0]
    probe_ref = sorted(r["probe_sec"] for r in idle_rungs)[
        len(idle_rungs) // 2]
    idle_q = {q: sorted(r["queries"][q] for r in idle_rungs)[
        len(idle_rungs) // 2] for q in K_FIT_QUERIES}
    ks = []
    for r in ladder:
        if r["hogs"] == 0 or not r["ext_cores"] \
                or r["ext_cores"] < 1.0:
            continue
        r["probe_slowdown"] = round(r["probe_sec"] / probe_ref, 3)
        qk = {}
        for q in K_FIT_QUERIES:
            slow = r["queries"][q] / idle_q[q]
            qk[q] = round((slow - 1.0) / r["ext_cores"], 4)
            if slow > 1.02:
                ks.append((slow - 1.0) / r["ext_cores"])
        r["k_per_query"] = qk
    if not ks:
        print("no loaded rung produced a usable (slowdown, E) pair",
              file=sys.stderr)
        return 1
    k_ext = sorted(ks)[len(ks) // 2]
    out = {"ref_mc_idle": round(probe_ref, 4),
           "k_ext": round(k_ext, 4),
           "n_cores": n_cores,
           "date": datetime.date.today().isoformat(),
           "derivation_base": (
               f"tools/load_calibration.py interleaved hog ladder "
               f"{args.rungs}; k fit on {','.join(K_FIT_QUERIES)}"),
           "derivation": (
               f"tools/load_calibration.py interleaved hog ladder "
               f"{args.rungs}; k fit on {','.join(K_FIT_QUERIES)}"),
           "quiet_floors": [round(min(r["probe_sec"]
                                      for r in idle_rungs), 4)],
           "ladder": ladder}
    print(json.dumps(out))
    if not args.dry_run:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
