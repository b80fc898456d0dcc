"""Mergeable-sketch partition tables (DataSketches KLL quantiles + HLL
distinct) — the 100 TB incremental-percentile pattern.

The reference's headline metrics are group percentiles recomputed from raw
rows on every run (TTI/PTI p50/p85/p95 — 1_AWS/README.md travel-time
aggregation; LOTTR p80/p50 — 4_Snowflake/READ.md; speed percentiles —
5_dbt/READ.md). Exact percentiles are not algebraic: answering "p85 over
March" requires rescanning all of March, every time. At 100 TB the
production pattern is a **sketch partition table**: one small mergeable
sketch per (group, day) written incrementally as data lands, merged at
query time. "p85 over any date range" then reads O(days) sketch rows
(a few KB each) instead of rescanning terabytes, and late-arriving data
only rebuilds the touched day.

Spark 4.1 ships Apache DataSketches as built-in JVM expressions, so the
whole path is Catalyst-side (zero Python in the hot loop):

- ``kll_sketch_agg_double`` builds a KLL quantile sketch per group with a
  published normalized rank-error bound (see :func:`kll_rank_error`).
- ``kll_sketch_merge_double`` is a *binary scalar* merge (no merge-agg
  exists in 4.1), so :func:`merge_kll` folds ``collect_list`` of the
  per-partition sketches with a higher-order ``aggregate``. Bounded by
  construction: one sketch per partition tuple in the rollup group —
  merging a year of daily sketches folds 365 × ~KB binaries inside one
  task. For rollups over very fine partition grains, roll up through an
  intermediate grain first (day → month → total) — same fold, two hops.
- ``hll_sketch_agg`` / ``hll_union_agg`` give mergeable distinct counts
  (native merge-agg — no fold needed).

Determinism note (this repo's policy — SURVEY §4.3): KLL compaction is
*randomized by design*; merged quantiles vary run-to-run inside the rank
bound. These operators therefore live in the bound-checked test tier
(like ``star_pricing_p95_approx``'s GK error-bound contract and
``events_user_reach_hll``), not the hash-checked oracle registry. HLL is
hash-based and order-independent: its estimates ARE deterministic.

Reference note: the reference has no incremental/mergeable aggregation
anywhere (SURVEY.md §2 — every pipeline is full-recompute; the closest is
dbt incremental materialization which still rescans the touched window);
this module is part of the scale-extension surface (BASELINE.json north
star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kll_rank_error",
    "build_sketch_partitions",
    "merge_kll",
    "rollup_sketch_partitions",
    "sketch_quantiles",
    "upsert_sketch_partitions",
    "sketch_drift",
]


def kll_rank_error(k: int) -> float:
    """Published double-sided normalized rank-error bound for a KLL
    sketch with parameter ``k`` (Apache DataSketches: eps ≈ 2.296/k^0.9
    at 99% confidence; k=200 → ~1.9%, k=2048 → ~0.24%). Merging sketches
    of equal ``k`` preserves the bound."""
    return 2.296 / (k ** 0.9)


def _kll_col(value_col: str) -> str:
    return f"kll_{value_col}"


def build_sketch_partitions(df: DataFrame, part_cols: list[str],
                            value_cols: list[str],
                            distinct_col: str | None = None,
                            kll_k: int = 2048,
                            hll_lg_k: int = 14) -> DataFrame:
    """One row per ``part_cols`` tuple carrying everything needed to
    answer quantile / distinct / moment queries over any union of
    partitions without touching raw data again:

    - ``kll_<c>``  (binary) — KLL double sketch per value column,
    - ``hll_<distinct_col>`` (binary) — HLL distinct sketch,
    - ``n_rows`` + exact ``sum_<c>``/``min_<c>``/``max_<c>`` (algebraic
      stats merge exactly; they also let tests cross-check the sketch
      tier against the exact tier).

    The output is a plain DataFrame — parquet round-trips the binary
    sketch columns unchanged, so this IS the incremental state table.
    One shuffle (the groupBy), map-side combined; output cardinality is
    the partition-grain cardinality, not the row count.
    """
    aggs: list[Column] = [F.count("*").alias("n_rows")]
    for c in value_cols:
        v = F.col(c).cast("double")
        aggs.append(F.kll_sketch_agg_double(v, F.lit(kll_k)).alias(_kll_col(c)))
        aggs.append(F.sum(v).alias(f"sum_{c}"))
        aggs.append(F.min(v).alias(f"min_{c}"))
        aggs.append(F.max(v).alias(f"max_{c}"))
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col, F.lit(hll_lg_k))
                     .alias(f"hll_{distinct_col}"))
    return df.groupBy(*part_cols).agg(*aggs)


def merge_kll(col: str | Column) -> Column:
    """Aggregate expression merging one KLL sketch per input row into a
    single sketch: fold ``collect_list`` with the binary
    ``kll_sketch_merge_double``. ``array_sort`` first so the fold order
    is stable (the sketch VALUE is still randomized internally — see
    module docstring). Null/absent sketches (an empty partition) are
    skipped by the null-init fold."""
    arr = F.array_sort(F.collect_list(col))
    return F.aggregate(
        arr, F.lit(None).cast("binary"),
        lambda acc, x: F.when(acc.isNull(), x)
                        .otherwise(F.kll_sketch_merge_double(acc, x)))


def rollup_sketch_partitions(sk: DataFrame, group_cols: list[str],
                             value_cols: list[str],
                             distinct_col: str | None = None) -> DataFrame:
    """Merge a sketch partition table up to a coarser grain (possibly
    global: ``group_cols=[]``). Reads only sketch rows; exact stats merge
    algebraically alongside. The result has the same column names, so
    rollups compose (day → month → total)."""
    aggs: list[Column] = [F.sum("n_rows").alias("n_rows")]
    for c in value_cols:
        aggs.append(merge_kll(_kll_col(c)).alias(_kll_col(c)))
        aggs.append(F.sum(f"sum_{c}").alias(f"sum_{c}"))
        aggs.append(F.min(f"min_{c}").alias(f"min_{c}"))
        aggs.append(F.max(f"max_{c}").alias(f"max_{c}"))
    if distinct_col is not None:
        aggs.append(F.hll_union_agg(f"hll_{distinct_col}")
                     .alias(f"hll_{distinct_col}"))
    if group_cols:
        return sk.groupBy(*group_cols).agg(*aggs)
    return sk.agg(*aggs)


def sketch_quantiles(merged: DataFrame, value_col: str,
                     probs: dict[str, float],
                     distinct_col: str | None = None,
                     keep_cols: list[str] | None = None) -> DataFrame:
    """Render a merged sketch row into metric columns: one quantile per
    ``probs`` entry (name → rank), plus the HLL distinct estimate and the
    exact mean from the algebraic columns."""
    cols: list[Column] = [F.col(c) for c in (keep_cols or [])]
    sk = _kll_col(value_col)
    for name, p in probs.items():
        cols.append(F.kll_sketch_get_quantile_double(sk, F.lit(float(p)))
                     .alias(name))
    cols.append((F.col(f"sum_{value_col}") / F.col("n_rows")).alias("mean"))
    cols.append(F.col("n_rows"))
    if distinct_col is not None:
        cols.append(F.hll_sketch_estimate(f"hll_{distinct_col}")
                     .alias(f"distinct_{distinct_col}"))
    return merged.select(*cols)


def upsert_sketch_partitions(existing: DataFrame | None, fresh: DataFrame,
                             part_cols: list[str], value_cols: list[str],
                             distinct_col: str | None = None) -> DataFrame:
    """Incremental ingest step: fold freshly-built sketch partitions into
    the persisted state table. New partition keys append; re-landed keys
    (late data for an already-sketched day) merge sketch-with-sketch, so
    the operation is associative and replay produces the same grain —
    no raw-data rescan of old days ever happens. Upstream must feed each
    raw row exactly once (same contract as any incremental model)."""
    if existing is None:
        return fresh
    both = existing.unionByName(fresh)
    return rollup_sketch_partitions(both, part_cols, value_cols,
                                    distinct_col)


def sketch_drift(sk: DataFrame, group_cols: list[str], day_col: str,
                 value_col: str, prob: float = 0.5,
                 window_days: int = 7) -> DataFrame:
    """Distribution-drift report from the sketch partition table alone:
    for every (group, day), the day's quantile vs the same quantile of
    the merged trailing ``window_days`` sketches, plus the day-over-
    baseline delta. The monitoring query a percentile state table exists
    for — and it touches ZERO raw rows: the self-join is sketch-grain ×
    window_days (KBs), so it runs at this cost at any corpus size.

    Returns (group..., day, day_q, baseline_q, drift, n_rows,
    baseline_days); days with no complete trailing window (fewer than
    ``window_days`` prior days present) are omitted — a drift against a
    partial baseline is noise, not signal."""
    kll = _kll_col(value_col)
    cur = sk.select(*group_cols, F.col(day_col).alias("__day"),
                    F.col(kll).alias("__cur"),
                    F.col("n_rows").alias("__n"))
    hist = sk.select(*[F.col(c).alias(f"__h_{c}") for c in group_cols],
                     F.col(day_col).alias("__h_day"),
                     F.col(kll).alias("__h_kll"))
    cond = F.lit(True)
    for c in group_cols:
        cond = cond & (F.col(c) == F.col(f"__h_{c}"))
    cond = cond & (F.col("__h_day") >= F.date_sub("__day", window_days)) \
                & (F.col("__h_day") < F.col("__day"))
    joined = cur.join(hist, cond)
    merged = (joined.groupBy(*group_cols, "__day", "__cur", "__n")
              .agg(merge_kll("__h_kll").alias("__base"),
                   F.countDistinct("__h_day").alias("baseline_days"))
              .filter(F.col("baseline_days") == window_days))
    p = F.lit(float(prob))
    day_q = F.kll_sketch_get_quantile_double("__cur", p)
    base_q = F.kll_sketch_get_quantile_double("__base", p)
    return merged.select(
        *group_cols, F.col("__day").alias(day_col),
        day_q.alias("day_q"), base_q.alias("baseline_q"),
        (day_q - base_q).alias("drift"),
        F.col("__n").alias("n_rows"), "baseline_days")
