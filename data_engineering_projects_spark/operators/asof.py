"""As-of (point-in-time) join — the canonical time-series operator Spark
lacks natively: for each left row, attach the right row with the greatest
timestamp at-or-before the left timestamp within the same key (backward
direction; the pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantic).

Spark-first shape: instead of an inequality join (which Catalyst would
execute as a broadcast-nested-loop or a range-exploded join), tag and
union both inputs, then run one ``last(value, ignorenulls=True)`` window
per value column ordered by (time, side) with rows-unbounded-preceding
frame. Cost: a single shuffle on the key — the same partitioning either
input would need anyway — and a linear scan per key; no row explosion,
no nested loop. This is the standard log-merge rendering of as-of and
survives arbitrary corpus scale because per-key state during the scan is
one row of carried values.

Right-side rows that tie on (key, timestamp) make the match
nondeterministic; callers must dedupe the right side first (keep one row
per key+timestamp — e.g. max of a unique id) as the contract query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str, right_ts: str,
                       value_cols: list[str]) -> DataFrame:
    """Left as-of join: every left row + ``value_cols`` from the latest
    right row with ``right_ts <= left_ts`` for the same ``key`` (NULLs
    when no such row exists). ``right`` must be unique per (key, ts).

    ``value_cols`` must be disjoint from ``left``'s columns: unionByName
    would otherwise merge them, letting left-side values participate in
    the carry-forward window and surface as the "matched" right value —
    a silent corruption. Enforced here (mirroring interval_join's
    disjoint-columns contract) along with the ``__t``/``__side``
    scratch-name reservation."""
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join_backward: value_cols {sorted(clash)} already exist "
            "on the left side; rename them on one side first")
    reserved = {"__t", "__side"}
    used = (set(left.columns) | set(right.columns)) & reserved
    if used:
        raise ValueError(
            f"asof_join_backward: column names {sorted(used)} are reserved "
            "scratch names for this operator")
    r = (right.select(F.col(key), F.col(right_ts).alias("__t"),
                      *[F.col(c) for c in value_cols])
         .withColumn("__side", F.lit(0)))
    l = (left.withColumn("__t", F.col(left_ts))
         .withColumn("__side", F.lit(1)))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (__side=0) sort before left rows at equal time, making
    # the match inclusive of right_ts == left_ts
    w = (Window.partitionBy(key).orderBy("__t", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__t", "__side")
