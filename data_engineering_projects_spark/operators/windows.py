"""Trend windows (SURVEY.md §2.6 W1/W2, §7.4 trap #3).

pandas ``diff()`` / ``pct_change()`` rely on implicit insertion order
(3_BigQuery/READ.md:113-114, 4_Snowflake/READ.md:115-118); here the
ordering is explicit in the window spec. For the reference's global
pct_change the partition is a single tiny series (one row per period), so
a one-partition window is correct — correctness over parallelism there,
as SURVEY.md §7.4 prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lag_diff(df: DataFrame, value_col: str, order_col: str,
             partition_cols: list[str] | None = None,
             out_col: str = "change", fill: float | None = 0.0) -> DataFrame:
    """W1: value - lag(value), pandas ``.diff().fillna(0)`` semantics."""
    w = (Window.partitionBy(*partition_cols) if partition_cols else Window.partitionBy()) \
        .orderBy(order_col)
    d = F.col(value_col) - F.lag(value_col).over(w)
    if fill is not None:
        d = F.coalesce(d, F.lit(fill))
    return df.withColumn(out_col, d)


def pct_change(df: DataFrame, value_col: str, order_col: str,
               partition_cols: list[str] | None = None,
               out_col: str = "pct_change", fill: float | None = 0.0) -> DataFrame:
    """W2: (value - lag)/lag, pandas ``.pct_change().fillna(0)`` semantics.

    ``try_divide`` keeps a zero previous value NULL (→ filled) instead of
    raising under ANSI mode / producing pandas' inf — the one deliberate
    deviation from pandas, which yields ±inf there."""
    w = (Window.partitionBy(*partition_cols) if partition_cols else Window.partitionBy()) \
        .orderBy(order_col)
    prev = F.lag(value_col).over(w)
    d = F.try_divide(F.col(value_col) - prev, prev)
    if fill is not None:
        d = F.coalesce(d, F.lit(fill))
    return df.withColumn(out_col, d)


def sessionize(df: DataFrame, key_col: str, ts_col: str, id_col: str,
               gap_seconds: int = 1800,
               out_col: str = "session_no") -> DataFrame:
    """Gaps-and-islands sessionization: append a 1-based per-key session
    number that increments whenever the gap to the previous event (by
    ``ts_col``, ties broken by ``id_col``) exceeds ``gap_seconds``.

    One keyed shuffle total: the lag flag and the running sum share the
    same (key) partitioning and (ts, id) sort, and any downstream
    per-(key, session) rollup reuses the same clustering — the plan lint
    pins exactly one Exchange for the contract query built on this.
    Deterministic: ties on ts are ordered by id, so numbering is
    reproducible across engines and partitionings. State per key during
    the scan is one previous-timestamp — linear at any scale, the batch
    counterpart of the streaming session window's watermark state."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev_us = F.lag(F.unix_micros(ts_col)).over(w)
    gap_us = int(gap_seconds) * 1_000_000
    flagged = df.withColumn(
        "__new_session",
        F.when(prev_us.isNull()
               | ((F.unix_micros(ts_col) - prev_us) > gap_us), 1)
         .otherwise(0))
    wrun = (Window.partitionBy(key_col).orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (flagged.withColumn(out_col, F.sum("__new_session").over(wrun))
                   .drop("__new_session"))


def islands(df: DataFrame, key_col: str, seq_col: str,
            out_col: str = "island") -> DataFrame:
    """Gaps-and-islands grouping key over an integer sequence: rows of
    the same key whose ``seq_col`` values are CONSECUTIVE integers get
    the same ``out_col`` value (the classic ``seq - row_number`` trick —
    consecutive values share a constant difference; any gap shifts it).
    ``seq_col`` must be unique per key (dedupe first), or equal values
    would break consecutiveness detection.

    Pure integer arithmetic — exact on any engine. One keyed shuffle for
    the row_number sort; downstream per-(key, island) rollups reuse the
    same partitioning. Callers with date sequences convert via datediff
    against a fixed epoch (see the ``events_streaks`` contract query)."""
    rn = F.row_number().over(Window.partitionBy(key_col).orderBy(seq_col))
    return df.withColumn(out_col, F.col(seq_col) - rn)
