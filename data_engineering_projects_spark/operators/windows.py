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
