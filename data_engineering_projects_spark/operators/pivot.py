"""Pivot (SURVEY.md §2.3 J2): the idiomatic replacement for the reference's
iterated per-period merge loop (4_Snowflake/READ.md:87-91).

One ``groupBy().pivot(values).agg()`` = one shuffle, versus k-1 join
shuffles for the merge loop — the difference between O(1) and O(k) stages
at 100 TB. Passing the explicit ``values`` list skips the extra
distinct-values job Spark otherwise runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_agg(df: DataFrame, group_cols: list[str], pivot_col: str,
              values: list[str], agg: Column, fill: float | None = 0.0) -> DataFrame:
    out = df.groupBy(*group_cols).pivot(pivot_col, values).agg(agg)
    if fill is not None:
        out = out.na.fill(fill, subset=values)
    return out
