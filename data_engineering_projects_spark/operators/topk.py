"""Top-k operators with BOTH tie semantics the reference uses
(SURVEY.md §2.7 T1–T5, §7.4 trap #4):

- ``topk_limit``: pandas ``sort_values().head(k)`` / ``nlargest`` — exactly
  k rows, ties broken by explicit secondary keys (1_AWS/README.md:112-113,
  2_Azure/READ.md:82). Spark plans TakeOrderedAndProject — a true
  distributed top-k (per-partition heap + driver merge), NOT a global sort;
  this is the 100 TB-safe shape.
- ``topk_rank``: RANK() + filter (the QUALIFY rewrite, 5_dbt/READ.md:581-588)
  — keeps ALL ties, so may return more than k rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_limit(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Exactly-k semantics. Pass deterministic tie-break columns in
    ``order`` so results are stable across engines and runs."""
    return df.orderBy(*order).limit(k)


def topk_rank(df: DataFrame, k: int, order: list[Column],
              partition_by: list[str] | None = None,
              rank_col: str = "rnk") -> DataFrame:
    """RANK-based top-k (ties included). Spark has no QUALIFY: compute the
    rank column, then filter (SURVEY.md §7.3)."""
    w = Window.orderBy(*order)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(rank_col, F.rank().over(w)).filter(F.col(rank_col) <= k)


def topk_keys_semijoin(df: DataFrame, keys_ranked: DataFrame,
                       on: str | list[str]) -> DataFrame:
    """T3 (3_BigQuery/READ.md:109-110): restrict ``df`` to a top-k key set
    via LEFT SEMI join — the distributed form of ``isin(top10_list)`` that
    never collects keys to the driver."""
    return df.join(F.broadcast(keys_ranked), on, "left_semi")
