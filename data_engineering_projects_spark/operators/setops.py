"""Set operations (SURVEY.md §2.7 U1)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*frames: DataFrame) -> DataFrame:
    """``pd.concat`` analog (2_Azure/READ.md:89-90, 3_BigQuery/READ.md:89):
    column-name-aligned UNION ALL. No shuffle — unions are metadata-only."""
    return reduce(lambda a, b: a.unionByName(b), frames)
