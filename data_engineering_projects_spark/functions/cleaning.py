"""Defensive-cleaning expressions (SURVEY.md §2.2 P10, §2.5 E9/E13).

The dbt staging models NULL-out physically impossible measurements
(5_dbt/READ.md:169-179, :216-225); these builders reproduce that CASE
shape as reusable Columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_range(col: Column, lo: float, hi: float) -> Column:
    """CASE WHEN col < lo OR col > hi THEN NULL ELSE col END."""
    return F.when((col < F.lit(lo)) | (col > F.lit(hi)), F.lit(None)).otherwise(col)


CLEAN_RANGE_SQL = "CASE WHEN {c} < {lo} OR {c} > {hi} THEN NULL ELSE {c} END"


def coalesce0(col: Column) -> Column:
    """COALESCE(col, 0) (5_dbt/READ.md:456)."""
    return F.coalesce(col, F.lit(0))


def nullif0(col: Column) -> Column:
    """NULLIF(col, 0) (5_dbt/READ.md:523, :801-802)."""
    return F.nullif(col, F.lit(0))
