"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (AWS TTI top-10, SURVEY.md §7.2 slice 0)
  on /root/testdata/sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data extension operators, as (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: DuckDB-equivalent ANSI SQL per query (same column
  aliases; identical ROUND policy) — see
  ``data_engineering_projects_spark/contract/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_projects_spark import contract
from data_engineering_projects_spark.contract import QUERIES, ORACLES

contract.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["aws_tti_top10"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
