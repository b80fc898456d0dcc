"""Sinks (SURVEY.md §2.1 S6–S12).

The reference appends/overwrites warehouse tables through per-row Python
drivers (to_sql / to_gbq — 1_AWS/README.md:124-134, 2_Azure/READ.md:98-107,
3_BigQuery/READ.md:100-124, 4_Snowflake/READ.md:105-121). Here every sink is
a distributed ``DataFrameWriter`` action; JDBC parallelism comes from
``numPartitions`` and cloud warehouse connectors are pluggable by format
name. Parity testing sinks to parquet/saveAsTable (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  sort_within_partitions: list[str] | None = None) -> None:
    """S10/S11: table materialization with optional day-partitioning and
    clustering (dbt partition_by/cluster_by — 5_dbt/READ.md:389-394).

    ``partition_by`` gives downstream partition pruning for free;
    ``sort_within_partitions`` is the open-format analog of BigQuery
    clustering (run-length locality for the cluster key inside each file).
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_table(df: DataFrame, table: str, mode: str = "overwrite") -> None:
    """dbt ``+materialized: table`` analog (5_dbt/READ.md:123-133)."""
    df.write.mode(mode).saveAsTable(table)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, mode: str = "overwrite") -> None:
    """Bucketed table write: pre-shuffles rows into ``n_buckets`` by the
    join/agg key so downstream equi-joins and aggregations between
    co-bucketed tables are exchange-free (the plan shows SortMergeJoin
    with no Exchange below it).

    This is the 100 TB co-location strategy for repeatedly-joined fact
    tables: pay the shuffle once at write time, never at query time.
    Requires ``saveAsTable`` (bucket metadata lives in the catalog).
    """
    (df.write.mode(mode)
       .bucketBy(n_buckets, *bucket_cols)
       .sortBy(*bucket_cols)
       .saveAsTable(table))


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               num_partitions: int = 8, **options: str) -> None:
    """S6/S7: JDBC sink. ``mode='append'`` mirrors ``if_exists='append'``
    (1_AWS/README.md:133-134); ``mode='overwrite'`` mirrors ``'replace'``
    (2_Azure/READ.md:104-107). Writes happen from executors in parallel —
    no driver-side row loop."""
    (df.repartition(num_partitions).write.format("jdbc")
       .option("url", url).option("dbtable", table)
       .options(**options).mode(mode).save())


def write_warehouse(df: DataFrame, fmt: str, table: str, mode: str = "append",
                    **options: str) -> None:
    """S8/S9: cloud warehouse sinks (bigquery / snowflake / ...) by
    connector format name; the connector jars are deploy-time concerns,
    the plan is identical."""
    df.write.format(fmt).options(**options).option("table", table).mode(mode).save()
