"""data_engineering_projects_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference portfolio ``zmtcampo/data_engineering_projects``
(five Airflow/pandas/dbt traffic-analytics pipelines over NPMRDS-shaped data),
re-expressed as declarative DataFrame / Spark SQL plans that Catalyst + AQE
optimize, plus large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, tuned shuffle partitions)
- ``sources``    : declared-schema readers for the test star schema + CSV/JDBC
- ``sinks``      : parquet/table/jdbc writers with partitioning
- ``functions``  : reusable Column expression builders (the "macro" layer)
- ``operators``  : top-k, windows, pivot, dedup, similarity, set ops
- ``quality``    : dbt-test-equivalent expectations layer
- ``plans``      : dbt-analog model registry + topo-ordered runner
- ``pipelines``  : the five reference pipelines re-expressed on Spark
- ``streaming``  : Structured Streaming variants (extension, not parity scope)
- ``contract``   : named (query, oracle-SQL) pairs exported via __spark_entry__
"""

__version__ = "0.1.0"
