"""The five reference pipelines re-expressed as single lazy Spark plans
(SURVEY.md §3, §7.2 slice 5).

Each pipeline takes input DataFrames in the reference's own schema
(``tmc_code / measurement_tstamp / travel_time_seconds`` for projects 1-4;
``raw_*_data`` for project 5) and returns its output tables as a dict of
DataFrames. Airflow-style orchestration stays outside: any scheduler can
call these; sinks are applied by the caller (``sinks`` module).

What changed architecturally versus the reference (SURVEY.md §3):
- XCom JSON hops between tasks -> one lazy plan end to end (no
  serialization boundary, types preserved).
- driver-side year/period loops + list accumulation -> a ``year`` column
  union scan and period CASE column + groupBy (fully parallel).
- eager pandas statements -> Catalyst-optimized declarative plan.
"""

from .aws_tti import aws_monthly_tti  # noqa: F401
from .azure_severity import azure_yearly_severity  # noqa: F401
from .bigquery_trends import bigquery_tti_trends  # noqa: F401
from .snowflake_lottr import snowflake_lottr  # noqa: F401
from .dbt_traffic import build_traffic_graph  # noqa: F401
