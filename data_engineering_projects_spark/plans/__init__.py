"""The dbt-analog model system (SURVEY.md §3 entry point 3)."""

from .models import Model, ModelGraph, Materialization  # noqa: F401
