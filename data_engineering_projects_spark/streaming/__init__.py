"""Structured Streaming extensions (SURVEY.md §7.6 — beyond parity scope;
the reference is cron-batch only, §2.9)."""

from .jobs import dedup_stream, hourly_rollup_stream, sessionize_stream  # noqa: F401
