"""The driver contract registry: named (PySpark query, DuckDB oracle SQL)
pairs exported through ``__spark_entry__``.

Conventions that make the order-insensitive value-hash comparison stable
(SURVEY.md §5.2, §7.4):

- every computed/aggregate column is aliased identically on both sides;
- floating-point outputs are ROUNDed identically on both sides (6 dp for
  ratios/averages, 2 dp for money-scale sums) so last-ulp differences in
  summation order can never flip a hash;
- any ORDER BY ... LIMIT selection orders by deterministic keys (metric,
  then id columns) and, when the metric is a float aggregate, by its
  ROUNDed value so selection is reproducible across engines;
- oracle SQL reads ``events.ts`` via CAST(ts AS TIMESTAMP) to truncate
  parquet nanoseconds to the same microseconds Spark sees;
- DuckDB SUM(int) returns HUGEINT -> always CAST(... AS BIGINT) to match
  Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a contract query; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver falls back to rows-only check)."""
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import all query modules so their registrations run."""
    from . import parity, traffic, extensions, more, sessions  # noqa: F401
