"""Data-quality expectations layer — the dbt-test analog (SURVEY.md §5.1).

The reference's entire test story is project 5's dbt tests: declarative
schema tests (not_null / unique / relationships / accepted_values ranges)
with warn/error severities, plus "singular" SQL tests that fail when a
probe query returns more rows than a threshold (5_dbt/READ.md:296-381,
:734-782, :823-879). This module re-expresses them as DataFrame assertions
that run as a pipeline gate, fail-fast like the reference DAG places
``run_data_quality_checks`` before transforms (5_dbt/READ.md:53-71).

Scale note: every check is a single aggregate over the checked relation —
count of violations — so checks cost one pass each and can share scan
caching; no check collects data to the driver beyond one number (plus a
bounded sample for diagnostics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Severity(str, Enum):
    WARN = "warn"
    ERROR = "error"


@dataclass
class CheckResult:
    name: str
    severity: Severity
    violations: int
    threshold: int
    sample: list = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return self.violations <= self.threshold


class QualityError(RuntimeError):
    def __init__(self, failures: list[CheckResult]):
        self.failures = failures
        msg = "; ".join(f"{r.name}: {r.violations} violations (> {r.threshold})"
                        for r in failures)
        super().__init__(f"data-quality gate failed: {msg}")


@dataclass
class Check:
    """One expectation: rows of ``violations(df)`` are failures; the check
    passes while their count stays <= threshold (dbt's HAVING-threshold
    singular-test semantics, 5_dbt/READ.md:826-838)."""
    name: str
    severity: Severity
    threshold: int
    _violations: "callable"

    def run(self, df: DataFrame, sample_rows: int = 5) -> CheckResult:
        v = self._violations(df)
        n = v.count()
        sample = (v.limit(sample_rows).collect()
                  if n and sample_rows > 0 else [])
        return CheckResult(self.name, self.severity, n, self.threshold, sample)


def not_null(column: str, severity: Severity = Severity.ERROR) -> Check:
    """dbt ``not_null`` (5_dbt/READ.md:306-315)."""
    return Check(f"not_null({column})", severity, 0,
                 lambda df: df.filter(F.col(column).isNull()))


def unique(column: str, severity: Severity = Severity.ERROR) -> Check:
    """dbt ``unique`` (5_dbt/READ.md:365-368): groups with count>1 are
    violations — one aggregate, no self-join."""
    return Check(
        f"unique({column})", severity, 0,
        lambda df: (df.groupBy(column).agg(F.count(F.lit(1)).alias("n"))
                      .filter(F.col("n") > 1)))


def relationships(column: str, parent: DataFrame, parent_column: str,
                  severity: Severity = Severity.ERROR) -> Check:
    """dbt ``relationships`` FK test (5_dbt/READ.md:306-311): LEFT ANTI
    join into the (broadcast) parent key set must produce no rows."""
    keys = parent.select(F.col(parent_column).alias("__pk")).distinct()
    return Check(
        f"relationships({column}->{parent_column})", severity, 0,
        lambda df: (df.filter(F.col(column).isNotNull())
                      .join(F.broadcast(keys), F.col(column) == F.col("__pk"),
                            "left_anti")))


def accepted_range(column: str, lo, hi,
                   severity: Severity = Severity.WARN) -> Check:
    """dbt ``accepted_values`` range variant (5_dbt/READ.md:318-331,
    :369-380): non-null values outside [lo, hi] are violations."""
    return Check(
        f"accepted_range({column} in [{lo},{hi}])", severity, 0,
        lambda df: df.filter(F.col(column).isNotNull()
                             & ((F.col(column) < lo) | (F.col(column) > hi))))


def accepted_values(column: str, values: list,
                    severity: Severity = Severity.ERROR) -> Check:
    """dbt ``accepted_values`` enum variant."""
    return Check(
        f"accepted_values({column})", severity, 0,
        lambda df: df.filter(F.col(column).isNotNull()
                             & ~F.col(column).isin(values)))


def singular(name: str, predicate: Column, threshold: int = 0,
             severity: Severity = Severity.ERROR) -> Check:
    """dbt singular test: rows matching ``predicate`` are violations,
    failing above ``threshold`` (null-count test 5_dbt/READ.md:826-838;
    interval-consistency test :865-879)."""
    return Check(name, severity, threshold, lambda df: df.filter(predicate))


def outlier_3sigma(column: str, threshold: int = 0,
                   severity: Severity = Severity.WARN) -> Check:
    """dbt statistical outlier test (5_dbt/READ.md:841-863): values beyond
    mean±3σ. The 1-row stats aggregate broadcasts into a nested-loop
    cross join — no shuffle of the checked relation."""
    def violations(df: DataFrame) -> DataFrame:
        stats = df.agg(F.avg(column).alias("__avg"),
                       F.stddev(column).alias("__std"))
        return (df.crossJoin(F.broadcast(stats))
                  .filter((F.col(column) > F.col("__avg") + 3 * F.col("__std"))
                          | (F.col(column) < F.col("__avg") - 3 * F.col("__std")))
                  .drop("__avg", "__std"))
    return Check(f"outlier_3sigma({column})", severity, threshold, violations)


def _count_union(df: DataFrame, checks: list[Check],
                 key_cols) -> DataFrame | None:
    """The one union-of-aggregates plan both ``report`` and
    ``run_checks`` execute: each check's violation relation collapses
    to a 1-row COUNT, prefixed with ``key_cols(i, check)`` discriminator
    columns. None when ``checks`` is empty."""
    import functools

    if not checks:
        return None
    parts = [
        c._violations(df)
         .agg(F.count(F.lit(1)).cast("long").alias("violations"))
         .select(*key_cols(i, c), "violations")
        for i, c in enumerate(checks)]
    return functools.reduce(DataFrame.unionByName, parts)


def report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All checks as ONE lazy plan: each check's violation relation
    collapses to a 1-row COUNT aggregate, unioned into a
    (check_name, severity, violations) report relation.

    This is the 100 TB shape dbt lacks: dbt submits one warehouse query
    per test (its --threads only overlaps those separate queries), each
    paying its own driver round-trip; here N checks are N branches of a
    single job, scheduled concurrently across the cluster, and only N
    counter rows ever reach the driver. To be precise about what is
    saved (round-8 ADVICE): Spark performs no common-subplan sharing
    across union branches, so each branch still evaluates ``df``'s plan
    — the win is ONE job / one round-trip with concurrent branch
    scheduling, not one scan. When ``df`` is an expensive upstream plan,
    ``df.persist()`` before calling makes the branches share the
    materialized scan too. Each branch keeps its own distributed shape
    (anti-join for FK, groupBy for unique, scan-filter for the rest)."""
    plan = _count_union(
        df, checks,
        lambda i, c: [F.lit(c.name).alias("check_name"),
                      F.lit(c.severity.value).alias("severity")])
    if plan is None:
        return df.sparkSession.createDataFrame(
            [], "check_name string, severity string, violations long")
    return plan


def run_checks(df: DataFrame, checks: list[Check],
               fail_fast: bool = False) -> list[CheckResult]:
    """Evaluate checks; raise QualityError if any ERROR-severity check
    fails (WARN failures are reported but don't raise) — mirroring dbt
    severity semantics (5_dbt/READ.md:322, :330).

    ``fail_fast=False`` (the default) runs every check in one job via
    the ``report`` plan and fetches diagnostic samples only for checks
    with at least one violation — 1 + #checks-with-violations jobs
    instead of 2N. ``fail_fast=True`` keeps the serial per-check path so
    the first ERROR failure stops work before later checks execute at
    all."""
    if fail_fast:
        results: list[CheckResult] = []
        for c in checks:
            r = c.run(df)
            results.append(r)
            if not r.passed and r.severity == Severity.ERROR:
                raise QualityError([r])
        return results

    # the report plan, with a positional discriminator instead of the
    # check name: collect() order across union branches is not a
    # contract, and two checks may legitimately share a name
    plan = _count_union(df, checks,
                        lambda i, c: [F.lit(i).alias("__i")])
    counts: dict[int, int] = {}
    if plan is not None:
        counts = {row["__i"]: row["violations"] for row in plan.collect()}
    results = []
    for i, c in enumerate(checks):
        n = counts[i]
        sample = c._violations(df).limit(5).collect() if n else []
        results.append(CheckResult(c.name, c.severity, n, c.threshold,
                                   sample))
    failures = [r for r in results
                if not r.passed and r.severity == Severity.ERROR]
    if failures:
        raise QualityError(failures)
    return results
