"""Expectations-layer self-tests with deliberately dirty fixtures
(SURVEY.md §5.2 layer 3 — mirrors 5_dbt/READ.md:296-381, :823-879)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_projects_spark import quality as Q


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "L1", 50.0, 10),
        (2, "L1", -5.0, 20),      # negative speed (range violation)
        (3, "L2", 200.0, None),   # >120 speed, null count
        (4, None, 60.0, 30),      # null location
        (5, "L9", 55.0, 40),      # orphan FK (no L9 in locations)
    ]
    return spark.createDataFrame(rows, "id long, location_id string, speed double, cnt int")


@pytest.fixture(scope="module")
def locations(spark):
    return spark.createDataFrame(
        [("L1", 45.0), ("L2", 12.0), ("L2", 13.0)],  # L2 duplicated
        "location_id string, latitude double")


def test_not_null(dirty):
    r = Q.not_null("location_id").run(dirty)
    assert r.violations == 1 and not r.passed


def test_unique(locations):
    r = Q.unique("location_id").run(locations)
    assert r.violations == 1  # one duplicated key group


def test_relationships(dirty, locations):
    r = Q.relationships("location_id", locations, "location_id").run(dirty)
    assert r.violations == 1  # L9 orphan; NULLs are ignored like dbt


def test_accepted_range(dirty):
    r = Q.accepted_range("speed", 0, 120).run(dirty)
    assert r.violations == 2  # -5 and 200


def test_accepted_values(dirty):
    r = Q.accepted_values("location_id", ["L1", "L2"]).run(dirty)
    assert r.violations == 1  # L9


def test_singular_threshold(dirty):
    c = Q.singular("null_cnt", F.col("cnt").isNull(), threshold=1)
    assert c.run(dirty).passed  # 1 violation <= threshold 1
    c0 = Q.singular("null_cnt", F.col("cnt").isNull(), threshold=0)
    assert not c0.run(dirty).passed


def test_outlier_3sigma(spark):
    rows = [(float(i),) for i in range(100)] + [(10_000.0,)]
    df = spark.createDataFrame(rows, "v double")
    r = Q.outlier_3sigma("v").run(df)
    assert r.violations == 1


def test_run_checks_severity(dirty, locations):
    # WARN failures report but don't raise
    res = Q.run_checks(dirty, [Q.accepted_range("speed", 0, 120, Q.Severity.WARN)])
    assert not res[0].passed
    # ERROR failures raise QualityError
    with pytest.raises(Q.QualityError):
        Q.run_checks(dirty, [Q.not_null("location_id")])


def test_report_single_plan(dirty, locations):
    """report() = one lazy union plan whose rows carry every check's
    violation count; collecting it equals running each check alone."""
    checks = [Q.not_null("location_id"), Q.unique("location_id"),
              Q.relationships("location_id", locations, "location_id"),
              Q.accepted_range("speed", 0, 120)]
    rep = Q.report(dirty, checks)
    assert rep.columns == ["check_name", "severity", "violations"]
    got = {r["check_name"]: r["violations"] for r in rep.collect()}
    for c in checks:
        assert got[c.name] == c.run(dirty, sample_rows=0).violations


def test_run_checks_duplicate_names(dirty):
    """Two checks sharing a name must each keep a count (the report
    bucket is a list, not a flat dict)."""
    checks = [Q.singular("same", F.col("cnt").isNull(), threshold=5),
              Q.singular("same", F.col("speed") < 0, threshold=5)]
    res = Q.run_checks(dirty, checks)
    assert sorted(r.violations for r in res) == [1, 1]
    assert all(r.passed for r in res)


def test_run_checks_samples_only_failures(dirty):
    """The single-pass path fetches samples only for failing checks."""
    res = Q.run_checks(
        dirty, [Q.accepted_range("speed", 0, 120, Q.Severity.WARN),
                Q.singular("clean", F.col("id") < 0, threshold=0)])
    failing, clean = res
    assert not failing.passed and len(failing.sample) > 0
    assert clean.passed and clean.sample == []


def test_report_empty_checks(dirty):
    rep = Q.report(dirty, [])
    assert rep.columns == ["check_name", "severity", "violations"]
    assert rep.count() == 0
    assert Q.run_checks(dirty, []) == []
