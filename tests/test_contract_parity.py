"""Differential tests: every registered contract query vs its DuckDB oracle
(the driver's t2 gate, run locally)."""

from __future__ import annotations

import pytest

from data_engineering_projects_spark import contract

contract.load_all()

NAMES = sorted(contract.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    from .oracle import compare
    fn = contract.QUERIES[name]
    df = fn(spark, sf_dir)
    if name in contract.ORACLES:
        compare(df, contract.ORACLES[name], sf_dir)
    else:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0


def test_oracles_subset_of_queries():
    assert set(contract.ORACLES) <= set(contract.QUERIES)
