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


def test_front_list_names_are_real_and_unique():
    """The driver checks ~50 queries per round in `queries()` order, and
    the front list is how stale driver rows get refreshed. `_ordered`
    silently skips unknown names, so a typo would quietly drop a query
    from its rotation slot — pin that every front entry resolves and none
    repeats (a repeat would waste a driver-check slot)."""
    import __spark_entry__ as e
    front = e._FRONT_R6
    assert len(front) == len(set(front)), "duplicate front entries"
    unknown = [n for n in front if n not in contract.QUERIES]
    assert not unknown, f"front entries not in registry: {unknown}"
