"""Full-precision oracle certification (round-2 VERDICT.md item #6).

The differential sweep itself is ``tests/test_contract_parity.py``: since
round 3, ``tests/oracle.py::_canon_cell`` canonicalizes floats with
``repr`` (shortest round-trip — distinguishes ``-0.0`` from ``0.0`` and
every ulp), so ALL oracle-backed contract queries are compared at driver
strictness on every pytest run (sf0.01, single session, ~90 s).

This module pins that property so it cannot silently regress:

1. the canon stays repr-strict (a reintroduced zero-normalization or
   precision truncation fails immediately), and
2. the two-round red row ``dbt_congestion_hourly`` passes repeatedly at
   full precision — the signed-zero class the old canon masked.
"""

from __future__ import annotations

import pytest

from tests.oracle import _canon_cell, compare


def test_canon_cannot_be_blinder_than_driver():
    """Regression guard on the harness itself: any future 'normalize'
    convenience that merges -0.0/0.0, truncates precision, or rounds
    floats re-opens the blind spot that hid the r1/r2 red row."""
    assert _canon_cell(-0.0) == "-0.0"
    assert _canon_cell(0.0) == "0.0"
    assert _canon_cell(1e-300) != _canon_cell(0.0)
    # shortest-repr round-trip: canon(x) reconstructs x exactly
    for x in (0.1, 1 / 3, 2.675, 1.2521875, -0.0, 5e-324):
        assert float(_canon_cell(x)) == x or (x == 0 and _canon_cell(x) == "-0.0")


@pytest.mark.parametrize("attempt", range(3))
def test_congestion_hourly_full_precision_repeated(spark, sf_dir, attempt):
    """The r1/r2 red row, re-run multiple times at repr strictness.

    Root cause was deterministic signed zero (not a flake), so three runs
    with the +0.0 guard in place certify the fix; the per-run plan is
    identical so further repeats add nothing."""
    from data_engineering_projects_spark import contract
    contract.load_all()
    name = "dbt_congestion_hourly"
    compare(contract.QUERIES[name](spark, sf_dir), contract.ORACLES[name],
            sf_dir)
