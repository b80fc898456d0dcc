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


def test_registry_swap_invariants():
    """Swap contract (rounds 11+12): the driver-facing registry stays
    frozen at exactly 128 entries, RETIRED names are excluded from it
    (but remain registered for tests/tooling), and every swapped-in
    query is present with an oracle."""
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert len(qs) == 128 and len(osql) == 128
    assert not (set(qs) & contract.RETIRED)
    assert contract.RETIRED <= set(contract.QUERIES)  # still registered
    for name in ("embed_pq_adc_topk", "orders_scd2_current",
                 "docs_pii_scrub", "corpus_extend_admissions"):
        assert name in qs and name in osql


def test_staleness_order_rotates_correctly():
    """The dynamic rotation must (1) front any query whose latest driver
    row is not fully green or that has no row, (2) order green queries
    oldest-driver-row-first, and (3) fall back to the static list when
    no correctness files exist — so the ~50-query driver budget always
    lands on the rows that need refreshing."""
    import glob
    import json
    import os

    import __spark_entry__ as e

    order = e._staleness_order(list(contract.QUERIES))
    assert order is not None and len(order) == len(contract.QUERIES)

    import re

    here = os.path.dirname(os.path.abspath(e.__file__))
    latest = {}
    files = []
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            files.append((int(m.group(1)), p))
    for rnd, p in sorted(files):
        for name, v in json.load(open(p)).items():
            green = bool(v.get("rows_match") and v.get("schema_match")
                         and v.get("hash_match") and not v.get("err"))
            latest[name] = (rnd, green)
    # mirror the implementation's full key — (green, round, name) — so
    # the assertion stays valid when reds span multiple rounds or
    # never-checked queries (round 0) coexist with red rows
    def key(name):
        rnd, green = latest.get(name, (0, False))
        return (1 if green else 0, rnd, name)
    assert order == sorted(contract.QUERIES, key=key)
    reds = {q for q in contract.QUERIES
            if not latest.get(q, (0, False))[1]}
    # every non-green / never-checked query sorts before every green one
    assert set(order[:len(reds)]) == reds


def test_staleness_order_falls_back_without_correctness_files(monkeypatch):
    """No CORRECTNESS files (first round / foreign checkout) -> None, and
    `_ordered` then applies the static _FRONT_R6 list."""
    import glob

    import __spark_entry__ as e

    monkeypatch.setattr(glob, "glob", lambda *a, **k: [])
    assert e._staleness_order(list(contract.QUERIES)) is None
    d = {k: k for k in contract.QUERIES}
    assert list(e._ordered(d))[:3] == [n for n in e._FRONT_R6 if n in d][:3]


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
