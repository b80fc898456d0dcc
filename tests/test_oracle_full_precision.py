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


def test_array_columns_rejected_before_driver_can_crash(spark):
    """Negative control for the round-3 red row class: the DRIVER's
    pandas canonicalizer dies on array-typed result columns (sort_values
    -> TypeError: unhashable numpy.ndarray), and the old local harness
    passed them via str(list) — strictly weaker than the driver. The
    harness must now refuse complex-typed outputs up front.

    Reproduces the driver's failure mode directly (pandas sort on an
    array column raises) and asserts the local guard fires first."""
    import pandas as pd
    import pytest as _pytest

    from pyspark.sql import functions as F
    from tests.oracle import assert_driver_hashable

    df = spark.range(3).select(
        F.col("id"), F.array(F.col("id"), F.col("id") + 1).alias("arr"))

    # the driver's canon path: toPandas + sort_values over all columns
    with _pytest.raises(TypeError, match="unhashable"):
        df.toPandas().sort_values(by=["id", "arr"])

    # the local guard must reject the same shape before any comparison
    with _pytest.raises(AssertionError, match="driver-unhashable"):
        assert_driver_hashable(df)

    # scalar-only outputs pass the guard
    assert_driver_hashable(df.select("id"))


def test_hugeint_oracle_is_caught_at_declared_schema(spark, sf_dir):
    """The round-5 red row class (``docs_select_token_budget``): DuckDB's
    integer SUM returns HUGEINT (int128), which ``fetchdf`` coerces to
    float64, while Spark emits int64 — equal values, different driver
    canon. History of the guard: the driver-style pandas canon catches
    it at the VALUE level (round 5); since round 8 the declared-schema
    kind check (``_assert_scalar_kinds``, which keys HUGEINT as its own
    kind) catches it EARLIER — in both canon modes, and even on a 0-row
    result, where neither value canon has any evidence. The repo rule
    CAST(SUM(...) AS BIGINT) (``contract/__init__.py``) must pass both
    modes."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .groupBy("source").agg(F.sum("n_chars").alias("total_chars")))
    uncast = ("SELECT source, SUM(n_chars) AS total_chars "
              "FROM documents GROUP BY source")
    cast = ("SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY source")

    # the declared-kind check flags the uncast oracle in EVERY mode —
    # including the python-object mode that was value-blind to it
    with _pytest.raises(AssertionError, match="scalar column-kind"):
        compare(df, uncast, sf_dir, pandas_canon=False)
    with _pytest.raises(AssertionError, match="scalar column-kind"):
        compare(df, uncast, sf_dir)
    # ... and on an empty result, where no value canon could ever see it
    with _pytest.raises(AssertionError, match="scalar column-kind"):
        compare(df.filter(F.lit(False)), uncast + " HAVING COUNT(*) < 0",
                sf_dir)
    # the repo's CAST rule makes both modes green
    compare(df, cast, sf_dir)


def test_no_registered_query_returns_complex_columns(spark, sf_dir):
    """Schema-level sweep: every contract query's output is scalar-typed
    (driver-hashable) — enforced on the cheap via the analyzed schema,
    no execution needed for most queries.

    Restricted to non-streaming queries here (streaming queries execute
    work in their builder; their schemas are covered by the parity run)."""
    from data_engineering_projects_spark import contract
    from tests.oracle import assert_driver_hashable

    contract.load_all()
    for name, fn in contract.QUERIES.items():
        if name.startswith("streaming_"):
            continue
        assert_driver_hashable(fn(spark, sf_dir))


def test_pandas_canon_value_layer_still_catches_hugeint(spark, sf_dir,
                                                        monkeypatch):
    """Layered-defense regression guard (round-8 review): the kind check
    fires FIRST on a HUGEINT oracle, but the round-5 pandas-canon VALUE
    guard must keep working independently — if the kind check is ever
    relaxed (here: stubbed out), the value layer still reddens the
    uncast oracle."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    import tests.oracle as O

    monkeypatch.setattr(O, "_assert_scalar_kinds", lambda *a, **k: None)
    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .groupBy("source").agg(F.sum("n_chars").alias("total_chars")))
    uncast = ("SELECT source, SUM(n_chars) AS total_chars "
              "FROM documents GROUP BY source")
    with _pytest.raises(AssertionError, match="pandas-canon"):
        O.compare(df, uncast, sf_dir)
