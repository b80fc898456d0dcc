"""Round-7/8 hardening tests (VERDICT.md r6 item #4 + r7 ADVICE items).

1. **Percentile bit-parity property suite** — the round-6 rule
   (contract/__init__.py) emits interpolated percentiles RAW on the
   claim that Spark ``percentile`` and DuckDB ``quantile_cont`` are
   bit-identical. Round-8 probes pinned the REAL semantics of both
   engines (pyspark 4.1.2, duckdb 1.0.0):

   - both engines interpolate with the SAME arithmetic on a
     distinct-value bracket: ``(ceil(pos)-pos)*lo + (pos-floor(pos))*hi``
     with ``pos = p*(n-1)`` (equivalently ``(1-f)*lo + f*hi`` — the two
     coefficient spellings agreed bit-wise on every probed input), so
     distinct brackets ARE bit-identical cross-engine;
   - the ONE divergence class is a DUPLICATE-value bracket ``[x, x]``
     at a non-dyadic fraction: Spark short-circuits equal bracket keys
     and returns the stored ``x``, while DuckDB runs the interpolation
     arithmetic, and ``(1-f)*x + f*x`` can drift from ``x`` by one ulp
     (e.g. ``x=1.19073486328125e-05, f=1/3``);
   - the round-7 draft of this module claimed a ``-0.0`` divergence
     (DuckDB normalizing to ``+0.0``); that boundary DOES NOT EXIST —
     an all-``-0.0`` group returns ``-0.0`` on BOTH engines (IEEE:
     ``-0.0 + -0.0 = -0.0``, and scaling ``-0.0`` keeps the sign).
     Pinned below as an agreement, not a divergence (r7 ADVICE).

   Consequences for the raw-emission rule are applied in round 8:
   oracles whose raw percentiles range over DISCRETE data (duplicate
   brackets likely — ``docs_length_band`` over integer n_chars,
   ``star_pricing_p95_approx`` over 2dp money) mirror Spark's
   short-circuit in SQL instead of calling ``quantile_cont``;
   continuous-domain inputs are audited duplicate-bracket-free on the
   driver data by ``tools/percentile_bracket_audit.py``.

2. **Engine-version pin** — the bit-exactness claim is empirical; an
   engine upgrade must re-trigger this module rather than silently
   inherit the claim. (Landed together with a green run, r7 ADVICE.)

3. **pct_change / lag_diff vs pandas** (round-6 VERDICT #4) —
   property tests against pandas ``.diff()`` / ``.pct_change()`` on
   adversarial series, with the deliberate deviation (``try_divide``
   -> fill on zero previous, where pandas yields ±inf/NaN) asserted
   explicitly, and the pandas-tolerance comparison skipped when the
   reference quotient itself is non-finite (r7 ADVICE: overflow on a
   subnormal ``prev`` makes ``abs(g-w)`` NaN against an inf bound).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_projects_spark.operators.windows import lag_diff, pct_change

#: The registry's percentile fractions plus awkward non-dyadic ones.
_PS = [0.5, 0.8, 0.85, 0.95, 0.123456789, 1.0 / 3.0]

#: Engine builds the percentile-parity model below was verified
#: against. On an upgrade this test fails: re-run this module (and
#: tools/differential_sweep.py) on the new builds, then update the pin.
_VERIFIED = {"pyspark": "4.1.2", "duckdb": "1.0.0"}


def test_engine_versions_pinned():
    """The percentile parity model (shared interpolation arithmetic +
    Spark-only duplicate-bracket short-circuit) is empirical, not
    spec-guaranteed — pin the engine builds it was verified on so a
    version bump re-triggers verification instead of silently
    inheriting the claim."""
    import pyspark

    got = {"pyspark": pyspark.__version__, "duckdb": duckdb.__version__}
    assert got == _VERIFIED, (
        f"engine versions changed ({got} != verified {_VERIFIED}): the "
        f"percentile parity model (this module, contract/__init__.py) "
        f"was verified on the pinned builds only — re-run this module "
        f"and tools/differential_sweep.py on the new builds, then "
        f"update _VERIFIED")


def _model_percentile(xs: list[float], p: float) -> tuple[float, float]:
    """(spark_expected, duckdb_expected) for one group/fraction.

    Shared arithmetic: ``pos = p*(n-1)``; integral pos returns the
    element; else ``(ceil(pos)-pos)*lo + (pos-floor(pos))*hi``. Spark
    additionally short-circuits an equal-value bracket to the stored
    value; DuckDB always runs the arithmetic (the ulp-drift class)."""
    s = sorted(xs)
    pos = p * (len(s) - 1)
    li, hi_i = math.floor(pos), math.ceil(pos)
    if li == hi_i:
        return s[li], s[li]
    lo, hi = s[li], s[hi_i]
    interp = (hi_i - pos) * lo + (pos - li) * hi
    return (lo if lo == hi else interp), interp


def _zero_sign_unpinned(xs: list[float]) -> bool:
    """True when the group holds BOTH +0.0 and -0.0: the two compare
    equal, so which representative a sort places at the bracket index
    is implementation-arbitrary (engines use IEEE total order with
    their own tie handling; the model's stable python sort differs),
    and duplicate-bracket arithmetic over mixed-sign zeros flips the
    sign (``-0.0 + +0.0 = +0.0``). The zero's SIGN is therefore not a
    pinnable semantic in this one case — values are still pinned."""
    return (any(x == 0.0 and math.copysign(1.0, x) < 0 for x in xs)
            and any(x == 0.0 and math.copysign(1.0, x) > 0 for x in xs))


def _pin(v: float, xs: list[float]) -> str:
    if v == 0.0 and _zero_sign_unpinned(xs):
        return "0.0(sign-unpinned)"
    return repr(v)


def _duck_quantiles(rows: list[tuple[int, float]]) -> dict[int, list[float]]:
    con = duckdb.connect()
    try:
        pdf = pd.DataFrame(rows, columns=["gid", "x"])
        con.register("t", pdf)
        ps = "[" + ", ".join(repr(p) for p in _PS) + "]"
        out = con.execute(
            f"SELECT gid, quantile_cont(x, {ps}) FROM t GROUP BY gid"
        ).fetchall()
        return {gid: list(q) for gid, q in out}
    finally:
        con.close()


_FINITE = st.floats(allow_nan=False, allow_infinity=False,
                    allow_subnormal=True, width=64)

#: Duplicate-heavy element pool: sampled_from constants collide often,
#: exercising the duplicate-bracket branch on most examples.
_ELEM = st.one_of(_FINITE,
                  st.sampled_from([0.0, -0.0, 1.0, 3.0, 2.675,
                                   1.0 / 3.0, 1e-300, -1e300,
                                   1.19073486328125e-05]))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(_ELEM, min_size=1, max_size=40),
                min_size=1, max_size=4))
def test_percentile_parity_model_vs_both_engines(spark, groups):
    """Pin BOTH engines against the verified model on adversarial
    inputs (subnormals, huge magnitudes, signed zeros, heavy
    duplicates, 1-element groups):

    - Spark ``percentile`` == model's spark branch bit-exactly
      (repr equality, which distinguishes -0.0 from +0.0);
    - DuckDB ``quantile_cont`` == model's duckdb branch bit-exactly;
    - on distinct brackets the branches coincide => cross-engine bit
      parity; on duplicate brackets they may differ by the documented
      ulp drift — exactly what the model predicts, nothing more.

    One Spark job per example: all groups and fractions evaluate in a
    single grouped aggregate."""
    rows = [(gid, x) for gid, xs in enumerate(groups) for x in xs]
    got = {
        r["gid"]: list(r["q"])
        for r in spark.createDataFrame(rows, "gid int, x double")
        .groupBy("gid")
        .agg(F.percentile("x", F.lit(_PS)).alias("q")).collect()
    }
    want = _duck_quantiles(rows)
    assert got.keys() == want.keys()
    for gid, xs in enumerate(groups):
        for p, g, w in zip(_PS, got[gid], want[gid]):
            exp_s, exp_d = _model_percentile(xs, p)
            assert _pin(g, xs) == _pin(exp_s, xs), (
                f"gid={gid} p={p}: spark={g!r} != model {exp_s!r} "
                f"(inputs {xs!r})")
            assert _pin(w, xs) == _pin(exp_d, xs), (
                f"gid={gid} p={p}: duckdb={w!r} != model {exp_d!r} "
                f"(inputs {xs!r})")


def test_percentile_duplicate_bracket_diverges(spark):
    """THE divergence boundary (round-8, replacing the round-7 draft's
    nonexistent -0.0 claim): a duplicate-value bracket ``[x, x]`` at a
    non-dyadic fraction. Spark short-circuits equal bracket keys and
    returns the stored ``x``; DuckDB computes ``(1-f)*x + f*x`` which
    drifts one ulp for this x. This is why round-8 rewrote the
    discrete-domain oracles (docs_length_band, star_pricing_p95_approx)
    to mirror Spark's short-circuit in SQL. If an engine upgrade
    changes either side, this fails and the rule needs re-auditing."""
    x = 1.19073486328125e-05
    rows = [(0, x), (0, x)]
    got = (spark.createDataFrame(rows, "gid int, x double")
           .groupBy("gid")
           .agg(F.percentile("x", F.lit([1.0 / 3.0])).alias("q"))
           .collect()[0]["q"][0])
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame(rows, columns=["gid", "x"]))
        want = con.execute(
            "SELECT quantile_cont(x, 1.0/3.0) FROM t").fetchone()[0]
    finally:
        con.close()
    assert repr(got) == "1.19073486328125e-05", got
    assert repr(want) == "1.1907348632812503e-05", (
        f"duckdb duplicate-bracket drift changed ({want!r}): re-audit "
        f"the raw-percentile rule in contract/__init__.py")


def test_percentile_negative_zero_bracket_agrees(spark):
    """An all-``-0.0`` group returns ``-0.0`` on BOTH engines: the
    interpolation arithmetic ``(1-f)*(-0.0) + f*(-0.0)`` preserves the
    sign (IEEE: negative-zero sums and scalings stay negative zero), so
    — contrary to the round-7 draft's claim — signed zero is NOT a
    divergence class for percentiles. Pinned as an agreement so an
    engine change here re-opens the audit."""
    rows = [(0, -0.0)] * 10
    got = (spark.createDataFrame(rows, "gid int, x double")
           .groupBy("gid")
           .agg(F.percentile("x", F.lit([0.25])).alias("q"))
           .collect()[0]["q"][0])
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame(rows, columns=["gid", "x"]))
        want = con.execute(
            "SELECT quantile_cont(x, 0.25) FROM t").fetchone()[0]
    finally:
        con.close()
    assert repr(got) == "-0.0" and repr(want) == "-0.0", (
        f"signed-zero percentile behavior changed "
        f"(spark={got!r} duckdb={want!r}): re-audit")


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(_ELEM, min_size=1, max_size=40),
                min_size=1, max_size=3),
       st.sampled_from([0.05, 0.5, 0.8, 0.85, 0.95, 1.0 / 3.0]))
def test_spark_pct_sql_matches_spark_percentile(spark, groups, p):
    """The oracle-side rendering ``spark_pct_sql`` must equal Spark
    ``F.percentile`` bit-exactly on ARBITRARY inputs — including the
    duplicate brackets where quantile_cont diverges (that is the whole
    reason the helper exists). Renders the same grouped shape the
    rewritten contract oracles use: list_sort(list(..)) + len(l),
    evaluated by DuckDB, repr-compared per group against Spark (zero
    sign unpinned only for mixed-sign-zero groups, as above)."""
    from data_engineering_projects_spark.functions.determinism import (
        spark_pct_sql)

    rows = [(gid, x) for gid, xs in enumerate(groups) for x in xs]
    got = {
        r["gid"]: r["q"]
        for r in spark.createDataFrame(rows, "gid int, x double")
        .groupBy("gid")
        .agg(F.percentile("x", F.lit(p)).alias("q")).collect()
    }
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame(rows, columns=["gid", "x"]))
        expr = spark_pct_sql("l", "len(l)", p)
        want = dict(con.execute(
            f"SELECT gid, {expr} FROM (SELECT gid, "
            f"list_sort(list(x) FILTER (WHERE x IS NOT NULL)) AS l "
            f"FROM t GROUP BY gid)").fetchall())
    finally:
        con.close()
    assert got.keys() == want.keys()
    for gid, xs in enumerate(groups):
        assert _pin(got[gid], xs) == _pin(want[gid], xs), (
            f"gid={gid} p={p}: spark={got[gid]!r} "
            f"spark_pct_sql={want[gid]!r} (inputs {xs!r})")


def test_percentile_bracket_audit_clean_at_test_sf(sf_dir):
    """Run the registry percentile-bracket audit at the test SF: no
    raw-percentile grouping over events.value may hold a DRIFTING
    duplicate bracket (duplicate brackets themselves occur — value is
    2dp-quantized — but where one lands, `(1-f)*x + f*x` must still
    equal `x`, else the quantile_cont-based oracles would diverge from
    Spark's short-circuit). The parity CTEs were rewritten onto
    spark_pct_sql precisely so this can't bite; the audit keeps the
    data-side claim honest as fixtures evolve."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "percentile_bracket_audit",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools",
            "percentile_bracket_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.audit_sf(sf_dir)
    assert res["drifting"] == 0, res
    # the premise the audit exists for: the data really does duplicate
    assert res["n_distinct"] < res["n_values"], res


# ---------------------------------------------------------------------------
# pct_change / lag_diff vs pandas
# ---------------------------------------------------------------------------

_VAL = st.one_of(
    st.none(),
    st.just(0.0),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e12, max_value=1e12))


@settings(max_examples=15, deadline=None)
@given(st.lists(_VAL, min_size=1, max_size=30))
def test_lag_diff_matches_pandas_diff(spark, values):
    """``lag_diff`` == pandas ``Series.diff().fillna(0)`` bit-exactly:
    both compute the identical IEEE ``v - prev`` in float64, and a NULL
    (None) value propagates to NaN/NULL on both sides before the fill."""
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, v double")
    got = {r["i"]: r["change"]
           for r in lag_diff(df, "v", "i", fill=0.0).collect()}
    want = pd.Series(values, dtype="float64").diff().fillna(0.0)
    for i in range(len(values)):
        g, w = got[i], want.iloc[i]
        assert repr(g) == repr(float(w)), (
            f"i={i}: spark={g!r} pandas={w!r} (values {values!r})")


@settings(max_examples=15, deadline=None)
@given(st.lists(_VAL, min_size=1, max_size=30))
def test_pct_change_vs_pandas(spark, values):
    """``pct_change`` against pandas ``Series.pct_change()``:

    - bit-exact vs the python reference ``(v - prev) / prev`` (the
      operator's own formula) wherever prev is non-zero and non-NULL —
      including a quotient that overflows to ±inf on a subnormal prev;
    - within float tolerance of pandas' ``v/prev - 1`` (a DIFFERENT but
      algebraically equal formula — near-cancellation makes the two
      differ by ulps, so this comparison is toleranced, scaled by
      |v/prev|) — SKIPPED when the reference quotient is non-finite
      (r7 ADVICE: ``abs(inf - inf)`` is NaN and no finite tolerance
      applies; the bit-exact check above already pinned the value);
    - the DELIBERATE deviation asserted explicitly: a zero previous
      value yields the fill (0.0) here via ``try_divide``, where pandas
      yields ±inf (v != 0) or NaN (0/0).
    """
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, v double")
    got = {r["i"]: r["pct_change"]
           for r in pct_change(df, "v", "i", fill=0.0).collect()}
    pandas_pc = pd.Series(values, dtype="float64").pct_change(fill_method=None)
    for i, v in enumerate(values):
        prev = values[i - 1] if i > 0 else None
        g = got[i]
        if prev is None or v is None:
            assert g == 0.0, f"i={i}: missing operand must fill, got {g!r}"
        elif prev == 0.0:
            # the deliberate deviation: try_divide -> NULL -> fill
            assert g == 0.0 and repr(g) == "0.0", (
                f"i={i}: zero-prev must fill 0.0, got {g!r}")
            w = pandas_pc.iloc[i]
            assert math.isinf(w) or math.isnan(w), (
                f"i={i}: pandas should give inf/NaN on zero prev, got {w!r}")
        else:
            ref = (v - prev) / prev
            assert repr(g) == repr(ref), (
                f"i={i}: spark={g!r} != python ref={ref!r}")
            if not math.isfinite(ref):
                continue  # overflow pinned bit-exactly above; no
                # finite tolerance is meaningful vs pandas' ±inf/NaN
            w = float(pandas_pc.iloc[i])
            scale = max(1.0, abs(v / prev))
            assert abs(g - w) <= 1e-12 * scale, (
                f"i={i}: spark={g!r} vs pandas={w!r} beyond formula "
                f"tolerance (values {values!r})")


def test_lag_diff_duplicate_order_keys_yield_a_valid_tie_order(spark):
    """Duplicate order-key values ("duplicate years"): the window sort
    is non-deterministic between tied rows, so the result must match
    ONE of the valid tie orderings — and contract queries therefore
    always order by a unique key suffix (documented in
    operators/windows.py). Pinned here so the semantics are a test,
    not folklore."""
    rows = [(2020, 1.0), (2020, 2.0), (2021, 4.0)]
    df = spark.createDataFrame(rows, "year int, v double")
    out = sorted((r["v"], r["change"])
                 for r in lag_diff(df, "v", "year", fill=0.0).collect())
    order_a = sorted([(1.0, 0.0), (2.0, 1.0), (4.0, 2.0)])   # 1,2 then 4
    order_b = sorted([(2.0, 0.0), (1.0, -1.0), (4.0, 3.0)])  # 2,1 then 4
    assert out in (order_a, order_b), out
