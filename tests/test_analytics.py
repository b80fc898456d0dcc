"""Semantic pins for the round-5 analytics queries (contract/analytics.py)
on crafted micro-fixtures — the parity suite proves oracle equality; these
prove the SEMANTICS are the intended ones (tiebreaks, island keys, rank
bounds), which an oracle that shares a bug could not."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from data_engineering_projects_spark import contract
    contract.load_all()
    return contract.QUERIES


def test_streak_island_key_splits_on_gap(spark):
    """Days {1,2,3, 6,7} → two islands of len 3 and 2; a single day is
    its own island."""
    rows = [(1, dt.date(2024, 1, d)) for d in (1, 2, 3, 6, 7)]
    rows += [(2, dt.date(2024, 1, 10))]
    df = spark.createDataFrame(rows, "user_id bigint, day date")
    from pyspark.sql import Window
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    island = (F.datediff("day", F.lit("1970-01-01").cast("date")) - rn)
    out = (df.select("user_id", island.alias("island"))
           .groupBy("user_id", "island").count()
           .groupBy("user_id")
           .agg(F.max("count").alias("longest"),
                F.count(F.lit(1)).alias("n_streaks"))
           .collect())
    got = {r["user_id"]: (r["longest"], r["n_streaks"]) for r in out}
    assert got == {1: (3, 2), 2: (1, 1)}


def test_mode_tiebreak_is_lexicographically_larger(spark):
    """Two types with equal counts on a day: struct-max picks the larger
    type string, matching the oracle's ORDER BY n DESC, type DESC."""
    rows = [(dt.date(2024, 1, 1), "aa"), (dt.date(2024, 1, 1), "zz")]
    df = spark.createDataFrame(rows, "day date, event_type string")
    c = df.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = (c.groupBy("day")
         .agg(F.max(F.struct(F.col("n"), F.col("event_type"))).alias("m"))
         .select(F.col("m.event_type").alias("mode")).collect())
    assert m[0]["mode"] == "zz"


def test_winsorized_bounds_are_data_values(spark, queries):
    """The p05/p95 bounds must be actual source values (rank-based, never
    interpolated) and the winsorized mean must sit within [lo, hi]."""
    out = queries["events_winsorized_mean"](spark, SF_DIR).collect()
    assert out
    from data_engineering_projects_spark.sources import load_table
    vals = {(r["event_type"], r["value"]) for r in
            load_table(spark, SF_DIR, "events")
            .filter(F.col("value").isNotNull())
            .select("event_type", "value").distinct().collect()}
    for r in out:
        assert (r["event_type"], r["lo"]) in vals
        assert (r["event_type"], r["hi"]) in vals
        assert r["lo"] <= r["winsorized_mean"] <= r["hi"]


def test_q13_distribution_mass_and_zero_bucket(spark, queries):
    """Total mass equals |customer| (so zero-order customers are NOT
    dropped by the left join), and the zero bucket matches a directly
    computed anti-join count (this testdata happens to give every
    customer an order, so the bucket is absent exactly when that count
    is 0 — the mass check is what pins the left-join semantics)."""
    rows = {r["c_count"]: r["custdist"] for r in
            queries["star_order_count_distribution"](spark, SF_DIR)
            .collect()}
    from data_engineering_projects_spark.sources import load_table
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    assert sum(rows.values()) == cust.count()
    n_zero = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                        "left_anti").count())
    assert rows.get(0, 0) == n_zero


def test_exclusive_late_supplier_exclusivity(spark, queries):
    """Recompute membership directly: every (order) counted for a
    supplier must have >=2 suppliers and exactly one late one — and that
    late one is the counted supplier."""
    from data_engineering_projects_spark.sources import load_table
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .select("l_orderkey", "l_suppkey",
                 (F.to_date("l_shipdate")
                  > F.date_add(F.to_date("o_orderdate"), 60)).alias("late")))
    per = (j.groupBy("l_orderkey", "l_suppkey")
           .agg(F.max("late").alias("supp_late")))
    rows = per.collect()
    by_order: dict = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], []).append(
            (r["l_suppkey"], r["supp_late"]))
    expect: dict = {}
    for sups in by_order.values():
        late = [s for s, f in sups if f]
        if len(sups) >= 2 and len(late) == 1:
            expect[late[0]] = expect.get(late[0], 0) + 1
    got = {r["suppkey"]: r["numwait"] for r in
           queries["star_exclusive_late_supplier"](spark, SF_DIR).collect()}
    assert got == expect


def test_rolling_wau_counts_distinct_users_not_user_days(spark, queries):
    """A user active on several days inside one 7-day window counts once
    for that anchor day — WAU is distinct users, not user-days."""
    out = {r["day"]: r["wau7"] for r in
           queries["events_rolling_wau"](spark, SF_DIR).collect()}
    from data_engineering_projects_spark.sources import load_table
    ud = (load_table(spark, SF_DIR, "events")
          .select("user_id", F.to_date("ts").alias("day")).distinct()
          .collect())
    days = sorted({r["day"] for r in ud})
    anchor = days[-1]
    lo = anchor - dt.timedelta(days=6)
    manual = len({r["user_id"] for r in ud if lo <= r["day"] <= anchor})
    assert out[anchor] == manual
    n_user_days = sum(1 for r in ud if lo <= r["day"] <= anchor)
    assert manual <= n_user_days  # strict when any user is multi-day


def test_lift_identity_on_margins(spark, queries):
    """lift == n_ab·N / (n_a·n_b) with N recovered from support, and
    n_ab <= min(n_a, n_b)."""
    rows = queries["events_type_lift"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        n_total = round(r["n_ab"] / r["support"])
        assert r["lift"] == pytest.approx(
            (r["n_ab"] * n_total) / (r["n_a"] * r["n_b"]), rel=1e-12)


def test_crosslang_groups_have_conflicting_labels(spark, queries):
    out = queries["docs_crosslang_dups"](spark, SF_DIR).collect()
    assert out, "blocked cross-lang check must be non-vacuous on testdata"
    assert all(r["n_langs"] >= 2 and r["n_docs"] >= r["n_langs"]
               for r in out)


def test_eigenvector_is_unit_norm_and_dominant(spark, queries):
    """The returned loading vector must be unit-norm, the eigenvalue
    positive, and the Rayleigh quotient of the returned vector must be
    close to the eigenvalue estimate (power iteration converged enough
    that v is a genuine dominant-direction approximation)."""
    import math
    rows = queries["embed_top_eigenvector"](spark, SF_DIR).collect()
    assert len(rows) == 64
    v = {r["dim"]: r["loading"] for r in rows}
    lam = rows[0]["eigenvalue"]
    assert lam > 0
    assert math.isclose(sum(x * x for x in v.values()), 1.0, rel_tol=1e-9)
    # Rayleigh check against the raw data
    from data_engineering_projects_spark.sources import load_table
    import numpy as np
    X = np.array([r["embedding"] for r in
                  load_table(spark, SF_DIR, "embeddings")
                  .select("embedding").collect()], dtype=np.float64)
    vv = np.array([v[d] for d in sorted(v)])
    # one more exact power step: Gram-iteration norms grow monotonically
    # toward lambda_1, so the next norm must be >= the reported estimate
    # and (3 rounds in) already within ~15% of it
    u = X.T @ (X @ vv)
    nxt = np.linalg.norm(u)
    assert nxt >= lam * (1 - 1e-9)
    assert (nxt - lam) / lam < 0.15


def test_gini_bounds_and_share_mass(spark, queries):
    rows = queries["events_value_concentration"](spark, SF_DIR).collect()
    assert rows
    gini = rows[0]["gini"]
    assert 0.0 <= gini <= 1.0
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    # decile 1 (top users) must hold at least its proportional share
    by_decile = {r["decile"]: r["share"] for r in rows}
    assert by_decile[1] >= 1.0 / len(rows)


def test_iqr_fences_bracket_quartiles(spark, queries):
    for r in queries["events_iqr_outliers"](spark, SF_DIR).collect():
        assert r["q1"] <= r["q3"]
        assert r["fence_lo"] <= r["q1"] and r["fence_hi"] >= r["q3"]
        assert r["n_low"] + r["n_high"] <= r["n"]


def test_bounce_rate_consistent_with_sessionize(spark, queries):
    """n_sessions summed over days equals the sessionize query's session
    count; bounce sessions are exactly the 1-event sessions."""
    sess = queries["events_sessionize"](spark, SF_DIR).collect()
    bounce = queries["events_bounce_rate"](spark, SF_DIR).collect()
    assert sum(r["n_sessions"] for r in bounce) == len(sess)
    assert (sum(r["n_bounce"] for r in bounce)
            == sum(1 for s in sess if s["n_events"] == 1))
