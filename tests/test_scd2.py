"""SCD Type-2 maintenance (operators/scd.py).

Oracle discipline: applying the update stream in ANY batch split must
equal deriving validity intervals from the full history in one shot
(with consecutive-duplicate changes suppressed) — merge-by-batches is
algebraically a full refresh. Deterministic pseudo-random history with
planted consecutive duplicates and NULL attribute values."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_projects_spark.operators.scd import (
    scd2_apply,
    scd2_init,
)

KEY, ATTRS = "cust_id", ["segment", "city"]


def _history():
    """(cust_id, segment, city, eff_ts): 30 keys × up to 6 changes,
    value domains small enough to plant consecutive duplicates, NULLs
    included in the domain."""
    segs = ["a", "b", None, "a", "c", "a"]
    cities = ["x", "x", "y", None, "y", "z"]
    rows = []
    t0 = dt.datetime(2026, 1, 1)
    for k in range(30):
        n = (k * 7 % 6) + 1
        for i in range(n):
            rows.append((k, segs[(k + i) % 6], cities[(k * 3 + i) % 6],
                         t0 + dt.timedelta(hours=k * 100 + i)))
    return rows


def _oracle(spark, rows):
    """One-shot interval derivation over the full history with
    consecutive-equal suppression — the events_scd2_intervals shape."""
    df = spark.createDataFrame(
        rows, f"{KEY} long, segment string, city string, eff_ts timestamp")
    w = Window.partitionBy(KEY).orderBy("eff_ts")
    is_first = F.lag("eff_ts").over(w).isNull()
    same = F.lit(True)
    for a in ATTRS:
        same = same & F.col(a).eqNullSafe(F.lag(a).over(w))
    kept = df.withColumn("__k", is_first | ~same).filter("__k")
    w2 = Window.partitionBy(KEY).orderBy("eff_ts")
    return (kept.withColumn("valid_from", F.col("eff_ts"))
            .withColumn("valid_to", F.lead("eff_ts").over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .select(KEY, *ATTRS, "valid_from", "valid_to", "is_current"))


def _as_set(df):
    return {tuple(r) for r in
            df.select(KEY, *ATTRS, "valid_from", "valid_to",
                      "is_current").collect()}


def _batches(spark, rows, cuts):
    rows = sorted(rows, key=lambda r: r[3])
    out, prev = [], 0
    for c in list(cuts) + [len(rows)]:
        chunk = rows[prev:c]
        prev = c
        out.append(spark.createDataFrame(
            chunk,
            f"{KEY} long, segment string, city string, eff_ts timestamp"))
    return out


@pytest.mark.parametrize("cuts", [(40,), (25, 60), (10, 30, 70)])
def test_incremental_equals_oneshot(spark, cuts):
    rows = _history()
    batches = _batches(spark, rows, cuts)
    # materialize state between batches (the documented contract: a
    # real flow writes the dim store; lazy chaining doubles the plan)
    dim = scd2_init(batches[0], KEY, ATTRS).localCheckpoint(eager=True)
    for b in batches[1:]:
        dim = scd2_apply(dim, b, KEY, ATTRS).localCheckpoint(eager=True)
    assert _as_set(dim) == _as_set(_oracle(spark, rows))


def test_batch_replay_is_noop(spark):
    rows = _history()
    b1, b2 = _batches(spark, rows, (50,))
    dim = scd2_init(b1, KEY, ATTRS).localCheckpoint(eager=True)
    dim = scd2_apply(dim, b2, KEY, ATTRS).localCheckpoint(eager=True)
    once = _as_set(dim)
    again = scd2_apply(dim, b2, KEY, ATTRS)
    assert _as_set(again) == once


def test_late_updates_discarded(spark):
    rows = _history()
    df = spark.createDataFrame(
        rows, f"{KEY} long, segment string, city string, eff_ts timestamp")
    dim = scd2_init(df, KEY, ATTRS).localCheckpoint(eager=True)
    before = _as_set(dim)
    # a "late" change stamped before every open row's valid_from
    late = spark.createDataFrame(
        [(0, "zzz", "zzz", dt.datetime(2020, 1, 1))],
        f"{KEY} long, segment string, city string, eff_ts timestamp")
    after = scd2_apply(dim, late, KEY, ATTRS)
    assert _as_set(after) == before


def test_single_open_row_per_key(spark):
    rows = _history()
    b = _batches(spark, rows, (30, 60))
    dim = scd2_init(b[0], KEY, ATTRS).localCheckpoint(eager=True)
    for x in b[1:]:
        dim = scd2_apply(dim, x, KEY, ATTRS).localCheckpoint(eager=True)
    per_key = dim.filter("is_current").groupBy(KEY).count()
    assert per_key.agg(F.max("count")).first()[0] == 1
    # every key in the history has exactly one open row
    assert per_key.count() == 30


from hypothesis import given, settings, strategies as st  # noqa: E402

# random histories: up to 6 keys x up to 5 changes, tiny attr domains
# (forces consecutive duplicates), NULLs in domain, random batch split
_EVENT = st.tuples(st.integers(0, 5),
                   st.sampled_from(["a", "b", None]),
                   st.sampled_from(["x", None]),
                   st.integers(0, 400))


@settings(max_examples=12, deadline=None)
@given(st.lists(_EVENT, min_size=1, max_size=30, unique_by=lambda e: e[3]),
       st.integers(1, 29))
def test_property_any_split_equals_oneshot(spark, events, cut):
    """Hypothesis tier: ANY random history and ANY split point — the
    two-batch incremental result equals one-shot derivation. (Unique
    eff_ts per event: simultaneous changes to one key have no defined
    order in either derivation.)"""
    rows = [(k, s, c, dt.datetime(2026, 1, 1) + dt.timedelta(hours=h))
            for k, s, c, h in events]
    rows.sort(key=lambda r: r[3])
    cut = min(cut, len(rows))
    schema = f"{KEY} long, segment string, city string, eff_ts timestamp"
    b1 = spark.createDataFrame(rows[:cut], schema)
    dim = scd2_init(b1, KEY, ATTRS).localCheckpoint(eager=True)
    if rows[cut:]:
        b2 = spark.createDataFrame(rows[cut:], schema)
        dim = scd2_apply(dim, b2, KEY, ATTRS)
    assert _as_set(dim) == _as_set(_oracle(spark, rows))
