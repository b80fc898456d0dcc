"""FK-consistent subsetting (operators/subset.py) on the real star
fixture — the nation diamond (referenced by customer AND supplier) is
the case naive per-edge closure orphans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_projects_spark.operators.subset import (
    FK,
    subset_star,
)

FKS = [
    FK("lineitem", "l_orderkey", "orders", "o_orderkey"),
    FK("lineitem", "l_partkey", "part", "p_partkey"),
    FK("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FK("orders", "o_custkey", "customer", "c_custkey"),
    FK("customer", "c_nationkey", "nation", "n_nationkey"),
    FK("supplier", "s_nationkey", "nation", "n_nationkey"),
    FK("nation", "n_regionkey", "region", "r_regionkey"),
]
NAMES = ["region", "nation", "customer", "supplier", "part", "orders",
         "lineitem"]


@pytest.fixture(scope="module")
def star(spark, sf_dir):
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
            for n in NAMES}


@pytest.fixture(scope="module")
def sub(star):
    return subset_star(star, "orders", "o_orderkey", FKS, fraction=0.1)


def test_no_orphans_on_any_fk(sub):
    """Every FK relationship holds in the subset — including both arms
    of the nation diamond."""
    for fk in FKS:
        orphans = (sub[fk.child]
                   .filter(F.col(fk.child_col).isNotNull())
                   .join(sub[fk.parent]
                         .select(F.col(fk.parent_col)
                                  .alias(fk.child_col)),
                         fk.child_col, "left_anti").count())
        assert orphans == 0, (fk, orphans)


def test_anchor_fraction_and_children_follow(star, sub):
    total = star["orders"].count()
    kept = sub["orders"].count()
    assert abs(kept / total - 0.1) < 0.03
    # lineitem restricted to exactly the kept orders' items
    expect = (star["lineitem"]
              .join(sub["orders"].select("o_orderkey")
                    .withColumnRenamed("o_orderkey", "l_orderkey"),
                    "l_orderkey", "left_semi").count())
    assert sub["lineitem"].count() == expect


def test_deterministic_and_parents_minimal(star, sub):
    again = subset_star(star, "orders", "o_orderkey", FKS, fraction=0.1)
    a = {r["o_orderkey"] for r in sub["orders"].select("o_orderkey")
         .collect()}
    b = {r["o_orderkey"] for r in again["orders"].select("o_orderkey")
         .collect()}
    assert a == b
    # customer keeps exactly the referenced keys, nothing more
    refd = sub["orders"].select("o_custkey").distinct().count()
    assert sub["customer"].count() == refd


def test_unreferenced_tables_pass_through(spark, star, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    tables = dict(star); tables["events"] = ev
    out = subset_star(tables, "orders", "o_orderkey", FKS, fraction=0.1)
    assert out["events"].count() == ev.count()


def test_cycle_raises(star):
    cyc = FKS + [FK("region", "r_regionkey", "customer", "c_custkey")]
    with pytest.raises(ValueError, match="cycle"):
        subset_star(star, "orders", "o_orderkey", cyc, fraction=0.1)


def test_anchor_above_diamond_no_orphans(star):
    """Review-found bug class: anchoring ABOVE a diamond (nation) makes
    lineitem a child of TWO restricted parents (orders via customer, and
    supplier) — both edges must restrict it, in topological order, or
    one parent's FK orphans."""
    sub = subset_star(star, "nation", "n_nationkey", FKS, fraction=0.4)
    for fk in FKS:
        orphans = (sub[fk.child]
                   .filter(F.col(fk.child_col).isNotNull())
                   .join(sub[fk.parent]
                         .select(F.col(fk.parent_col)
                                  .alias(fk.child_col)),
                         fk.child_col, "left_anti").count())
        assert orphans == 0, (fk, orphans)
    assert sub["lineitem"].count() > 0


def test_alternate_key_parent_columns(spark):
    """Review-found: two children referencing DIFFERENT parent columns
    (alternate keys) previously died in an opaque unionByName error.
    The fix keeps a parent row if ANY referenced column needs it
    (row-level OR) — intersection semantics would orphan the alt-key
    child (its needed rows dropped because their pk went unreferenced)."""
    dim = spark.createDataFrame(
        [(i, f"code_{i}") for i in range(10)], "pk int, alt string")
    c1 = spark.createDataFrame(
        [(i, i % 10) for i in range(40)], "id int, dim_pk int")
    # c2 references only alt codes 0..4
    c2 = spark.createDataFrame(
        [(i, f"code_{i % 5}") for i in range(40)], "id int, dim_alt string")
    fks = [FK("c1", "dim_pk", "dim", "pk"),
           FK("c2", "dim_alt", "dim", "alt")]
    sub = subset_star({"dim": dim, "c1": c1, "c2": c2}, "c1", "id",
                      fks, fraction=0.4)
    # both FK arms orphan-free
    for fk in fks:
        orphans = (sub[fk.child]
                   .join(sub[fk.parent]
                         .select(F.col(fk.parent_col)
                                  .alias(fk.child_col)),
                         fk.child_col, "left_anti").count())
        assert orphans == 0, (fk, orphans)
    # c2 is NOT downstream of the anchor: passes through unchanged
    assert sub["c2"].count() == 40
    kept_pks = {r["dim_pk"] for r in sub["c1"].select("dim_pk")
                .distinct().collect()}
    got_pks = {r["pk"] for r in sub["dim"].select("pk").collect()}
    assert got_pks == kept_pks | set(range(5))  # OR of both arms
    assert sub["dim"].count() == len(got_pks)  # no row multiplication


from hypothesis import assume, given, settings, strategies as st  # noqa: E402


@st.composite
def _fk_forest(draw):
    """Random tree of 3-5 tables with random REFERENCE orientations and
    random row counts; every FK value drawn from the parent's pk domain
    (input is orphan-free by construction)."""
    n = draw(st.integers(3, 5))
    # tree: table i>0 attaches to a random earlier table
    attach = [draw(st.integers(0, i - 1)) for i in range(1, n)]
    # orientation per edge: True = the LATER table references the earlier
    orient = [draw(st.booleans()) for _ in range(n - 1)]
    sizes = [draw(st.integers(2, 12)) for _ in range(n)]
    fks = []
    for i, (a, o) in enumerate(zip(attach, orient), start=1):
        child, parent = (i, a) if o else (a, i)
        fks.append((child, parent))
    # fk values: for each (child, parent), each child row references a
    # random parent row
    refs = {}
    for child, parent in fks:
        refs[(child, parent)] = [
            draw(st.integers(0, sizes[parent] - 1))
            for _ in range(sizes[child])]
    anchor = draw(st.integers(0, n - 1))
    frac = draw(st.sampled_from([0.3, 0.5, 0.8]))
    return n, sizes, fks, refs, anchor, frac


@settings(max_examples=10, deadline=None)
@given(_fk_forest())
def test_property_random_forest_no_orphans(spark, forest):
    n, sizes, fks, refs, anchor, frac = forest
    tables = {}
    for t in range(n):
        cols, data = ["pk"], [[i] for i in range(sizes[t])]
        for (child, parent) in fks:
            if child == t:
                cols.append(f"fk_{parent}")
                vals = refs[(child, parent)]
                for i in range(sizes[t]):
                    data[i].append(vals[i])
        tables[f"t{t}"] = spark.createDataFrame(
            [tuple(r) for r in data], ", ".join(f"{c} long" for c in cols))
    edges = [FK(f"t{c}", f"fk_{p}", f"t{p}", "pk") for c, p in fks]
    sub = subset_star(tables, f"t{anchor}", "pk", edges, fraction=frac,
                      seed=7)
    # non-vacuity: the hash filter must leave a live anchor and at least
    # one other restricted table, or every orphan check passes trivially
    # (hypothesis regenerates skipped examples)
    counts = {t: sub[t].count() for t in tables}
    assume(counts[f"t{anchor}"] > 0)
    assume(sum(1 for t, c in counts.items()
               if c > 0 and t != f"t{anchor}") >= 1)
    for fk in edges:
        orphans = (sub[fk.child]
                   .join(sub[fk.parent]
                         .select(F.col(fk.parent_col)
                                  .alias(fk.child_col)),
                         fk.child_col, "left_anti").count())
        assert orphans == 0, (fk, orphans)
