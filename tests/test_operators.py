"""Operator-level semantics tests (SURVEY.md §7.4 traps), including the
tie-semantics split and pivot-vs-iterated-join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_projects_spark.operators import (
    topk_limit, topk_rank, pivot_agg, lag_diff, pct_change, union_by_name,
)


@pytest.fixture(scope="module")
def tied(spark):
    # three rows tied at 9.0 around the k=2 cut
    rows = [("a", 9.0), ("b", 9.0), ("c", 9.0), ("d", 5.0)]
    return spark.createDataFrame(rows, "k string, v double")


def test_topk_tie_semantics(tied):
    """head(k) cuts at exactly k; RANK+QUALIFY keeps all ties (§7.4 #4)."""
    limit = topk_limit(tied, 2, F.desc("v"), F.col("k")).collect()
    assert [r["k"] for r in limit] == ["a", "b"]
    rank = topk_rank(tied, 2, [F.desc("v")]).collect()
    assert {r["k"] for r in rank} == {"a", "b", "c"}  # ties included
    assert all(r["rnk"] == 1 for r in rank)


def test_pivot_equals_iterated_join(spark):
    """J2: groupBy().pivot() reproduces the reference's per-period merge
    loop + fillna(0) (4_Snowflake/READ.md:87-91) with one shuffle."""
    rows = [("t1", "amp", 1.5), ("t1", "mid", 1.2), ("t2", "we", 2.0)]
    df = spark.createDataFrame(rows, "tmc string, period string, lottr double")
    piv = pivot_agg(df, ["tmc"], "period", ["amp", "mid", "pmp", "we"],
                    F.first("lottr"))
    # the literal merge-loop fold
    base = df.select("tmc").distinct()
    for p in ["amp", "mid", "pmp", "we"]:
        side = (df.filter(F.col("period") == p)
                  .select("tmc", F.col("lottr").alias(p)))
        base = base.join(side, "tmc", "left")
    fold = base.na.fill(0.0)
    assert sorted(map(tuple, piv.collect())) == sorted(map(tuple, fold.collect()))


def test_lag_diff_and_pct_change(spark):
    rows = [("t", 1, 10.0), ("t", 2, 15.0), ("t", 3, 12.0)]
    df = spark.createDataFrame(rows, "k string, yr int, v double")
    d = {r["yr"]: r["change"]
         for r in lag_diff(df, "v", "yr", ["k"]).collect()}
    assert d == {1: 0.0, 2: 5.0, 3: -3.0}
    p = {r["yr"]: r["pct_change"]
         for r in pct_change(df, "v", "yr", ["k"]).collect()}
    assert p[1] == 0.0 and p[2] == pytest.approx(0.5) and p[3] == pytest.approx(-0.2)


def test_pct_change_zero_prev_is_filled(spark):
    """ANSI-safe: a zero previous value yields the fill, not an error."""
    df = spark.createDataFrame([("t", 1, 0.0), ("t", 2, 5.0)],
                               "k string, yr int, v double")
    p = {r["yr"]: r["pct_change"] for r in pct_change(df, "v", "yr", ["k"]).collect()}
    assert p[2] == 0.0


def test_union_by_name_aligns_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, s string")
    b = spark.createDataFrame([("y", 2)], "s string, id long")
    u = union_by_name(a, b).collect()
    assert {(r["id"], r["s"]) for r in u} == {(1, "x"), (2, "y")}


def test_propagate_min_labels_transitive(spark):
    """A~B, B~C must land in one cluster under A's id even though (A,C) was
    never a candidate pair; disconnected components stay separate."""
    from data_engineering_projects_spark.operators.clustering import (
        propagate_min_labels)
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (20, 21)], "doc_a bigint, doc_b bigint")
    got = {(r.id, r.label) for r in propagate_min_labels(pairs).collect()}
    assert got == {(2, 2), (5, 2), (9, 2), (20, 20), (21, 20)}


def test_propagate_min_labels_chain_within_bound(spark):
    """A chain of length <= iters fully converges to the global minimum."""
    from data_engineering_projects_spark.operators.clustering import (
        propagate_min_labels)
    chain = [(i, i + 1) for i in range(1, 8)]  # 1-2-...-8, diameter 7 < 8
    pairs = spark.createDataFrame(chain, "doc_a bigint, doc_b bigint")
    labels = propagate_min_labels(pairs).collect()
    assert {r.label for r in labels} == {1}
    assert len(labels) == 8


def test_propagate_min_labels_bounded_hop_bypass_parity(spark):
    """The driver bypass must reproduce the BOUNDED-hop semantics, not
    full CC: on a 21-node chain with iters=4, both paths must agree
    exactly AND differ from the component minimum (node 20 can only see
    4 hops up, so its label is 16, not 0) — the registry oracle replays
    exactly k joins, so a bypass that silently computed full CC would
    hash-diverge on adversarial graphs."""
    from data_engineering_projects_spark.operators.clustering import (
        propagate_min_labels)
    chain = [(i, i + 1) for i in range(20)]
    pairs = spark.createDataFrame(chain, "doc_a bigint, doc_b bigint")
    local = {(r.id, r.label)
             for r in propagate_min_labels(pairs, iters=4).collect()}
    dist = {(r.id, r.label)
            for r in propagate_min_labels(
                pairs, iters=4, local_finish_edges=0).collect()}
    assert local == dist
    assert (20, 16) in local and (4, 0) in local and (5, 1) in local


def test_propagate_min_labels_empty(spark):
    from data_engineering_projects_spark.operators.clustering import (
        propagate_min_labels)
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert propagate_min_labels(pairs).count() == 0


def test_asof_join_backward_semantics(spark):
    """Inclusive at-or-before match, NULLs when no earlier right row,
    latest-wins among multiple candidates."""
    from data_engineering_projects_spark.operators.asof import (
        asof_join_backward)
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 50, "e3")],
        "k long, t long, ev string")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 60, 600.0)],
        "k long, t long, px double")
    got = {r.ev: r.px for r in asof_join_backward(
        left, right.withColumnRenamed("t", "rt"), "k", "t", "rt",
        ["px"]).collect()}
    assert got == {"e0": None,     # no right row at or before t=5
                   "e1": 100.0,    # inclusive: rt=10 matches t=10
                   "e2": 150.0,    # latest of {10, 15}
                   "e3": None}     # rt=60 is after t=50


def test_asof_join_backward_rejects_column_clash(spark):
    """value_cols colliding with left columns would silently corrupt the
    carry-forward window (left values surface as 'matched' right values);
    the operator must refuse, as must reserved scratch names."""
    import pytest
    from data_engineering_projects_spark.operators.asof import (
        asof_join_backward)
    left = spark.createDataFrame([(1, 10, 1.0)], "k long, t long, px double")
    right = spark.createDataFrame([(1, 5, 2.0)], "k long, rt long, px double")
    with pytest.raises(ValueError, match="value_cols.*px"):
        asof_join_backward(left, right, "k", "t", "rt", ["px"])
    l2 = left.withColumnRenamed("px", "__side")
    with pytest.raises(ValueError, match="reserved"):
        asof_join_backward(l2, right.withColumnRenamed("px", "v"),
                           "k", "t", "rt", ["v"])


def test_interval_join_bucket_boundaries(spark):
    """Points exactly on interval endpoints match (inclusive); intervals
    spanning multiple buckets still match each point exactly once."""
    import datetime as dt
    from data_engineering_projects_spark.operators.rangejoin import (
        interval_join)
    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    pts = spark.createDataFrame(
        [(1, t(0)), (1, t(7200)), (1, t(7201)), (2, t(100))],
        "k long, pt timestamp")
    ivs = spark.createDataFrame(
        [(1, t(0), t(7200), "iv1")],  # spans two 3600s buckets
        "k long, lo timestamp, hi timestamp, iv string")
    got = interval_join(pts, ivs, "pt", "lo", "hi", keys=["k"],
                        bucket_seconds=3600).collect()
    matched = sorted((r.pt - dt.datetime(2024, 1, 1)).total_seconds()
                     for r in got)
    assert matched == [0.0, 7200.0]   # inclusive ends; 7201 out; k=2 out
    assert len(got) == len(set((r.k, r.pt) for r in got))  # no duplicates


def test_max_concurrency_rejects_day_plus_durations(spark):
    """Durations >= 24h span multiple midnights, which the single-day
    carry-in cannot represent — the operator must refuse loudly instead
    of silently dropping the middle days (round-6 review finding)."""
    import pytest

    from data_engineering_projects_spark.operators.intervals import (
        max_concurrency_by_day)

    df = spark.createDataFrame([(1, "2024-01-01 10:00:00")],
                               "event_id bigint, ts string") \
        .select("event_id", F.to_timestamp("ts").alias("ts"))
    with pytest.raises(ValueError, match="midnight"):
        max_concurrency_by_day(df, duration="INTERVAL 2 DAY")
    with pytest.raises(ValueError, match="24h"):
        max_concurrency_by_day(df, duration="INTERVAL 25 HOUR")
    # sub-day durations still build a plan
    out = max_concurrency_by_day(df, duration="INTERVAL 23 HOUR")
    assert out.columns == ["day", "max_concurrent"]


# ---------------------------------------------------------------------------
# localCheckpoint hygiene (round 9): superseded iteration checkpoints must be
# freed from the block manager, not left to JVM GC (at 100 TB an N-round CC
# loop would otherwise hold N x the edge list in executor storage).

def _stored_rdd_ids(spark) -> set[int]:
    return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}


def test_free_local_checkpoint_root_deep_and_refusal(spark):
    from data_engineering_projects_spark.session import free_local_checkpoint

    base = _stored_rdd_ids(spark)
    ck = spark.range(1000).localCheckpoint()
    derived = ck.selectExpr("id * 2 AS x")
    # refuses a derived frame: the checkpoint below a projection might be
    # shared, so non-deep must not touch it
    assert free_local_checkpoint(derived) is False
    assert len(_stored_rdd_ids(spark) - base) == 1
    # deep mode walks plan leaves — for a tree the caller is discarding
    assert free_local_checkpoint(derived, deep=True) is True
    assert _stored_rdd_ids(spark) - base == set()
    # root frame frees directly
    ck2 = spark.range(10).localCheckpoint()
    assert free_local_checkpoint(ck2) is True
    assert _stored_rdd_ids(spark) - base == set()
    # non-checkpointed frame: harmless no-op
    assert free_local_checkpoint(spark.range(5)) is False
    # lazy checkpoint, NOT yet materialized: refused (unpersisting the
    # mark before first computation would lose data the truncated
    # lineage can't rebuild) — and still computable afterwards
    lazy = spark.range(100).localCheckpoint(eager=False)
    assert free_local_checkpoint(lazy) is False
    assert lazy.count() == 100
    free_local_checkpoint(lazy)  # materialized now: freeable
    # generic RDD-backed frame (createDataFrame from an RDD): also a
    # LogicalRDD root, but NOT a checkpoint — the helper must not
    # unpersist a caller-owned, possibly shared source RDD
    rdd = spark.sparkContext.parallelize([(1,), (2,)]).persist()
    from_rdd = spark.createDataFrame(rdd, "id long")
    assert from_rdd.count() == 2  # materialize the persist
    assert free_local_checkpoint(from_rdd) is False
    assert free_local_checkpoint(from_rdd.selectExpr("id"),
                                 deep=True) is False
    assert rdd.getStorageLevel().useMemory  # still persisted
    rdd.unpersist()


def test_cc_loops_bound_block_manager_storage(spark):
    """Both CC variants run multiple checkpointed rounds; afterwards at
    most the FINAL round's checkpoint may remain stored — superseded
    rounds and the loop-invariant edge checkpoint must be gone, while
    the returned labels stay correct (i.e. nothing still-needed was
    freed)."""
    from data_engineering_projects_spark.operators.clustering import (
        connected_components_star, propagate_min_labels)
    from data_engineering_projects_spark.session import free_local_checkpoint

    chain = [(i, i + 1) for i in range(1, 8)]  # forces several rounds
    pairs = spark.createDataFrame(chain, "doc_a bigint, doc_b bigint")

    base = _stored_rdd_ids(spark)
    labels = propagate_min_labels(pairs)
    assert len(_stored_rdd_ids(spark) - base) <= 1  # final round only
    rows = labels.collect()  # result survives the freeing
    assert {r.label for r in rows} == {1} and len(rows) == 8
    free_local_checkpoint(labels, deep=True)

    base = _stored_rdd_ids(spark)
    labels2 = connected_components_star(pairs)
    assert len(_stored_rdd_ids(spark) - base) <= 1
    rows2 = labels2.collect()
    assert {r.label for r in rows2} == {1} and len(rows2) == 8
    free_local_checkpoint(labels2, deep=True)


def test_cc_star_local_finish_cutover_and_parity(spark):
    """The bounded driver finish must (a) cut over MID-loop once
    contraction shrinks the canonical edge list under the cap — a
    10-edge cap forces one distributed round on a 29-edge input before
    the 8-edge contracted graph finishes locally; (b) return the exact
    same (id, label) rows and column dtypes as the fully-distributed
    loop; (c) leave no checkpoint blocks stored (the cutover frees the
    edge checkpoint it collected from)."""
    import itertools
    from data_engineering_projects_spark.operators.clustering import (
        connected_components_star)

    clique = [(a, b) for a, b in itertools.combinations(range(8), 2)]
    pairs = spark.createDataFrame(clique + [(100, 101)],
                                  "doc_a bigint, doc_b bigint")

    base = _stored_rdd_ids(spark)
    stats: dict = {}
    local = connected_components_star(pairs, stats=stats,
                                      local_finish_edges=10)
    rows_local = sorted((r.id, r.label) for r in local.collect())
    assert stats == {"rounds": 1, "local_finish": True}
    assert _stored_rdd_ids(spark) - base == set()  # nothing left stored

    dist = connected_components_star(pairs, local_finish_edges=0)
    rows_dist = sorted((r.id, r.label) for r in dist.collect())
    assert rows_local == rows_dist
    assert ([(f.name, f.dataType) for f in local.schema.fields]
            == [(f.name, f.dataType) for f in dist.schema.fields])
    assert rows_local[-1] == (101, 100) and rows_local[0] == (0, 0)
