"""Round-10 hardening tests (round-9 ADVICE items).

1. ``_shared_persist`` LogicalRDD-leaf guard — the bench loop deep-frees
   every result's LogicalRDD leaves between reps
   (``free_local_checkpoint(df, deep=True)``, bench.py). That is safe
   ONLY while the shared memo relations bottom out in parquet scans; a
   memo built on a ``localCheckpoint`` would have its blocks freed while
   the memo still hands out the handle, and the truncated lineage could
   never recompute them. The guard makes that contract loud at build
   time (ADVICE low, bench.py:97).

2. ``tools/rocksdb_probe.py`` summary ratio floors its denominator so a
   sub-10ms hdfs pass (rounds to 0.0) cannot ZeroDivisionError away the
   summary (ADVICE low, rocksdb_probe.py:79).

The medium ADVICE item (interrupted merge-swap recovery) is pinned in
``tests/test_models.py::test_interrupted_swap_recovers_old_table``.
"""
import pytest

from data_engineering_projects_spark.contract.extensions import (
    _shared_persist, clear_shared_persisted)
from data_engineering_projects_spark.plans.models import ModelGraph


def test_shared_persist_accepts_scan_rooted_plan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(10).write.parquet(p)
    df = _shared_persist(spark, str(tmp_path), "ok_tag",
                         lambda: spark.read.parquet(p))
    assert df.count() == 10
    # memo returns the SAME handle on the second call
    again = _shared_persist(spark, str(tmp_path), "ok_tag",
                            lambda: spark.read.parquet(p))
    assert again is df
    clear_shared_persisted()


def test_shared_persist_rejects_localcheckpoint_root(spark, tmp_path):
    """A localCheckpoint-rooted build must trip the guard: its plan is a
    LogicalRDD leaf whose blocks the bench deep-free would release out
    from under the memo."""
    def build():
        return spark.range(5).localCheckpoint(eager=True)
    with pytest.raises(AssertionError, match="LogicalRDD"):
        _shared_persist(spark, str(tmp_path), "bad_tag", build)
    clear_shared_persisted()


def test_lsh_bucket_cap_bounds_mega_cluster(spark):
    """Round-10 scale hardening: a mega-dup cluster (every doc with the
    SAME shingle set collides in ALL bands) must not emit quadratic
    candidate pairs once its buckets exceed the cap — AQE can rebalance
    the shuffle but cannot shrink output cardinality, so the bound has
    to be structural. Planted: 40 identical docs (one bucket of 40 per
    band) + 3 pairwise-overlapping distinct docs below the cap."""
    from data_engineering_projects_spark.contract.extensions import (
        _mh_candidates, _LSH_BUCKET_CAP)

    mega = [(i, list(range(100, 130))) for i in range(40)]
    normal = [(1000, [1, 2, 3, 4]), (1001, [1, 2, 3, 5]), (1002, [9, 10, 11])]
    sets = spark.createDataFrame(mega + normal,
                                 "doc_id long, shs array<long>")

    capped = _mh_candidates(sets, bucket_cap=10).collect()
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    # the 40-doc mega-cluster (780 pairs x 8 bands) is fully excluded...
    assert all(a >= 1000 and b >= 1000 for a, b in capped_pairs)
    # ...while sub-cap buckets still pair: 1000/1001 share minima in
    # most bands (3 of 4 shingles common)
    assert (1000, 1001) in capped_pairs

    # the default cap is a no-op at this scale: mega pairs all present
    full = _mh_candidates(sets, bucket_cap=_LSH_BUCKET_CAP)
    n_mega = full.filter("doc_a < 1000").count()
    assert n_mega == 40 * 39 // 2  # every identical pair, all bands


def test_lsh_bucket_cap_noop_on_fixtures(spark):
    """The shipped cap must not change any fixture result: capped and
    uncapped candidate sets are identical at sf0.001 (max fixture bucket
    is far below _LSH_BUCKET_CAP — measured 6 at sf0.01, 20 at sf0.1)."""
    from data_engineering_projects_spark.contract.extensions import (
        _mh_candidates, _shared_shingle_sets)

    sets = _shared_shingle_sets(spark, "/root/testdata/sf0.001")
    capped = _mh_candidates(sets)
    uncapped = _mh_candidates(sets, bucket_cap=1 << 40)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0
    assert capped.count() > 0

    # round 11: bucket_cap=None is the TRUE pre-cap plan (no hot-list
    # stage at all, for stress/measurement tooling) — same rows, and
    # the anti-join must be structurally absent, not just empty
    off = _mh_candidates(sets, bucket_cap=None)
    assert off.exceptAll(capped).count() == 0
    assert capped.exceptAll(off).count() == 0
    plan_off = off._jdf.queryExecution().executedPlan().toString()
    plan_cap = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan_off
    assert "LeftAnti" in plan_cap


def test_levenshtein_block_cap_noop_on_fixture(spark):
    """The Levenshtein blocking-key cap (_LEV_BLOCK_CAP) must be a no-op
    at fixture scale (max block 4 at sf0.01): the capped query's pairs at
    sf0.001 match a cap-free rebuild of the same blocking join."""
    from pyspark.sql import functions as F
    from data_engineering_projects_spark.contract.extensions import (
        docs_levenshtein_near)
    from data_engineering_projects_spark.sources import load_table, widen

    sf = "/root/testdata/sf0.001"
    got = docs_levenshtein_near(spark, sf)
    d = (widen(load_table(spark, sf, "documents"))
         .filter(F.col("text").rlike("^[\\t\\n\\r -~]*$"))
         .select("doc_id", "text", F.expr("n_chars DIV 16").alias("band"),
                 F.split_part(F.col("text"), F.lit(" "), F.lit(1))
                 .alias("w1")))
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("t_a"),
                 "band", "w1")
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("t_b"),
                 F.col("band").alias("band_b"), F.col("w1").alias("w1_b"))
    want = (a.join(b, (F.col("band") == F.col("band_b"))
                   & (F.col("w1") == F.col("w1_b"))
                   & (F.col("doc_a") < F.col("doc_b")))
            .withColumn("edit_dist", F.levenshtein("t_a", "t_b").cast("bigint"))
            .filter(F.col("edit_dist") <= 20)
            .select("doc_a", "doc_b", "edit_dist"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_levenshtein_block_cap_excludes_mega_block(spark, tmp_path,
                                                   monkeypatch):
    """Drive the SHIPPED query over a planted fixture: a mega-block
    (identical docs — same length band, same first word) above the cap
    emits ZERO pairs, while a distinct sub-cap near-dup pair survives."""
    from pyspark.sql import functions as F
    from data_engineering_projects_spark.contract import extensions as X

    rows = ([(i, "the same boilerplate text") for i in range(30)]
            + [(100, "alpha beta gamma"), (101, "alpha beta gamme")])
    docs = (spark.createDataFrame(rows, "doc_id long, text string")
            .withColumn("n_chars", F.length("text").cast("int")))
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(X, "_LEV_BLOCK_CAP", 10)
    got = {(r["doc_a"], r["doc_b"])
           for r in X.docs_levenshtein_near(spark, str(tmp_path)).collect()}
    assert got == {(100, 101)}  # mega-block gone, near-dup pair intact


from hypothesis import given, settings, strategies as st

# small shingle universes force band collisions (distinct docs DO share
# minima), exercising both capped and surviving buckets
_SHS = st.lists(st.integers(min_value=1, max_value=12),
                min_size=1, max_size=6, unique=True)


@settings(max_examples=12, deadline=None)
@given(st.lists(_SHS, min_size=2, max_size=14), st.integers(2, 6))
def test_lsh_cap_containment_properties(spark, sets_data, cap):
    """Two invariants of the bucket cap on ARBITRARY shingle sets:
    (1) capped candidate pairs are a SUBSET of uncapped pairs, with
        per-pair n_shared_bands <= the uncapped count (bands only ever
        drop out, never appear); and
    (2) with a cap no bucket exceeds, the two are IDENTICAL."""
    from data_engineering_projects_spark.contract.extensions import (
        _mh_candidates)

    sets = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sets_data)],
        "doc_id long, shs array<long>")
    capped = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"]
              for r in _mh_candidates(sets, bucket_cap=cap).collect()}
    uncapped = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"]
                for r in _mh_candidates(sets, bucket_cap=1 << 40).collect()}
    assert set(capped) <= set(uncapped)
    assert all(capped[k] <= uncapped[k] for k in capped)
    big = _mh_candidates(sets, bucket_cap=len(sets_data))
    assert {(r["doc_a"], r["doc_b"]): r["n_shared_bands"]
            for r in big.collect()} == uncapped


def test_null_and_empty_text_through_dedup_path(spark):
    """Real corpora carry NULL and empty documents; pin that the text
    stack degrades cleanly instead of crashing or pairing garbage:
    null text -> null fingerprint / empty shingles; empty or
    whitespace-only text -> the md5('') fingerprint (all empty docs
    collapse into ONE exact-dup group — exactly where the cap's recall
    contract says mass-identical docs belong); both are structurally
    excluded from LSH candidate generation (size(shs) > 0 gate)."""
    from pyspark.sql import functions as F
    from data_engineering_projects_spark.functions.text import (
        fingerprint, shingles_from_tokens, tokens)
    from data_engineering_projects_spark.contract.extensions import (
        _mh_candidates)

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two three four"),
         (5, "one two three four")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", fingerprint(F.col("text")).alias("fp"),
        shingles_from_tokens(tokens(F.col("text"))).alias("shs")).collect()}
    assert rows[1]["fp"] is None and rows[1]["shs"] == []
    assert rows[2]["fp"] == rows[3]["fp"] is not None  # md5('') group
    assert rows[2]["shs"] == []
    sets = df.select("doc_id", F.transform(
        F.array_distinct(shingles_from_tokens(tokens(F.col("text")))),
        lambda s: F.xxhash64(s)).alias("shs"))
    cands = {(r["doc_a"], r["doc_b"])
             for r in _mh_candidates(sets).collect()}
    assert cands == {(4, 5)}  # null/empty never pair; real dups do


def test_incremental_append_replay_is_noop(spark, tmp_path):
    """The append strategy's anti-join on unique_key makes replaying the
    SAME batch a no-op — the append-mode counterpart of the pinned merge
    replay idempotence (foreachBatch exactly-once rests on both)."""
    feed = {"rows": [(1, "a"), (2, "b")]}
    g = ModelGraph(warehouse_dir=str(tmp_path))

    @g.model(materialization="incremental", unique_key=["id"],
             incremental_strategy="append")
    def ap_events(spark, vars):
        return spark.createDataFrame(feed["rows"], "id long, v string")

    g.run(spark)
    feed["rows"] = [(2, "b-changed"), (3, "c")]
    g.run(spark)
    once = sorted(tuple(r) for r in
                  spark.read.parquet(str(tmp_path / "ap_events")).collect())
    g.run(spark)  # replay the same batch
    twice = sorted(tuple(r) for r in
                   spark.read.parquet(str(tmp_path / "ap_events")).collect())
    # append keeps the FIRST version of a key (2,"b") — dbt append
    # semantics: existing keys are never rewritten
    assert once == twice == [(1, "a"), (2, "b"), (3, "c")]


def test_rocksdb_probe_ratio_floors_denominator():
    """Mirror of the probe's summary arithmetic: a 0.0-rounded hdfs
    sample must yield a finite ratio, not ZeroDivisionError."""
    hdfs_sec, rocksdb_sec = 0.0, 0.42
    ratio = round(rocksdb_sec / max(hdfs_sec, 0.01), 2)
    assert ratio == 42.0
