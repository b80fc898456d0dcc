"""Product quantization (operators/pq.py).

Tier split (module docstring): ADC-vs-reconstruction equality is an
EXACT contract (pinned to 1e-6 after the shared ROUND); recall against
brute force is a bound contract (quantization loses information by
design — the fixture embeddings are random, PQ's worst case, so the
floor is deliberately below the measured 0.82)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_projects_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_reconstruct,
    pq_search_rerank,
    pq_train,
)

M, K, ITERS = 16, 32, 3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    df.persist(); df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def trained(emb):
    cb = pq_train(emb, m=M, k=K, n_iters=ITERS)
    cb.persist(); cb.count()
    codes = pq_encode(emb, cb, m=M)
    codes.persist(); codes.count()
    yield cb, codes
    cb.unpersist(); codes.unpersist()


def _l2(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def _brute_top10(emb, queries):
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").cast("array<double>").alias("q"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").cast("array<double>").alias("c"))
    d = (q.crossJoin(c).filter("query_id != neighbor_id")
         .select("query_id", "neighbor_id", _l2("q", "c").alias("d")))
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(),
                                               "neighbor_id")
    return d.withColumn("r", F.row_number().over(w)).filter("r <= 10")


def test_codebook_and_codes_shape(trained, emb):
    cb, codes = trained
    assert cb.count() == M * K
    assert cb.select("sub").distinct().count() == M
    first = codes.first()
    assert len(first["codes"]) == M
    rng = codes.select(F.explode("codes").alias("c")).agg(
        F.min("c").alias("mn"), F.max("c").alias("mx")).first()
    assert rng["mn"] >= 0 and rng["mx"] < K
    assert codes.count() == emb.count()


def test_adc_equals_reconstructed_distance(spark, emb, trained):
    """The ADC exactness contract: the table-lookup distance must equal
    the direct squared L2 between the query and the RECONSTRUCTED
    (quantized) neighbor — table build and lookup introduce no error
    beyond float association."""
    cb, codes = trained
    queries = emb.filter("vec_id < 5")
    top = pq_adc_topk(queries, codes, cb, k=10, m=M)
    rec = pq_reconstruct(codes, cb).withColumnRenamed("vec_id",
                                                      "neighbor_id")
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").cast("array<double>").alias("q"))
    chk = (top.join(rec, "neighbor_id").join(q, "query_id")
           .select("adc_dist", F.round(_l2("q", "vec"), 6).alias("direct")))
    bad = chk.filter(
        F.abs(F.col("adc_dist") - F.col("direct")) > 1e-6).count()
    assert bad == 0
    assert top.groupBy("query_id").count().agg(
        F.min("count")).first()[0] >= 10


def test_rerank_recall_and_exact_distances(spark, emb, trained):
    """Two-stage search: shortlist recall of the true top-10 ≥ 0.7 on
    PQ's worst-case (random) embeddings at m=16/k=32/overfetch=5, and
    every returned distance equals the true squared L2 (the rerank is
    exact on the shortlist)."""
    cb, codes = trained
    queries = emb.filter("vec_id < 5")
    got = pq_search_rerank(queries, codes, cb, emb, k=10, overfetch=5,
                           m=M)
    truth = _brute_top10(emb, queries)
    tset = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    gset = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    recall = len(tset & gset) / len(tset)
    assert recall >= 0.7, recall
    # distances exact: compare against the brute-force distance per pair
    tr = truth.select("query_id", "neighbor_id",
                      F.round("d", 6).alias("true_d"))
    joined = got.join(tr, ["query_id", "neighbor_id"])
    bad = joined.filter(
        F.abs(F.col("dist") - F.col("true_d")) > 1e-6).count()
    assert bad == 0


def test_compression_ratio_and_pure_catalyst(emb, trained):
    """Scale contract: the encoded relation carries m ints (bytes at
    k≤256 in storage) instead of 64 floats, and the whole train/encode/
    search path is JVM-only (no Python eval nodes)."""
    cb, codes = trained
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert dict(codes.dtypes)["codes"] == "array<int>"
    top = pq_adc_topk(emb.filter("vec_id < 2"), codes, cb, k=5, m=M)
    plan2 = top._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEval" not in plan2


def test_ivf_pq_full_probe_equals_plain_pq(spark, emb, trained):
    """Degradation contract: probing EVERY cell makes IVF-PQ return the
    same result set as plain two-stage PQ search (the cell restriction
    is the only approximation IVF adds)."""
    from data_engineering_projects_spark.operators.pq import ivf_pq_search
    from data_engineering_projects_spark.operators.similarity import (
        ivf_assign, ivf_train)

    cb, codes = trained
    n_cells = 4
    cents = ivf_train(emb, n_cells=n_cells, n_iters=2)
    assigned = ivf_assign(emb, cents).select("vec_id", "cell") \
        .join(codes, "vec_id")
    queries = emb.filter("vec_id < 5")
    full = ivf_pq_search(queries, assigned, cents, cb, emb, k=10,
                         nprobe=n_cells, overfetch=5, m=M)
    plain = pq_search_rerank(queries, codes, cb, emb, k=10, overfetch=5,
                             m=M)
    a = {(r["query_id"], r["neighbor_id"], r["dist"])
         for r in full.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["dist"])
         for r in plain.collect()}
    assert a == b


def test_ivf_pq_partial_probe_recall_floor(spark, emb, trained):
    """nprobe=2 of 4 cells on worst-case random embeddings must still
    find at least half of the true top-10 (cell restriction + coarse
    codes compound; the floor is a regression bound, measured above
    it)."""
    from data_engineering_projects_spark.operators.pq import ivf_pq_search
    from data_engineering_projects_spark.operators.similarity import (
        ivf_assign, ivf_train)

    cb, codes = trained
    cents = ivf_train(emb, n_cells=4, n_iters=2)
    assigned = ivf_assign(emb, cents).select("vec_id", "cell") \
        .join(codes, "vec_id")
    queries = emb.filter("vec_id < 5")
    got = ivf_pq_search(queries, assigned, cents, cb, emb, k=10,
                        nprobe=2, overfetch=5, m=M)
    truth = _brute_top10(emb, queries)
    tset = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    gset = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    assert len(tset & gset) / len(tset) >= 0.5


def test_dropped_cluster_codes_stay_dense_and_adc_non_null(spark):
    """Review-found bug class: duplicate init subvectors make a code
    lose every assignment round (empty cluster), dropping it from the
    recomputed codebook — code VALUES must be re-densified or the
    positional ADC lookup reads the wrong cell / NULL (and NULLs would
    poison the top-k)."""
    import random
    rng = random.Random(5)
    # ids 0..7 all identical => k=4 init has 3 duplicate centroids
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(8)]
    rows += [(i, [rng.uniform(-5, 5) for _ in range(4)])
             for i in range(8, 64)]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(emb2, m=2, k=4, n_iters=2)
    per_sub = cb.groupBy("sub").agg(
        F.count("*").alias("n"), F.max("code").alias("mx"),
        F.min("code").alias("mn")).collect()
    for r in per_sub:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1, r  # dense
    codes = pq_encode(emb2, cb, m=2)
    top = pq_adc_topk(emb2.filter("vec_id < 3"), codes, cb, k=5, m=2)
    assert top.filter("adc_dist IS NULL").count() == 0
    assert top.groupBy("query_id").count().agg(
        F.min("count")).first()[0] >= 5


def test_non_divisible_dim_fails_loudly(spark):
    """Review-found: pq_encode / ADC entry points silently dropped the
    trailing dim % m dimensions; the divisibility assert now lives in
    the one shared _subvectors entry point."""
    emb5 = spark.createDataFrame(
        [(i, [float(j) for j in range(5)]) for i in range(8)],
        "vec_id long, embedding array<double>")
    with pytest.raises(AssertionError):
        pq_train(emb5, m=2, k=2, n_iters=1)
    cb = pq_train(emb5.select(
        "vec_id", F.slice("embedding", 1, 4).alias("embedding")),
        m=2, k=2, n_iters=1)
    with pytest.raises(AssertionError):
        pq_encode(emb5, cb, m=2)  # infers dim=5 from the data
    with pytest.raises(AssertionError):
        pq_encode(emb5, cb, m=2, dim=5)  # explicit dim must also fail


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from([2, 4]))
def test_property_ivfpq_default_operating_point_recall_floor(
        spark, seed, n_cells):
    """Property tier for the DEFAULT operating point recorded in
    SCALING.md's round-11 grid (nprobe = half the cells, overfetch=5):
    on ANY random corpus — PQ's worst case — recall@5 of the composed
    IVF-PQ search must clear a defensive floor. The grid shows ~0.63-
    0.69 at fixture scale; the floor is 0.3 so only a real regression
    (wrong cell restricted, shortlist mis-ranked, codes misaligned)
    trips it, not quantization noise."""
    import random

    from data_engineering_projects_spark.operators.pq import (
        ivf_pq_search, pq_encode, pq_train)
    from data_engineering_projects_spark.operators.similarity import (
        ivf_assign, ivf_train)

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < 3)

    cb = pq_train(corpus, m=4, k=8, n_iters=2)
    codes = pq_encode(corpus, cb, m=4)
    cents = ivf_train(corpus, n_cells=n_cells, n_iters=2)
    assigned = ivf_assign(corpus, cents).select("vec_id", "cell") \
        .join(codes, "vec_id")
    got = ivf_pq_search(queries, assigned, cents, cb, corpus, k=5,
                        nprobe=max(1, n_cells // 2), overfetch=5, m=4)
    truth = _brute_top10(corpus, queries).filter("r <= 5")
    tset = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    gset = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    assert len(tset & gset) / max(len(tset), 1) >= 0.3, (seed, n_cells)
