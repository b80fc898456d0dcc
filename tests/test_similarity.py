"""operators.similarity: the two brute-force strategies must agree exactly;
IVF must assign every vector, and its search must return only neighbors
from the cell the query probes."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_projects_spark.functions.vectors import cosine_similarity
from data_engineering_projects_spark.operators.similarity import (
    cosine_topk_blas, cosine_topk_hof, ivf_assign, ivf_search, ivf_train,
)
from data_engineering_projects_spark.sources import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_blas_matches_hof(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    assert _rows(cosine_topk_blas(q, e, k=4)) == _rows(cosine_topk_hof(q, e, k=4))


def test_ivf_assign_total_and_valid(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train(e, n_cells=4, n_iters=1)
    assert cents.count() == 4
    assigned = ivf_assign(e, cents)
    assert assigned.count() == e.count()  # every vector lands in a cell
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {0, 1, 2, 3}


def test_ivf_search_respects_probed_cell(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train(e, n_cells=4, n_iters=1)
    assigned = ivf_assign(e, cents).cache()
    q = e.filter(F.col("vec_id") < 5)
    res = ivf_search(q, assigned, cents, k=3, nprobe=1)

    # recompute each query's nearest cell independently
    sim = cosine_similarity(F.col("embedding"), F.col("centroid"))
    w = Window.partitionBy("vec_id").orderBy(F.desc(F.round(sim, 9)), "cell")
    probe = {r["vec_id"]: r["cell"] for r in
             (q.crossJoin(F.broadcast(cents))
               .withColumn("r", F.row_number().over(w)).filter("r = 1")
               .select("vec_id", "cell").collect())}
    cell_of = {r["vec_id"]: r["cell"] for r in
               assigned.select("vec_id", "cell").collect()}

    rows = res.collect()
    assert rows  # non-empty at every test SF
    for r in rows:
        assert cell_of[r["neighbor_id"]] == probe[r["query_id"]], r
        assert r["knn_rank"] <= 3


def test_ivf_index_health_counts_and_overfetch(spark):
    """ivf_index_health arithmetic on a crafted split: per-cell counts
    coalesce through the full outer join (a cell with no new members,
    a cell with no base members), share/density round to 6, and the
    suggested overfetch is clamp(ceil(2 * tn/tb), 2, 50) — the
    density-scaled operating rule from the r17 ANN decade."""
    from data_engineering_projects_spark.operators.similarity import (
        ivf_index_health)

    base = spark.createDataFrame(
        [(0,)] * 10 + [(1,)] * 30, "cell int")
    new = spark.createDataFrame(
        [(0,)] * 5 + [(2,)] * 15, "cell int")
    got = {r["cell"]: r for r in ivf_index_health(base, new).collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0]["n_base"], got[0]["n_new"], got[0]["n_now"]) == (10, 5, 15)
    assert (got[1]["n_base"], got[1]["n_new"], got[1]["n_now"]) == (30, 0, 30)
    assert (got[2]["n_base"], got[2]["n_new"], got[2]["n_now"]) == (0, 15, 15)
    assert got[0]["share_now"] == 15 / 60
    assert got[0]["density_ratio"] == 1.5
    assert got[2]["density_ratio"] is None  # no base members: NULL, not inf
    # tb=40, tn=60 -> ceil(2*60/40) = ceil(3.0) = 3
    assert all(r["suggested_overfetch"] == 3 for r in got.values())


def test_ivf_index_health_overfetch_clamps(spark):
    """Floor at base_overfetch when density has not grown; cap at
    overfetch_cap under extreme growth (the measured curve tops out at
    50 where recall read 0.91 at flat wall)."""
    from data_engineering_projects_spark.operators.similarity import (
        ivf_index_health)

    base = spark.createDataFrame([(0,)] * 20, "cell int")
    none_new = spark.createDataFrame([], "cell int")
    flat = ivf_index_health(base, none_new).collect()
    assert all(r["suggested_overfetch"] == 2 for r in flat)

    many = spark.createDataFrame([(0,)] * 2000, "cell int")
    grown = ivf_index_health(base, many).collect()
    assert all(r["suggested_overfetch"] == 50 for r in grown)
