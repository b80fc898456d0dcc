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
