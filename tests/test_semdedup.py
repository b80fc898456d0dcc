"""operators.similarity.semdedup: SemDeDup-style semantic dedup must match
a brute-force pairwise-cosine + union-find + keeper-election oracle, group
transitive duplicates, elect exactly one keeper per group (max quality,
ties to min id), and degrade to keep-everything when the cell cap excludes
every cell from pairing.

Fixture cosines are kept > 1e-3 away from the threshold so fold-order ulp
drift between Spark's sequential HOF fold and numpy can never flip a pair.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StructField, StructType,
)

from data_engineering_projects_spark.operators.similarity import semdedup

_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(DoubleType())),
    StructField("quality", DoubleType()),
])

THRESHOLD = 0.95


def _unit(theta_deg: float) -> list[float]:
    t = math.radians(theta_deg)
    return [math.cos(t), math.sin(t), 0.0, 0.0]


def _fixture_rows():
    """Three semantic-dup groups + singletons.

    - group A (ids 1,2,3): within ~5 deg of each other, all pairwise
      cos > 0.99; id 2 has the highest quality -> keeper.
    - chain B (ids 20,21,22): 18 deg apart consecutively. cos(18deg)=0.951
      >= 0.95 but cos(36deg)=0.809 < 0.95 -> only transitivity links
      20 and 22 into one group.
    - singletons 30, 31: orthogonal axes, cosine 0 to everything else.
    """
    return [
        (1, _unit(0.0), 0.2),
        (2, _unit(3.0), 0.9),
        (3, _unit(5.0), 0.5),
        (20, _unit(60.0), 0.1),
        (21, _unit(78.0), 0.8),
        (22, _unit(96.0), 0.3),
        (30, [0.0, 0.0, 1.0, 0.0], 0.7),
        (31, [0.0, 0.0, 0.0, 1.0], 0.4),
    ]


def _oracle(rows, threshold):
    """Brute-force: pairwise cosine -> union-find -> keeper election."""
    ids = [r[0] for r in rows]
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    qual = {r[0]: r[2] for r in rows}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in ids:
        for j in ids:
            if i < j:
                a, b = vecs[i], vecs[j]
                cos = float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
                if round(cos, 9) >= threshold:
                    ra, rb = find(i), find(j)
                    parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    expect = {}
    for root, members in groups.items():
        keeper = min(members, key=lambda m: (-qual[m], m))
        for m in members:
            # singleton clusters label as own id (no dup pair exists)
            cluster = root if len(members) > 1 else m
            expect[m] = (cluster, m == keeper)
    return expect


def test_semdedup_matches_bruteforce_oracle(spark):
    rows = _fixture_rows()
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r["vec_id"]: (r["sem_cluster"], r["keep"])
           for r in semdedup(df, n_cells=1, threshold=THRESHOLD,
                             quality_col="quality").collect()}
    assert got == _oracle(rows, THRESHOLD)


def test_semdedup_transitive_chain_is_one_group(spark):
    df = spark.createDataFrame(_fixture_rows(), _SCHEMA)
    out = semdedup(df, n_cells=1, threshold=THRESHOLD,
                   quality_col="quality")
    chain = {r["vec_id"]: r for r in out.collect() if r["vec_id"] in (20, 21, 22)}
    assert {chain[i]["sem_cluster"] for i in (20, 21, 22)} == {20}
    # keeper = highest quality in the chain (21 at 0.8)
    assert [i for i in (20, 21, 22) if chain[i]["keep"]] == [21]


def test_semdedup_without_quality_keeps_min_id(spark):
    df = spark.createDataFrame(_fixture_rows(), _SCHEMA)
    out = semdedup(df, n_cells=1, threshold=THRESHOLD)
    kept = {r["vec_id"] for r in out.collect() if r["keep"]}
    assert kept == {1, 20, 30, 31}


def test_semdedup_invariants_with_multiple_cells(spark):
    """n_cells > 1: output is total over the corpus, every cluster elects
    exactly one keeper, and the keeper has the cluster's max quality."""
    rows = _fixture_rows()
    df = spark.createDataFrame(rows, _SCHEMA)
    out = semdedup(df, n_cells=3, threshold=THRESHOLD,
                   quality_col="quality").collect()
    assert len(out) == len(rows)
    assert {r["vec_id"] for r in out} == {r[0] for r in rows}
    qual = {r[0]: r[2] for r in rows}
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["sem_cluster"], []).append(r)
    for cluster, members in by_cluster.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, (cluster, members)
        assert qual[keepers[0]["vec_id"]] == max(
            qual[m["vec_id"]] for m in members)


def test_semdedup_cell_cap_degrades_to_keep_all(spark):
    """cell_cap=0 marks every cell hot: no pairs are generated, so every
    doc survives as its own singleton cluster (the capped-LSH-bucket
    degradation contract)."""
    df = spark.createDataFrame(_fixture_rows(), _SCHEMA)
    out = semdedup(df, n_cells=1, threshold=THRESHOLD,
                   quality_col="quality", cell_cap=0).collect()
    assert all(r["keep"] for r in out)
    assert all(r["sem_cluster"] == r["vec_id"] for r in out)


def test_semdedup_pair_generation_is_keyed_not_cartesian(spark):
    """The in-cell pair join must be an equi-join on cell, and the hot-
    cell exclusion a broadcast anti-join — never a cartesian stage."""
    from data_engineering_projects_spark.operators.similarity import (
        _semdedup_pairs,
    )
    df = spark.createDataFrame(_fixture_rows(), _SCHEMA)
    assigned = df.select(F.col("vec_id").alias("__sd_id"),
                         F.col("embedding").alias("__sd_emb"),
                         (F.col("vec_id") % 2).cast("int").alias("cell"))
    pairs = _semdedup_pairs(assigned, THRESHOLD, cell_cap=100)
    p = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
