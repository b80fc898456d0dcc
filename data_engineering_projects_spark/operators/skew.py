"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (on in ``session.py``) is the first-line
defense and needs no code. Salting is the explicit fallback for the cases
AQE cannot fix: a non-broadcastable dimension joined on a key whose hot
value exceeds one executor's memory, or a two-stage aggregation where one
group dominates. Both transformations are result-identical to their
unsalted forms — the salt only changes the physical shuffle distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(skewed: DataFrame, dim: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the skewed side salted and the dim side replicated.

    The hot key's rows scatter over ``n_salts`` shuffle partitions instead
    of one; the dim side grows ``n_salts``× (it must be the small side —
    if it were broadcastable you wouldn't salt at all). Join output is
    identical to ``skewed.join(dim, on, how)`` — but only for join types
    that never emit *unmatched dim-side* rows: the dim side is replicated
    per salt, so right/full outer would return each unmatched dim row
    ``n_salts`` times. Those types are rejected; salt the other input (or
    dedupe afterwards) instead. The salt column never escapes.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins; {how!r} would "
            f"replicate unmatched dim rows {n_salts}x (dim side is exploded)")
    salted = skewed.withColumn(SALT, (F.rand(42) * n_salts).cast("int"))
    replicated = dim.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return salted.join(replicated, [on, SALT], how).drop(SALT)


_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[Column, str]],
               n_salts: int = 8) -> DataFrame:
    """Two-stage aggregation through a salt for decomposable aggregates.

    ``aggs`` maps output column name -> (stage-1 aggregate expression,
    combiner), where combiner is ``'sum'`` (for sum/count), ``'min'`` or
    ``'max'``. Spark's map-side partial aggregation already handles most
    skew; this helps when the *reduce* side of one group is still too
    large. AVG must be decomposed by the caller into sum + count.
    """
    stage1 = (df.withColumn(SALT, (F.rand(7) * n_salts).cast("int"))
                .groupBy(*keys, SALT)
                .agg(*[expr.alias(k) for k, (expr, _c) in aggs.items()]))
    return (stage1.groupBy(*keys)
                  .agg(*[_COMBINERS[c](k).alias(k)
                         for k, (_e, c) in aggs.items()]))


def skew_report(df: DataFrame, key_cols: list[str],
                top: int = 10) -> DataFrame:
    """One-row skew diagnostic for a prospective join/agg key — the
    measurement that decides between the three mitigation tiers (do
    nothing / trust AQE / salt):

    - ``n_rows``, ``n_keys``, ``mean_per_key``,
    - ``max_share`` (hot key's fraction of ALL rows) and ``p99_ratio``
      (p99 key frequency over the mean),
    - ``top_keys``: the ``top`` hottest key tuples with counts,
    - ``tier``: ``"uniform"`` (max_share < 1%), ``"aqe"`` (AQE's
      skew-join splitting handles it: hot partitions split by size), or
      ``"salt"`` (max_share ≥ 20% — one key dominates; a split hot
      partition still lands on one JOIN key, so explicit salting is the
      only lever — ``salted_join`` / ``salted_agg`` above).

    Cost: ONE map-side-combined shuffle (the key frequency table), a
    TakeOrderedAndProject for the hot list (never a full collect of the
    key domain), and driver-bounded aggregates. Run it on a sample at
    100 TB — frequency SHARES are what the tiers read, and shares
    survive uniform sampling.
    """
    freq = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    kc = F.array(*[F.col(c).cast("string") for c in key_cols])
    stats = freq.agg(
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("__max"),
        # approx: fixed-size sketch buffer (the exact percentile's
        # per-distinct-frequency map is NOT driver-bounded at 100 TB —
        # the parity.py §4.3 rule); p99_ratio is a tiering heuristic
        F.approx_percentile("__n", F.lit(0.99), F.lit(10_000))
         .alias("__p99"))
    hot = (freq.orderBy(F.desc("__n"), kc).limit(top)
           .agg(F.collect_list(F.struct(kc.alias("key"),
                                        F.col("__n").alias("n")))
                .alias("__top")))
    return stats.crossJoin(hot).select(
        "n_rows", "n_keys",
        (F.col("n_rows") / F.col("n_keys")).alias("mean_per_key"),
        (F.col("__max") / F.col("n_rows")).alias("max_share"),
        (F.col("__p99") / (F.col("n_rows") / F.col("n_keys")))
        .alias("p99_ratio"),
        # same (count desc, string-key asc) order as the limit above
        F.array_sort(F.transform(
            "__top", lambda s: F.struct((-s["n"]).alias("__neg"),
                                        s["key"].alias("key"),
                                        s["n"].alias("n"))))
        .alias("__sorted"),
        F.when(F.col("n_rows").isNull() | (F.col("n_rows") == 0),
               "empty")
         .when(F.col("__max") / F.col("n_rows") >= 0.2, "salt")
         .when(F.col("__max") / F.col("n_rows") < 0.01, "uniform")
         .otherwise("aqe").alias("tier")).withColumn(
        "top_keys", F.transform("__sorted",
                                lambda s: F.struct(s["key"].alias("key"),
                                                   s["n"].alias("n")))
    ).drop("__sorted")
