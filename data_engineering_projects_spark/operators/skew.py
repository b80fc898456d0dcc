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
