"""Vector expressions over ``array<float>`` embedding columns.

Built on higher-order functions (``zip_with`` + ``aggregate``), which run
inside the JVM per-row with no shuffle and no Python — the correct scale
path for 100 TB of embeddings. A Pandas-UDF variant exists in
``operators.similarity`` for batch-BLAS workloads where Arrow transfer +
numpy matmul beats per-row HOFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a, b) -> Column:
    """cos(a,b) = a·b / (|a||b|); NULL on zero-norm inputs (NULLIF guard)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


#: DuckDB renderings for oracle SQL (computed the same way — explicit
#: double accumulation — rather than list_cosine_similarity, to keep the
#: arithmetic auditable on both sides).
DOT_SQL = ("list_sum(list_transform(list_zip({a}, {b}),"
           " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")


def cosine_sql(a: str, b: str) -> str:
    da = DOT_SQL.format(a=a, b=a)
    db = DOT_SQL.format(a=b, b=b)
    dab = DOT_SQL.format(a=a, b=b)
    return f"({dab} / NULLIF(sqrt({da}) * sqrt({db}), 0))"


def l2sq_sql(a: str, b: str) -> str:
    """DuckDB rendering of ``operators.pq._l2sq`` — squared L2 distance
    as the same left-fold over element order (list_sum ≡ Spark's
    ``aggregate`` fold), so identical operands give identical doubles."""
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
            f" * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))")
