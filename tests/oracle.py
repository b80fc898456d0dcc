"""Local replica of the driver's DuckDB-oracle differential check:
row count + column names + order-insensitive canonicalized value compare.

Uses ``collect()`` / ``fetchall()`` (python objects) rather than pandas,
so type identities (date vs datetime, int vs float) survive comparison.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from data_engineering_projects_spark.sources import STAR_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if hasattr(v, "item") and not isinstance(v, (dt.datetime, dt.date)):
        v = v.item()  # numpy scalars
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # repr-level (shortest round-trip) strictness: distinguishes -0.0
        # from 0.0 and every ulp — matches the driver's hash, which caught a
        # signed-zero divergence the old %.10g + zero-normalizing canon
        # masked for two rounds (see round-2 VERDICT.md).
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, int):
        return str(v)
    return str(v)


def canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def assert_driver_hashable(spark_df) -> None:
    """The driver canonicalizes results via pandas ``sort_values``, which
    dies on unhashable cells (``TypeError: unhashable type:
    'numpy.ndarray'`` — round-3 VERDICT.md red row). Reject complex-typed
    output columns here so the LOCAL harness fails before the driver can:
    contract queries must only return scalar columns (join arrays into
    strings or explode to rows)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [f.name for f in spark_df.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not bad, (
        f"driver-unhashable complex-typed columns {bad}: the driver's pandas "
        f"canon cannot sort array/map/struct cells — emit a joined string or "
        f"explode to rows instead")


def compare(spark_df, sql: str, sf_dir: str) -> None:
    assert_driver_hashable(spark_df)
    got_cols = spark_df.columns
    got_rows = [tuple(r) for r in spark_df.collect()]
    con = duck_connection(sf_dir)
    try:
        cur = con.execute(sql)
        want_cols = [d[0] for d in cur.description]
        want_rows = cur.fetchall()
    finally:
        con.close()
    assert sorted(got_cols) == sorted(want_cols), (
        f"column mismatch: spark={sorted(got_cols)} oracle={sorted(want_cols)}")
    assert len(got_rows) == len(want_rows), (
        f"row count: spark={len(got_rows)} oracle={len(want_rows)}")
    g, w = canon(got_cols, got_rows), canon(want_cols, want_rows)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
