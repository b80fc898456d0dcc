"""Local replica of the driver's DuckDB-oracle differential check:
row count + column names + order-insensitive canonicalized value compare.

TWO canon modes, both run by :func:`compare` (round-5 VERDICT.md #2):

- **python** — ``collect()`` / ``fetchall()`` (python objects), so type
  identities (date vs datetime, int vs float) survive comparison at full
  repr precision.
- **pandas (driver-style)** — ``toPandas()`` / ``fetchdf()``, replaying
  the DRIVER's canonicalization path. This is the only mode that sees
  DuckDB→pandas dtype coercion: DuckDB's integer window/aggregate SUM
  returns HUGEINT (int128), which ``fetchdf`` coerces to float64 while
  Spark emits int64 — equal values, different canon, driver hash
  mismatch (the round-5 ``docs_select_token_budget`` red row, which the
  fetchall path masked because python ints carry no width).
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


def _canon_pd_cell(v) -> str:
    """Driver-style cell canon over pandas values. Deliberately dtype-
    sensitive: numpy int64 500 -> "500" but float64 500.0 -> "500.0",
    because the driver's hash over pandas frames distinguishes them too
    (that IS the HUGEINT→float64 failure mode this mode exists to
    catch). NaN/NaT/None all canonicalize to NULL, matching the python
    mode's treatment of SQL NULL.

    The midnight-timestamp→date collapse below cannot mask a genuine
    DATE-vs-TIMESTAMP schema divergence: :func:`compare` pins declared
    column KINDS (Spark schema vs the oracle's DESCRIBE types) before any
    value canon runs — see ``_assert_scalar_kinds`` (round-7 ADVICE,
    generalized to every scalar kind in round 8; the round-7
    cursor-description variant was removed as fully subsumed)."""
    import pandas as pd

    if v is None or v is pd.NaT or v is pd.NA:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):  # covers numpy.float64
        return "NULL"
    if isinstance(v, dt.datetime):
        # THIS duckdb build's fetchdf returns DATE columns as
        # datetime64[us] (midnight timestamps) while Spark's toPandas
        # yields datetime.date — yet every date-emitting registry query
        # is driver-hash-green (r3–r5), so the driver's canon equates a
        # date with its midnight timestamp. Replay that: canonicalize a
        # tz-naive midnight timestamp to its date. Timestamps with a
        # real time-of-day (and tz-aware values) keep full precision.
        if (v.tzinfo is None and v.hour == v.minute == v.second == 0
                and v.microsecond == 0
                and getattr(v, "nanosecond", 0) == 0):
            return v.date().isoformat()
        return v.isoformat()
    return _canon_cell(v)


def canon_pandas(pdf) -> list[tuple]:
    """Order-insensitive canon of a pandas frame: sort columns by name
    (as the driver does), canonicalize cells dtype-sensitively, sort
    rows."""
    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon_pd_cell(t[i]) for i in order)
        for t in pdf.itertuples(index=False, name=None))


def _assert_scalar_kinds(spark_schema, duck_describe_rows) -> None:
    """Pin scalar column KINDS between the declared Spark schema and the
    materialized oracle's ``DESCRIBE`` output (round-8, extending the
    round-7 temporal check to every scalar kind).

    The DB-API cursor description collapses every numeric to 'NUMBER',
    so this check reads ``DESCRIBE __oracle`` instead — real DuckDB
    types. Why it matters: both value canons can equate across kind
    mismatches (python canon: int 500 == int 500 even if one side
    declared DOUBLE but all values landed integral... the pandas canon
    catches that one only when coercion differs, and NEITHER canon sees
    a 0-row result). Declared-kind pinning fails loudly regardless of
    data. HUGEINT is deliberately its OWN kind (never bucketed with
    int): the repo rule is that oracle integer SUMs must
    ``CAST(... AS BIGINT)``, and this turns a forgotten cast into a
    schema error even on queries whose driver rows happen to hash
    green at the tested SF."""
    from pyspark.sql.types import (BooleanType, ByteType, DateType,
                                   DecimalType, DoubleType, FloatType,
                                   IntegerType, LongType, ShortType,
                                   StringType, TimestampNTZType,
                                   TimestampType)

    def spark_kind(dtype) -> str:
        if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
            return "int"
        if isinstance(dtype, (FloatType, DoubleType)):
            return "float"
        if isinstance(dtype, DecimalType):
            return "decimal"
        if isinstance(dtype, BooleanType):
            return "bool"
        if isinstance(dtype, StringType):
            return "string"
        if isinstance(dtype, DateType):
            return "date"
        if isinstance(dtype, (TimestampType, TimestampNTZType)):
            return "timestamp"
        return ""

    def duck_kind(t: str) -> str:
        t = t.upper()
        if t == "HUGEINT":
            return "hugeint"
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                 "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        if t in ("FLOAT", "DOUBLE"):
            return "float"
        if t.startswith("DECIMAL"):
            return "decimal"
        if t == "BOOLEAN":
            return "bool"
        if t == "VARCHAR":
            return "string"
        if t == "DATE":
            return "date"
        if t.startswith("TIMESTAMP"):
            return "timestamp"
        return ""

    skinds = {f.name: spark_kind(f.dataType) for f in spark_schema.fields}
    dkinds = {r[0]: duck_kind(r[1]) for r in duck_describe_rows}
    bad = [(c, skinds[c], dkinds[c]) for c in skinds
           if c in dkinds and (skinds[c] or dkinds[c])
           and skinds[c] != dkinds[c]]
    assert not bad, (
        f"scalar column-kind mismatch (col, spark, oracle): {bad} — "
        f"align the declared types (HUGEINT: CAST the oracle SUM to "
        f"BIGINT; DECIMAL vs DOUBLE: add the explicit CAST the "
        f"determinism builders use)")


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


def compare(spark_df, sql: str, sf_dir: str, pandas_canon: bool = True) -> None:
    """Differential check in BOTH canon modes (python + driver-style
    pandas). ``pandas_canon=False`` skips the driver-style pass (used
    only by tests that pin the divergence between the two modes)."""
    assert_driver_hashable(spark_df)
    got_cols = spark_df.columns
    if pandas_canon:
        # both canon modes read the Spark result (collect + toPandas);
        # persist so the plan executes once, not twice
        spark_df = spark_df.persist()
    try:
        got_rows = [tuple(r) for r in spark_df.collect()]
        con = duck_connection(sf_dir)
        try:
            # materialize the oracle once; fetchall and fetchdf then read
            # the temp table (types preserved — HUGEINT stays HUGEINT, so
            # the fetchdf coercion the pandas mode exists to see is
            # unchanged) instead of re-executing the query
            con.execute(f"CREATE TEMP TABLE __oracle AS {sql}")
            # DESCRIBE first: duckdb's execute() returns the connection
            # itself, so a later statement would clobber a pending cursor
            described = con.execute("DESCRIBE __oracle").fetchall()
            cur = con.execute("SELECT * FROM __oracle")
            want_cols = [d[0] for d in cur.description]
            _assert_scalar_kinds(spark_df.schema, described)
            want_rows = cur.fetchall()
            want_pdf = (con.execute("SELECT * FROM __oracle").fetchdf()
                        if pandas_canon else None)
        finally:
            con.close()
        assert sorted(got_cols) == sorted(want_cols), (
            f"column mismatch: spark={sorted(got_cols)} "
            f"oracle={sorted(want_cols)}")
        assert len(got_rows) == len(want_rows), (
            f"row count: spark={len(got_rows)} oracle={len(want_rows)}")
        g, w = canon(got_cols, got_rows), canon(want_cols, want_rows)
        if g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
            raise AssertionError(
                f"value mismatch; first diffs (spark, oracle): {diffs}")
        if pandas_canon:
            gp, wp = canon_pandas(spark_df.toPandas()), canon_pandas(want_pdf)
            if gp != wp:
                diffs = [(a, b) for a, b in zip(gp, wp) if a != b][:5]
                raise AssertionError(
                    "pandas-canon (driver-style) mismatch — python-object "
                    "canon passed, so this is a DuckDB→pandas or "
                    "Spark→pandas dtype coercion (e.g. HUGEINT→float64: "
                    "CAST the oracle SUM to BIGINT); first diffs "
                    f"(spark, oracle): {diffs}")
    finally:
        if pandas_canon:
            spark_df.unpersist()
