"""Time-series operators over the events table (round-4 additions):
rolling time-range windows and calendar-spine gap filling — the two shapes
a metrics mart needs beyond plain GROUP BY rollups (the reference's hourly
/ daily marts, 5_dbt/READ.md:123-133, stop at aligned buckets).

Determinism notes (see contract/__init__ conventions):
- rolling sums stay in the exact DECIMAL domain through the window frame —
  windowed float SUM is engine-private (DuckDB segment tree vs Spark
  running accumulation would differ at the last ulp); integer/decimal
  addition is associative so frame evaluation order cannot matter;
- the rolling average is emitted as the RAW quotient (decimal-sum cast to
  double / row count): identical division is bit-exact cross-engine, and
  ROUND of a derived quotient is the known divergence class;
- RANGE frames order by integer day numbers (day - epoch) on both engines
  so frame bounds are exact integer arithmetic, not interval semantics.

Scale notes (100 TB):
- the rolling window shuffles once on the partition key (event_type) and
  the per-key daily series is schema-bounded (days per year), so state per
  window partition is tiny regardless of fact-table size;
- gap filling generates the calendar spine FROM the aggregated per-key
  bounds (one row per key -> sequence explode), never a driver-side loop;
  the spine join is an equi-join on (key, hour) against the already-
  aggregated hourly relation — both sides are post-aggregation small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.determinism import DEC_SUM_SQL
from ..sources import load_table
from . import query
from .parity import EV


@query("events_rolling_7d", f"""
WITH ev AS ({EV}),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS dec_total
  FROM ev GROUP BY event_type, CAST(ts AS DATE))
SELECT event_type, day, n,
       CAST(dec_total AS DOUBLE) AS daily_total,
       CAST(SUM(dec_total) OVER w AS DOUBLE) AS w7_total,
       CAST(COUNT(*) OVER w AS BIGINT) AS w7_days,
       CAST(SUM(dec_total) OVER w AS DOUBLE) / COUNT(*) OVER w AS w7_avg
FROM daily
WINDOW w AS (PARTITION BY event_type
             ORDER BY (day - DATE '1970-01-01')
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""")
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving aggregate per event type: daily totals (exact
    DECIMAL) then a RANGE frame over integer day numbers, so a missing
    day narrows the frame instead of silently sliding a 7-ROW frame over
    gaps — the correct trailing-window semantics for sparse series.

    One shuffle for the daily rollup, one keyed shuffle for the window;
    the frame sum stays DECIMAL (order-independent) and the average is
    the raw quotient (bit-exact cross-engine)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("value").cast("decimal(18,2)"))
                     .alias("dec_total")))
    w = (Window.partitionBy("event_type")
         .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
         .rangeBetween(-6, Window.currentRow))
    w7_total = F.sum("dec_total").over(w).cast("double")
    w7_days = F.count(F.lit(1)).over(w).cast("bigint")
    return daily.select(
        "event_type", "day", "n",
        F.col("dec_total").cast("double").alias("daily_total"),
        w7_total.alias("w7_total"), w7_days.alias("w7_days"),
        (w7_total / w7_days).alias("w7_avg"))


@query("events_gap_fill_hourly", f"""
WITH ev AS ({EV}),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROUND({DEC_SUM_SQL.format(c='value', s=2)}, 3) AS total_value
  FROM ev GROUP BY event_type, date_trunc('hour', ts)),
bounds AS (
  SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly
  GROUP BY event_type),
spine AS (
  SELECT event_type,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds)
SELECT s.event_type, s.hour,
       COALESCE(h.n, 0) AS n,
       COALESCE(h.total_value, 0.0) AS total_value,
       CAST(h.event_type IS NULL AS BOOLEAN) AS gap_filled
FROM spine s LEFT JOIN hourly h
  ON h.event_type = s.event_type AND h.hour = s.hour
""")
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: the hourly rollup left-joined onto a
    dense per-type hour spine generated from each type's own [min, max]
    span, with missing hours materialized as explicit zero rows (the
    downstream-join-safe form of a sparse series).

    The spine derives from the AGGREGATED relation (one sequence-explode
    per key from a one-row-per-key bounds agg) — no driver loop, no cross
    join; the fill join is an equi-join of two post-aggregation relations.
    Both sequence endpoints are inclusive on both engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                              .cast("double"), 3).alias("total_value")))
    spine = (hourly.groupBy("event_type")
             .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
             .select("event_type",
                     F.explode(F.sequence(
                         "h0", "h1", F.expr("INTERVAL 1 HOUR")))
                      .alias("hour")))
    h = hourly.select(F.col("event_type").alias("h_type"),
                      F.col("hour").alias("h_hour"), "n", "total_value")
    return (spine.join(h, (F.col("event_type") == F.col("h_type"))
                       & (F.col("hour") == F.col("h_hour")), "left")
            .select("event_type", "hour",
                    F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
                    F.coalesce("total_value", F.lit(0.0))
                     .alias("total_value"),
                    F.col("h_type").isNull().alias("gap_filled")))


@query("events_zscore_hourly", f"""
WITH ev AS ({EV}),
h AS (SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      FROM ev GROUP BY event_type, date_trunc('hour', ts)),
st AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS s1,
              CAST(SUM(n * n) AS BIGINT) AS s2, COUNT(*) AS k
       FROM h GROUP BY event_type),
z AS (
  SELECT h.event_type, h.hour, h.n,
         (CAST(h.n AS DOUBLE) - CAST(st.s1 AS DOUBLE) / st.k)
         / NULLIF(SQRT(GREATEST(
             CAST(st.s2 AS DOUBLE) / st.k
             - (CAST(st.s1 AS DOUBLE) / st.k) * (CAST(st.s1 AS DOUBLE) / st.k),
             0)), 0) AS z
  FROM h JOIN st ON h.event_type = st.event_type)
SELECT event_type, hour, CAST(n AS BIGINT) AS n, z
FROM z WHERE ABS(z) >= 2
""")
def events_zscore_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped standardization anomaly detection: hourly counts per type,
    standardized against THAT TYPE's own mean/std (population moments),
    emitting hours with |z| >= 2 — the per-key generalization of the
    global 3-sigma outlier test (`dbt_outlier_3sigma`), whose 1-row
    cross-join becomes a broadcast equi-join on the group key here.

    Every input to z is bit-exact cross-engine: counts are integers, the
    moment sums are exact BIGINTs, and division/multiply/sqrt are all
    correctly-rounded IEEE ops — so the raw z (and the >= 2 gate) cannot
    flip between engines. SQRT sits on GREATEST(var, 0) for the
    cancellation guard; a zero-variance type yields NULL z (filtered)."""
    ev = load_table(spark, sf_dir, "events")
    h = (ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
         .agg(F.count(F.lit(1)).alias("n")))
    st = (h.groupBy("event_type")
          .agg(F.sum("n").cast("bigint").alias("s1"),
               F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
               F.count(F.lit(1)).alias("k")))
    mean = F.col("s1").cast("double") / F.col("k")
    var = F.col("s2").cast("double") / F.col("k") - mean * mean
    z = ((F.col("n").cast("double") - mean)
         / F.nullif(F.sqrt(F.greatest(var, F.lit(0.0))), F.lit(0.0)))
    return (h.join(F.broadcast(st), "event_type")
            .withColumn("z", z)
            .filter(F.abs("z") >= 2)
            .select("event_type", "hour", F.col("n").cast("bigint").alias("n"),
                    "z"))


@query("events_value_ntiles", f"""
WITH ev AS ({EV}),
r AS (
  SELECT event_type, value,
         NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS quartile,
         CUME_DIST() OVER (PARTITION BY event_type ORDER BY value)
           AS cume
  FROM ev WHERE value IS NOT NULL)
SELECT event_type, quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS lo, MAX(value) AS hi,
       MAX(cume) AS max_cume
FROM r GROUP BY event_type, quartile
""")
def events_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE + CUME_DIST window coverage (the two ranking windows the
    board lacked): per type, values split into 4 equal-count tiles
    (deterministic (value, event_id) order so tile boundaries cannot
    flip on duplicate values) with per-tile bounds and the cumulative
    distribution at the tile's top.

    CUME_DIST is rank/count — an integer ratio, bit-exact cross-engine;
    aggregating MAX(cume) per tile keeps the output schema scalar. One
    keyed shuffle shared by both windows (same partition key)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wq = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type").orderBy("value")
    r = ev.select("event_type", "value",
                  F.ntile(4).over(wq).alias("quartile"),
                  F.cume_dist().over(wc).alias("cume"))
    return (r.groupBy("event_type", "quartile")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("value").alias("lo"), F.max("value").alias("hi"),
                 F.max("cume").alias("max_cume")))
