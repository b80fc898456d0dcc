"""Batch sessionization + as-of date arithmetic queries.

``events_sessionize`` is the batch counterpart of
``streaming.sessionize_stream``: the gaps-and-islands pattern — a lag
window flags session starts, a running sum numbers sessions, a groupBy
rolls them up. Three window/agg passes over one shuffle key (user_id):
the canonical distributed sessionization shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

EV = "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"


@query("events_sessionize", f"""
WITH ev AS ({EV}),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL OR
                   epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM flagged)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no, COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
FROM numbered GROUP BY user_id, session_no
""")
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap). The lag
    flag and running sum share one (user_id)-partitioned sort — a single
    shuffle; the rollup reuses the same key. Ties on ts are broken by
    event_id so numbering is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(prev_us.isNull()
               | ((F.unix_micros("ts") - prev_us) > 1_800_000_000), 1)
         .otherwise(0).alias("new_session"))
    wrun = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    numbered = flagged.withColumn("session_no", F.sum("new_session").over(wrun))
    return (numbered.groupBy("user_id", "session_no")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                  / F.lit(1_000_000)).cast("long").alias("duration_sec")))


@query("orders_asof_window", """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE CAST(o_orderdate AS DATE)
      BETWEEN DATE '2001-08-01' - INTERVAL 30 DAY AND DATE '2001-08-01'
GROUP BY o_orderpriority
""")
def orders_asof_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/P6: the dbt marts' rolling CURRENT_DATE window
    (5_dbt/READ.md:615-616) with the as-of date parameterized for
    reproducibility (§7.4 trap #10): last-30-days as of 2001-08-01.
    The derived date bounds push into the parquet scan."""
    as_of = F.lit("2001-08-01").cast("date")
    o = load_table(spark, sf_dir, "orders")
    return (o.filter(F.to_date("o_orderdate").between(F.date_sub(as_of, 30), as_of))
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.round(F.sum("o_totalprice"), 2).alias("total_price")))
