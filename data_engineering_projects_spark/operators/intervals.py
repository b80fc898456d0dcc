"""Interval sweep-line operators (extension surface, SURVEY.md §2 robust-
stats family): peak-concurrency counting over implied activity intervals
without an interval self-join.

The classic rendering: each interval becomes a +1 boundary at its start
and a −1 at its end, a keyed running sum counts how many are open at
each boundary, and the per-key max is the peak. Two boundary subtleties
make the day-keyed version exact (round-5 ADVICE):

- intervals opened before a day's midnight and still open must SEED that
  day's count (a per-day carry-in aggregate joined back) — otherwise the
  orphaned −1 drives the prefix negative and sessions open at 00:00
  never count toward the day's peak;
- a −1 landing exactly ON midnight belongs to the PREVIOUS day
  (half-open [start, end): the interval is closed at midnight), so the
  endpoint's day is computed from ``end − 1µs``.

Scale: boundaries flow through one day-keyed shuffle (state per
partition = one running integer); the carry-in is a bounded look-back of
exactly one day because the interval duration must not exceed 24h — the
same horizon any watermark imposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def max_concurrency_by_day(events: DataFrame, ts_col: str = "ts",
                           id_col: str = "event_id",
                           duration: str = "INTERVAL 30 MINUTE") -> DataFrame:
    """Per-day peak count of concurrently-open intervals
    ``[ts, ts + duration)`` — output ``(day date, max_concurrent
    bigint)``, one row per day that contains at least one interval
    boundary.

    ``duration`` must be under 24 hours so an interval spans at most one
    midnight (carry-in then reduces to a single previous-day aggregate).
    Determinism at boundary ties: the running sum orders by (pt, delta,
    id) — delta sorts a −1 before a +1 at an exact touch, id breaks the
    rest — so prefix sums are reproducible on any engine.
    """
    end = F.col(ts_col) + F.expr(duration)
    pts = (events.select(F.col(id_col).alias("_id"),
                         F.col(ts_col).alias("pt"),
                         F.lit(1).alias("delta"),
                         F.to_date(ts_col).alias("day"))
           .unionAll(events.select(
               F.col(id_col).alias("_id"), end.alias("pt"),
               F.lit(-1).alias("delta"),
               F.to_date(end - F.expr("INTERVAL 1 MICROSECOND"))
                .alias("day"))))
    w = (Window.partitionBy("day")
         .orderBy("pt", "delta", "_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = pts.select("day", F.sum("delta").over(w).alias("concurrent"))
    mx = run.groupBy("day").agg(F.max("concurrent").alias("mx"))
    next_mid = F.date_add(F.to_date(ts_col), 1)
    carry = (events.filter(end > next_mid.cast("timestamp"))
             .groupBy(next_mid.alias("day"))
             .agg(F.count(F.lit(1)).alias("carry_in")))
    ci = F.coalesce(F.col("carry_in"), F.lit(0))
    # the 00:00 concurrency (= carry_in) can itself be the day's peak
    # when every in-day prefix dips below it, hence GREATEST
    return (mx.join(carry, "day", "left")
            .select("day",
                    F.greatest(ci, ci + F.col("mx")).cast("bigint")
                     .alias("max_concurrent")))
