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

import re

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
    midnight (carry-in then reduces to a single previous-day aggregate) —
    VALIDATED here, because a longer duration would not error: middle
    days of a multi-day interval get no boundary row (silently absent
    from the output) and the final day's peak clamps to zero instead of
    counting the still-open interval. Determinism at boundary ties: the
    running sum orders by (pt, delta, id) — delta sorts a −1 before a +1
    at an exact touch, id breaks the rest — so prefix sums are
    reproducible on any engine.
    """
    m = re.fullmatch(
        r"\s*INTERVAL\s+(\d+)\s+(MICROSECOND|MILLISECOND|SECOND|MINUTE|"
        r"HOUR)S?\s*", duration, re.IGNORECASE)
    if not m:
        raise ValueError(
            f"max_concurrency_by_day: duration {duration!r} must be a "
            "sub-day interval (INTERVAL <n> MICROSECOND/MILLISECOND/"
            "SECOND/MINUTE/HOUR) — a day-or-longer interval spans "
            "multiple midnights, which the single-day carry-in cannot "
            "represent (middle days would be silently dropped)")
    n, unit = int(m.group(1)), m.group(2).upper()
    us_per = {"MICROSECOND": 1, "MILLISECOND": 1_000, "SECOND": 1_000_000,
              "MINUTE": 60_000_000, "HOUR": 3_600_000_000}[unit]
    if n * us_per >= 24 * 3_600_000_000:
        raise ValueError(
            f"max_concurrency_by_day: duration {duration!r} is >= 24h; "
            "intervals would span multiple midnights — aggregate at a "
            "coarser key or decompose the interval first")
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
