"""Temporal expressions (SURVEY.md §2.5 E1–E5, §7.4 trap #2).

Two day-of-week conventions coexist in the reference and MUST NOT be
conflated:

- ``wday_pandas``: pandas ``dt.weekday + 1`` -> Mon=1..Sun=7
  (1_AWS/README.md:76, 2_Azure/READ.md:58) == ISO dow == DuckDB isodow.
- ``wday_sql``: BigQuery ``EXTRACT(DAYOFWEEK)`` -> Sun=1..Sat=7
  (5_dbt/READ.md:671) == Spark ``dayofweek``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def wday_pandas(ts) -> Column:
    """Mon=1 .. Sun=7 (pandas convention used by projects 1-4)."""
    return F.weekday(ts) + F.lit(1)


def wday_sql(ts) -> Column:
    """Sun=1 .. Sat=7 (BigQuery convention used by project 5)."""
    return F.dayofweek(ts)


def hour_of(ts) -> Column:
    return F.hour(ts)


def day_of(ts) -> Column:
    return F.to_date(ts)


def period_bucket(ts) -> Column:
    """NPMRDS analysis-period bucketing, exactly as the reference defines it
    (1_AWS/README.md:79-89, 3_BigQuery/READ.md:66-71).

    Note the reference quirk, preserved deliberately: "weekday" is
    ``1 < wday < 7`` under the pandas Mon=1 convention — i.e. Tue..Sat —
    and 'we' is the complement (Sun+Mon) within 6-20h. This is the
    reference's tested behavior, not an off-by-one here.

    Implemented as a single ``F.when`` chain (whole-stage codegen) instead
    of the reference's per-row ``df.apply(get_period, axis=1)`` — the only
    row-wise Python in the reference, eliminated per SURVEY.md §2.5 E14.
    """
    wd, hr = wday_pandas(ts), F.hour(ts)
    is_wkday = (wd > 1) & (wd < 7)
    return (
        F.when(is_wkday & (hr >= 6) & (hr < 10), F.lit("amp"))
         .when(is_wkday & (hr >= 10) & (hr < 16), F.lit("mid"))
         .when(is_wkday & (hr >= 16) & (hr < 20), F.lit("pmp"))
         .when((hr >= 6) & (hr < 20), F.lit("we"))
    )


#: DuckDB/ANSI rendering of the same bucketing for oracle SQL strings.
PERIOD_BUCKET_SQL = """
    CASE WHEN isodow({ts}) > 1 AND isodow({ts}) < 7 AND hour({ts}) >= 6  AND hour({ts}) < 10 THEN 'amp'
         WHEN isodow({ts}) > 1 AND isodow({ts}) < 7 AND hour({ts}) >= 10 AND hour({ts}) < 16 THEN 'mid'
         WHEN isodow({ts}) > 1 AND isodow({ts}) < 7 AND hour({ts}) >= 16 AND hour({ts}) < 20 THEN 'pmp'
         WHEN hour({ts}) >= 6 AND hour({ts}) < 20 THEN 'we'
    END
"""


def time_bucket(ts) -> Column:
    """dbt ``time_buckets`` macro analog (5_dbt/READ.md:810-822):
    morning_rush 6-9, evening_rush 16-19, midday 9-16, off_peak else."""
    hr = F.hour(ts)
    return (
        F.when((hr >= 6) & (hr < 9), F.lit("morning_rush"))
         .when((hr >= 16) & (hr < 19), F.lit("evening_rush"))
         .when((hr >= 9) & (hr < 16), F.lit("midday"))
         .otherwise(F.lit("off_peak"))
    )


TIME_BUCKET_SQL = """
    CASE WHEN hour({ts}) >= 6  AND hour({ts}) < 9  THEN 'morning_rush'
         WHEN hour({ts}) >= 16 AND hour({ts}) < 19 THEN 'evening_rush'
         WHEN hour({ts}) >= 9  AND hour({ts}) < 16 THEN 'midday'
         ELSE 'off_peak'
    END
"""
