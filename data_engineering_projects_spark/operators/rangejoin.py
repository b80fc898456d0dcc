"""Range (interval) join — points matched into time intervals — as a
bucketed equi-join instead of the inequality join Catalyst would execute
as a broadcast-nested-loop.

Shape: quantize time into coarse buckets of ``bucket_seconds``; each
interval replicates into every bucket it overlaps (explode of a small
``sequence``), each point maps to exactly one bucket, and the join becomes
an equi-join on (key..., bucket) followed by the exact range predicate.
A point's bucket is unique, so each qualifying (point, interval) pair is
produced exactly once — no dedup needed.

Scale: shuffle is keyed on (key, bucket) — fully parallel; interval-side
replication factor is ``len(interval)/bucket_seconds + 1`` (pick the
bucket near the typical interval length). This is the standard rendering
of Databricks' range-join-bin optimization in plain open-source Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__bucket"


def interval_join(points: DataFrame, intervals: DataFrame, point_ts: str,
                  start_ts: str, end_ts: str, keys: list[str] | None = None,
                  bucket_seconds: int = 7200) -> DataFrame:
    """Inner join of each point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` (and equal ``keys``). Column sets
    of the two inputs must be disjoint apart from ``keys``."""
    keys = list(keys or [])
    us = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn(_B, F.floor(F.unix_micros(F.col(point_ts)) / us))
    i = intervals.withColumn(
        _B, F.explode(F.sequence(
            F.floor(F.unix_micros(F.col(start_ts)) / us),
            F.floor(F.unix_micros(F.col(end_ts)) / us))))
    j = p.join(i, keys + [_B])
    return (j.filter((F.col(point_ts) >= F.col(start_ts))
                     & (F.col(point_ts) <= F.col(end_ts)))
             .drop(_B))
