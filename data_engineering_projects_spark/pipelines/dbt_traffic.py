"""Project 5 — dbt traffic-congestion pipeline (5_dbt/READ.md) as a
ModelGraph: staging views → intermediate table → marts, with the dbt test
suite attached as quality gates.

Staging models stay views (lazy — Catalyst fuses them into consumers,
5_dbt/READ.md:127-128); the intermediate hourly model materializes as a
partitioned table (``partition_by recorded_date, cluster_by location_id``
analog, 5_dbt/READ.md:389-394) because three marts reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import clean_range
from ..functions import metrics as M
from ..functions.temporal import time_bucket
from ..plans.models import ModelGraph, Materialization
from .. import quality as Q


def build_traffic_graph(sources: dict[str, DataFrame],
                        vars: dict | None = None,
                        warehouse_dir: str | None = None) -> ModelGraph:
    """``sources``: raw_volume_data, raw_speed_data, raw_incident_data,
    raw_location_data in the reference's raw schema (5_dbt/READ.md:149-295).

    ``vars`` supports start_date / end_date (5_dbt/READ.md:118-121) and the
    reproducibility parameters run_ts / batch_id replacing
    current_timestamp / invocation_id (§7.4 trap #10).
    """
    g = ModelGraph(vars={"start_date": "1900-01-01", "end_date": "2999-12-31",
                         "batch_id": "run-000", "max_null_records": 100,
                         "max_outlier_records": 50, **(vars or {})},
                   warehouse_dir=warehouse_dir)

    for name, df in sources.items():
        g.add_source(name, lambda spark, v, _df=df: _df)

    @g.model(deps=["raw_volume_data"],
             checks=[Q.not_null("location_id"), Q.not_null("recorded_time"),
                     Q.accepted_range("vehicle_count", 0, 10000, Q.Severity.WARN),
                     Q.accepted_range("average_speed", 0, 120, Q.Severity.WARN)])
    def stg_traffic_volume(spark, v, raw_volume_data):
        """5_dbt/READ.md:149-184: rename projection, timestamp cast,
        BETWEEN var-window, range-clamp cleaning, batch metadata."""
        return (raw_volume_data
                .select(F.col("id").alias("record_id"),
                        F.col("location_id"),
                        F.col("recorded_time").cast("timestamp").alias("recorded_time"),
                        clean_range(F.col("vehicle_count"), 0, 10000).alias("vehicle_count"),
                        clean_range(F.col("average_speed"), 0, 120).alias("average_speed"),
                        F.col("lane_count"))
                .filter(F.col("recorded_time").between(
                    F.lit(v["start_date"]).cast("timestamp"),
                    F.lit(v["end_date"]).cast("timestamp")))
                .withColumn("batch_id", F.lit(v["batch_id"])))

    @g.model(deps=["raw_speed_data"],
             checks=[Q.not_null("location_id")])
    def stg_traffic_speed(spark, v, raw_speed_data):
        """5_dbt/READ.md:197-229."""
        return (raw_speed_data
                .select(F.col("id").alias("record_id"),
                        F.col("sensor_id").alias("location_id"),
                        F.col("timestamp").cast("timestamp").alias("recorded_time"),
                        clean_range(F.col("speed"), 0, 120).alias("speed"),
                        F.col("vehicle_count"), F.col("confidence_score"))
                .filter(F.col("recorded_time").between(
                    F.lit(v["start_date"]).cast("timestamp"),
                    F.lit(v["end_date"]).cast("timestamp")))
                .withColumn("batch_id", F.lit(v["batch_id"])))

    @g.model(deps=["raw_incident_data"])
    def stg_traffic_incidents(spark, v, raw_incident_data):
        """5_dbt/READ.md:233-264: LIKE-standardized incident types (E7)."""
        t = F.lower(F.col("type"))
        std_type = (F.when(t.like("%accident%"), "Accident")
                     .when(t.like("%construction%"), "Construction")
                     .when(t.like("%breakdown%"), "Breakdown")
                     .otherwise(F.initcap(F.col("type"))))
        return (raw_incident_data
                .select(F.col("incident_id"), F.col("location_id"),
                        F.col("start_time").alias("incident_start_time"),
                        F.col("end_time").alias("incident_end_time"),
                        F.col("severity"), std_type.alias("incident_type"),
                        F.col("affected_lanes")))

    @g.model(deps=["raw_location_data"],
             checks=[Q.unique("location_id"), Q.not_null("location_id"),
                     Q.accepted_range("latitude", -90, 90),
                     Q.accepted_range("longitude", -180, 180)])
    def stg_locations(spark, v, raw_location_data):
        """5_dbt/READ.md:266-295."""
        return raw_location_data

    @g.model(deps=["stg_traffic_speed", "stg_traffic_volume",
                   "stg_traffic_incidents", "stg_locations"],
             materialization=Materialization.TABLE,
             partition_by=["recorded_date"])
    def int_hourly_congestion(spark, v, stg_traffic_speed, stg_traffic_volume,
                              stg_traffic_incidents, stg_locations):
        """5_dbt/READ.md:396-485: hourly rollups, FULL OUTER key-coalesced
        combine, incident LEFT JOIN, broadcast dim, congestion index."""
        speed = (stg_traffic_speed.filter(F.col("speed").isNotNull())
                 .groupBy("location_id",
                          F.date_trunc("hour", "recorded_time").alias("recorded_hour"))
                 .agg(F.avg("speed").alias("avg_speed"),
                      F.min("speed").alias("min_speed"),
                      F.max("speed").alias("max_speed"),
                      F.percentile("speed", 0.5).alias("median_speed"),
                      F.count("speed").alias("reading_count")))
        volume = (stg_traffic_volume.filter(F.col("vehicle_count").isNotNull())
                  .groupBy("location_id",
                           F.date_trunc("hour", "recorded_time").alias("recorded_hour"))
                  .agg(F.sum("vehicle_count").alias("total_volume"),
                       F.avg("vehicle_count").alias("avg_volume"),
                       F.max("vehicle_count").alias("max_volume")))
        incidents = (stg_traffic_incidents
                     .groupBy("location_id",
                              F.date_trunc("hour", "incident_start_time")
                               .alias("recorded_hour"))
                     .agg(F.count(F.lit(1)).alias("incident_count"),
                          F.max("severity").alias("max_severity")))
        dim = stg_locations.select("location_id", "speed_limit", "lanes",
                                   "road_type", "is_highway")
        combined = speed.join(volume, ["location_id", "recorded_hour"], "full_outer")
        out = (combined
               .join(incidents, ["location_id", "recorded_hour"], "left")
               .join(F.broadcast(dim), "location_id", "left")
               .withColumn("incident_count", F.coalesce("incident_count", F.lit(0)))
               .withColumn("congestion_index",
                           M.congestion_index(F.col("avg_speed"),
                                              F.coalesce(F.col("total_volume"), F.lit(0)),
                                              F.col("speed_limit"), F.col("lanes")))
               .withColumn("speed_ratio",
                           M.speed_ratio(F.col("avg_speed"), F.col("speed_limit")))
               .withColumn("time_bucket", time_bucket(F.col("recorded_hour")))
               .withColumn("recorded_date", F.to_date("recorded_hour")))
        return out

    @g.model(deps=["int_hourly_congestion"],
             checks=[Q.accepted_range("avg_daily_congestion", 0, 1),
                     Q.accepted_range("congestion_rank", 1, 10)])
    def mart_daily_congestion(spark, v, int_hourly_congestion):
        """5_dbt/READ.md:541-590: daily rollup + RANK + QUALIFY<=10."""
        daily = (int_hourly_congestion
                 .filter(F.col("congestion_index").isNotNull())
                 .groupBy("location_id", "recorded_date")
                 .agg(F.round(F.avg("congestion_index"), 3).alias("avg_daily_congestion"),
                      F.round(F.avg("avg_speed"), 1).alias("avg_daily_speed"),
                      F.countDistinct(F.to_date("recorded_hour")).alias("days_observed")))
        w = Window.partitionBy("recorded_date").orderBy(F.desc("avg_daily_congestion"))
        return (daily.withColumn("congestion_rank", F.rank().over(w))
                     .filter(F.col("congestion_rank") <= 10))

    @g.model(deps=["int_hourly_congestion"])
    def mart_hourly_patterns(spark, v, int_hourly_congestion):
        """5_dbt/READ.md:600-650: PERCENT_RANK speed buckets per hour."""
        hourly = (int_hourly_congestion
                  .filter(F.col("avg_speed").isNotNull())
                  .groupBy("location_id", F.hour("recorded_hour").alias("hour_of_day"))
                  .agg(F.avg("avg_speed").alias("avg_speed")))
        pr = F.percent_rank().over(
            Window.partitionBy("hour_of_day").orderBy("avg_speed"))
        cat = (F.when(pr < 0.25, "slow_quartile").when(pr < 0.5, "below_median")
                .when(pr < 0.75, "above_median").otherwise("fast_quartile"))
        return hourly.select("location_id", "hour_of_day", "avg_speed",
                             pr.alias("speed_pctile"), cat.alias("speed_category"))

    @g.model(deps=["int_hourly_congestion"])
    def mart_volume_trends(spark, v, int_hourly_congestion):
        """5_dbt/READ.md:662-732: daily→weekly re-agg + per-dow rank."""
        daily = (int_hourly_congestion
                 .filter(F.col("total_volume").isNotNull())
                 .groupBy("location_id", "recorded_date")
                 .agg(F.sum("total_volume").alias("daily_volume")))
        weekly = (daily.groupBy("location_id",
                                F.dayofweek("recorded_date").alias("day_of_week"))
                       .agg(F.avg("daily_volume").alias("avg_weekly_volume")))
        w = Window.partitionBy("day_of_week").orderBy(F.desc("avg_weekly_volume"))
        return weekly.withColumn("volume_rank", F.rank().over(w))

    return g


def singular_tests(g: ModelGraph, built: dict[str, DataFrame]) -> list[Q.CheckResult]:
    """The three dbt singular tests (5_dbt/READ.md:823-879), run post-build:
    null-volume threshold, 3σ speed outliers, inverted incident intervals."""
    v = g.vars
    results = []
    results.extend(Q.run_checks(
        built["stg_traffic_volume"],
        [Q.singular("missing_volume_records", F.col("vehicle_count").isNull(),
                    threshold=int(v["max_null_records"]))]))
    results.extend(Q.run_checks(
        built["stg_traffic_speed"].filter(F.col("speed").isNotNull()),
        [Q.outlier_3sigma("speed", threshold=int(v["max_outlier_records"]),
                          severity=Q.Severity.ERROR)]))
    results.extend(Q.run_checks(
        built["stg_traffic_incidents"],
        [Q.singular("inverted_incident_interval",
                    F.col("incident_end_time") < F.col("incident_start_time"))]))
    return results
