"""End-to-end pipeline tests on reference-shaped fixtures derived from the
driver testdata (FIXTURES.md §A semantics on §B tables), with formula
spot-checks recomputed independently via numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_engineering_projects_spark.pipelines import (
    aws_monthly_tti, azure_yearly_severity, bigquery_tti_trends,
    snowflake_lottr, build_traffic_graph,
)
from data_engineering_projects_spark.pipelines.dbt_traffic import singular_tests
from data_engineering_projects_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def travel_times(spark):
    ev = load_table(spark, SF, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("tmc_code"),
        F.col("ts").alias("measurement_tstamp"),
        F.col("value").alias("travel_time_seconds"),
        F.dayofmonth("ts").alias("year"),  # day plays the year axis
    )


@pytest.fixture(scope="module")
def tmc_shapes(spark):
    return (load_table(spark, SF, "events")
            .select(F.col("user_id").cast("string").alias("tmc_code")).distinct()
            .withColumn("county",
                        F.when(F.col("tmc_code").cast("long") % 3 == 0, "HONOLULU")
                         .otherwise("OTHER"))
            .withColumn("road", F.lit("H-1")))


def test_aws_monthly_tti(spark, travel_times, tmc_shapes):
    out = aws_monthly_tti(travel_times, tmc_shapes, 2024, 1)
    tti = out["top_k_tti"].collect()
    pti = out["top_k_pti"].collect()
    assert 0 < len(tti) <= 10 and 0 < len(pti) <= 10
    assert all(r["county"] == "HONOLULU" for r in tti)
    assert all(r["analysis_period"] == "2024-01" for r in tti)
    # formula spot check: recompute quantiles for the top row's group
    top = tti[0]
    rows = (travel_times
            .withColumn("period",
                        __import__("data_engineering_projects_spark.functions.temporal",
                                   fromlist=["period_bucket"]).period_bucket(
                                       F.col("measurement_tstamp")))
            .filter((F.col("tmc_code") == top["tmc_code"])
                    & (F.col("period") == top["period"]))
            .select("travel_time_seconds").collect())
    vals = np.array([r[0] for r in rows])
    assert top["tti"] == pytest.approx(
        np.quantile(vals, 0.85) / np.quantile(vals, 0.5), rel=1e-9)
    assert top["pti"] == pytest.approx(
        np.quantile(vals, 0.95) / np.quantile(vals, 0.5), rel=1e-9)
    # descending by tti
    tts = [r["tti"] for r in tti]
    assert tts == sorted(tts, reverse=True)


def test_azure_yearly_severity(spark, travel_times, tmc_shapes):
    out = azure_yearly_severity(travel_times, tmc_shapes, years_label="d1-d30")
    sev = out["severity_summary"]
    var = out["variability_summary"].collect()
    per_year = (sev.groupBy("year").count().collect())
    assert all(r["count"] <= 10 for r in per_year)
    assert 0 < len(var) <= 10
    assert all(r["years"] == "d1-d30" for r in var)


def test_bigquery_tti_trends(spark, travel_times, tmc_shapes):
    out = bigquery_tti_trends(travel_times, tmc_shapes)
    trends = out["tti_top10_trends"].collect()
    assert len({r["tmc_code"] for r in trends}) <= 10
    # first day per segment has tti_change == 0 (fillna(0) semantics)
    first = {}
    for r in sorted(trends, key=lambda r: (r["tmc_code"], r["year"])):
        first.setdefault(r["tmc_code"], r)
    assert all(r["tti_change"] == 0.0 for r in first.values())
    ex = out["tti_exceedance"].collect()
    assert all(0.0 <= r["exceed_rate"] <= 1.0 for r in ex)


def test_snowflake_lottr(spark, travel_times, tmc_shapes):
    out = snowflake_lottr(travel_times, tmc_shapes)
    summary = out["tti_summary"]
    cols = set(summary.columns)
    assert {"tmc_code", "year", "amp", "mid", "pmp", "we"} <= cols
    # fill 0: no nulls in pivoted period columns (§7.4 trap #7)
    n_null = summary.filter(
        F.col("amp").isNull() | F.col("mid").isNull()
        | F.col("pmp").isNull() | F.col("we").isNull()).count()
    assert n_null == 0
    trends = out["tti_trends"].orderBy("year").collect()
    assert trends and all(f"{p}_change" in trends[0].asDict()
                          for p in ("amp", "mid", "pmp", "we"))


@pytest.fixture(scope="module")
def dbt_sources(spark):
    ev = load_table(spark, SF, "events")
    speed = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("id"),
                     F.col("user_id").cast("string").alias("sensor_id"),
                     F.col("ts").alias("timestamp"),
                     F.col("value").alias("speed"),
                     F.floor(F.col("value")).cast("int").alias("vehicle_count"),
                     F.lit(0.9).alias("confidence_score")))
    volume = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("id"),
                      F.col("user_id").cast("string").alias("location_id"),
                      F.col("ts").cast("string").alias("recorded_time"),
                      F.floor(F.col("value") * 10).cast("int").alias("vehicle_count"),
                      F.col("value").alias("average_speed"),
                      F.lit(2).alias("lane_count")))
    incidents = (ev.filter(F.col("event_type") == "error")
                 .select(F.col("event_id").alias("incident_id"),
                         F.col("user_id").cast("string").alias("location_id"),
                         F.col("ts").alias("start_time"),
                         # a few inverted intervals for the singular test
                         F.when(F.col("event_id") % 50 == 0,
                                F.col("ts") - F.expr("INTERVAL 1 HOUR"))
                          .otherwise(F.col("ts") + F.expr("INTERVAL 1 HOUR"))
                          .alias("end_time"),
                         (F.floor("value").cast("int") % 5 + 1).alias("severity"),
                         F.when(F.col("event_id") % 3 == 0, "major ACCIDENT on ramp")
                          .when(F.col("event_id") % 3 == 1, "lane construction work")
                          .otherwise("vehicle breakdown").alias("type"),
                         F.lit("desc").alias("description"),
                         F.lit(1).alias("affected_lanes")))
    locations = (ev.select(F.col("user_id").cast("string").alias("location_id")).distinct()
                 .withColumn("name", F.concat(F.lit("Loc "), F.col("location_id")))
                 .withColumn("latitude", (F.col("location_id").cast("long") % 90).cast("double"))
                 .withColumn("longitude", (F.col("location_id").cast("long") % 180).cast("double"))
                 .withColumn("road_type", F.lit("highway"))
                 .withColumn("lanes", (F.col("location_id").cast("long") % 5 + 1).cast("int"))
                 .withColumn("speed_limit",
                             (25 + (F.col("location_id").cast("long") % 10) * 5).cast("int"))
                 .withColumn("is_highway", F.lit(True)))
    return {"raw_speed_data": speed, "raw_volume_data": volume,
            "raw_incident_data": incidents, "raw_location_data": locations}


def test_dbt_traffic_graph(spark, dbt_sources, tmp_path):
    g = build_traffic_graph(dbt_sources, warehouse_dir=str(tmp_path))
    built = g.run(spark)
    assert set(built) >= {"stg_traffic_volume", "stg_traffic_speed",
                          "stg_traffic_incidents", "stg_locations",
                          "int_hourly_congestion", "mart_daily_congestion",
                          "mart_hourly_patterns", "mart_volume_trends"}
    # intermediate materialized as partitioned table
    assert (tmp_path / "int_hourly_congestion").exists()
    parts = list((tmp_path / "int_hourly_congestion").glob("recorded_date=*"))
    assert parts, "expected day-partitioned layout (5_dbt/READ.md:389-394)"
    # congestion index clamped to <= 1.0 (NULL allowed)
    bad = built["int_hourly_congestion"].filter(F.col("congestion_index") > 1.0).count()
    assert bad == 0
    # mart rank bounded
    ranks = [r["congestion_rank"] for r in built["mart_daily_congestion"].collect()]
    assert ranks and max(ranks) <= 10
    # incident-type standardization (E7)
    types = {r["incident_type"]
             for r in built["stg_traffic_incidents"].select("incident_type").distinct().collect()}
    assert types <= {"Accident", "Construction", "Breakdown"}
    # staging checks ran and passed
    assert "stg_locations" in g.check_results
    assert all(r.passed for r in g.check_results["stg_locations"])
    # singular tests: inverted intervals exist → that check fails
    import data_engineering_projects_spark.quality as Q
    with pytest.raises(Q.QualityError, match="inverted_incident_interval"):
        singular_tests(g, built)
