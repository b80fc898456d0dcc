"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (AWS TTI top-10, SURVEY.md §7.2 slice 0)
  on /root/testdata/sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data extension operators, as (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: DuckDB-equivalent ANSI SQL per query (same column
  aliases; identical ROUND policy) — see
  ``data_engineering_projects_spark/contract/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_projects_spark import contract
from data_engineering_projects_spark.contract import QUERIES, ORACLES

contract.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["aws_tti_top10"](spark, "/root/testdata/sf0.001")


# Enumerated first: the driver checks only ~50 registry queries per round,
# so each round front-loads every query WITHOUT a driver row from the
# previous round (rotation keeps every row at most one round old) plus any
# new/reshaped queries. Round 5: the 6 brand-new queries, the 7 reshaped
# ones (p95 bound oracle, partition-pruned incremental DAG, arg-max
# incremental ingest, ASCII-scoped levenshtein, single-batch-asserted
# streaming set), then the 42 queries CORRECTNESS_r04.json has no row for
# (last checked r03). Remaining queries follow in registration order.
_FRONT_R5 = [
    # new in round 5 (later additions first: never driver-checked)
    "docs_source_overlap", "embed_centroid_confusion",
    "events_value_concentration", "embed_top_eigenvector",
    "events_iqr_outliers", "events_bounce_rate",
    "events_value_histogram", "star_prospect_customers",
    "star_top_revenue_suppliers", "docs_weighted_sample",
    "streaming_dim_enrich",
    "events_type_lift", "events_rolling_wau",
    "docs_dedup_rate_by_source", "docs_crosslang_dups",
    "events_streaks", "star_order_count_distribution",
    "events_mode_daily", "events_chi2_residuals",
    "events_winsorized_mean", "star_exclusive_late_supplier",
    "streaming_sliding_rollup",
    # new in round 5
    "star_pricing_p95_approx", "dedup_clusters_chain",
    "events_pagerank_types", "events_user_reach_hll",
    "star_small_quantity_revenue", "docs_sample_topn_per_source",
    "events_funnel_steps", "streaming_foreachbatch_upsert",
    "docs_select_token_budget", "docs_negative_samples",
    "events_max_concurrency", "events_value_mad",
    "events_retention_cohorts",
    # reshaped in round 5
    "dbt_model_dag_incremental", "dedup_incremental_ingest",
    "docs_levenshtein_near", "streaming_click_attribution",
    "streaming_hourly_rollup", "streaming_session_rollup",
    "streaming_dedup_first",
    # no CORRECTNESS_r04 row (last driver-checked in r03)
    "bq_exceedance", "customers_cohort_setops", "dbt_congestion_hourly",
    "dbt_daily_congestion_rank", "dbt_hourly_speed_metrics",
    "dbt_model_dag_mart", "dbt_quality_report",
    "dbt_speed_percentile_buckets", "dbt_time_bucket_rollup",
    "dbt_weekly_volume_rank", "dedup_clusters_star",
    "docs_eval_contamination", "docs_repetition_score",
    "embed_knn_ivf_nprobe", "events_asof_latest_order",
    "events_cube_type_day", "events_latest_per_user",
    "events_next_type_transitions", "events_props_json",
    "events_range_join_clicks", "events_rollup_daily",
    "events_salted_rollup", "events_scd2_intervals", "events_sessionize",
    "events_type_normalize", "events_value_hour_corr",
    "multimodal_image_features", "orders_above_customer_avg",
    "orders_asof_window", "orders_with_bigticket_items",
    "snowflake_lottr_pivot", "snowflake_lottr_trend",
    "star_customers_without_orders", "star_nation_rank_global",
    "star_nation_revenue_share", "star_orders_between",
    "star_part_buckets", "star_pricing_summary",
    "star_priority_bigorder_rate", "star_region_revenue",
    "star_top_orders_by_revenue", "star_union_segments",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT_R5 if k in d}
    return front | {k: v for k, v in d.items() if k not in front}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
