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
# so each round front-loads by driver-row staleness. Round 6 (registry
# FROZEN at 128 per round-5 VERDICT #3 — no net-new queries): the fixed
# round-5 red row ``docs_select_token_budget`` (oracle window-SUM now CAST
# AS BIGINT) first, then the 34 queries whose latest driver row is r03
# (the un-reached back half of _FRONT_R5), then the 44 r04-stale
# queries oldest-first; the 49 r5-green queries follow in registration
# order. ~50-budget => everything r03/r04-stale gets a fresh row.
_FRONT_R6 = [
    # round-5 red row, fixed (VERDICT r5 #1) — must be re-checked first
    "docs_select_token_budget",
    # latest driver row r03 (two rounds stale)
    "dbt_time_bucket_rollup", "dbt_weekly_volume_rank", "dedup_clusters_star",
    "docs_eval_contamination", "docs_repetition_score",
    "embed_knn_ivf_nprobe", "events_asof_latest_order",
    "events_cube_type_day", "events_latest_per_user",
    "events_next_type_transitions", "events_props_json",
    "events_range_join_clicks", "events_rollup_daily", "events_salted_rollup",
    "events_scd2_intervals", "events_sessionize", "events_type_normalize",
    "events_value_hour_corr", "multimodal_image_features",
    "orders_above_customer_avg", "orders_asof_window",
    "orders_with_bigticket_items", "snowflake_lottr_pivot",
    "snowflake_lottr_trend", "star_customers_without_orders",
    "star_nation_rank_global", "star_nation_revenue_share",
    "star_orders_between", "star_part_buckets", "star_pricing_summary",
    "star_priority_bigorder_rate", "star_region_revenue",
    "star_top_orders_by_revenue", "star_union_segments",
    # latest driver row r04 (one round stale)
    "aws_pti_top10", "aws_tti_top10", "azure_severity_top10",
    "azure_variability_top10", "bq_tti_trend_lag", "dbt_fk_orphans",
    "dbt_outlier_3sigma", "dbt_profile_events", "dbt_stg_volume_clean",
    "dedup_clusters", "dedup_embed_cosine", "dedup_exact",
    "dedup_minhash_lsh", "dedup_minhash_sweep", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_simhash_pairs", "docs_length_band",
    "docs_mixture_sample", "docs_pack_chunks", "docs_sample_stratified",
    "docs_split_assign", "docs_unigram_score", "embed_knn_blas",
    "embed_knn_brute", "embed_knn_ivf", "embed_knn_ivf_sweep",
    "embed_label_centroids", "embed_normalize_quantize",
    "events_gap_fill_hourly", "events_rolling_7d", "events_salted_dim_join",
    "events_value_ntiles", "events_zscore_hourly",
    "multimodal_audio_features", "multimodal_frame_fingerprints",
    "text_bigram_top", "text_fingerprint", "text_lang_id", "text_quality",
    "text_tfidf_top_terms", "text_token_stats", "text_tokens_bpe",
    "text_vocab_top",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT_R6 if k in d}
    return front | {k: v for k, v in d.items() if k not in front}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
