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


# The driver checks only ~50 registry queries per round, so `queries()`
# front-loads by driver-row staleness. Since round 6 the order is
# COMPUTED from the CORRECTNESS_r*.json rows at import time
# (`_staleness_order`: non-green/never-checked first, then green rows
# oldest-round-first) — self-maintaining across rounds with no manual
# re-derivation. The static list below is the FALLBACK when no
# correctness files are readable; it snapshots the round-6 computation:
# the fixed round-5 red row ``docs_select_token_budget`` (oracle
# window-SUM now CAST AS BIGINT) first, then the 34 r03-stale queries,
# then the 44 r04-stale queries. Registry FROZEN at 128 per round-5
# VERDICT #3.
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


def _staleness_order(names) -> list[str] | None:
    """Self-maintaining rotation (round 6): derive the front order from
    the driver's own ``CORRECTNESS_r*.json`` rows instead of a
    hand-curated list, so every round automatically re-checks (1) any
    query whose LATEST driver row is not fully green, then (2) green
    queries oldest-row-first, then (3) ties by name. A query with no row
    at all sorts with group (1). Returns None when no correctness files
    are readable (first round / foreign checkout) so the static fallback
    applies."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    files = []
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            files.append((int(m.group(1)), p))
    latest: dict[str, tuple[int, bool]] = {}
    seen_any = False
    for rnd, p in sorted(files):  # numeric order: later rounds overwrite
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        seen_any = True
        for name, v in rows.items():
            green = bool(v.get("rows_match") and v.get("schema_match")
                         and v.get("hash_match") and not v.get("err"))
            latest[name] = (rnd, green)
    if not seen_any:
        return None

    def key(name: str):
        rnd, green = latest.get(name, (0, False))
        return (1 if green else 0, rnd, name)

    return sorted(names, key=key)


def _ordered(d: dict) -> dict:
    order = _staleness_order(list(d)) or [k for k in _FRONT_R6 if k in d]
    front = {k: d[k] for k in order if k in d}
    return front | {k: v for k, v in d.items() if k not in front}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry swaps (rounds 11-13): contract.RETIRED entries stay
    # importable for tests/tooling but leave the driver registry (count
    # stays 128); swapped-in queries with no driver row yet
    # (subset_star_closure, events_sketch_drift at r13) are fronted
    # automatically by the staleness order.
    from data_engineering_projects_spark.contract import RETIRED
    return _ordered({k: v for k, v in QUERIES.items() if k not in RETIRED})


def oracle_sql() -> dict[str, str]:
    from data_engineering_projects_spark.contract import RETIRED
    return _ordered({k: v for k, v in ORACLES.items() if k not in RETIRED})
