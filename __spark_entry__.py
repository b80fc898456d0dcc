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
# new/reshaped queries. Round 4: the 25 queries CORRECTNESS_r03.json has no
# row for, the reshaped embed_normalize_quantize (r3's red row — q_int8 is
# now a joined string), and the three new round-4 queries. Remaining
# queries follow in registration order.
_FRONT_R4 = [
    # reshaped red row + new in round 4
    "embed_normalize_quantize", "streaming_dedup_first",
    "streaming_session_rollup", "events_salted_dim_join",
    "events_rolling_7d", "events_gap_fill_hourly", "docs_pack_chunks",
    "docs_unigram_score", "docs_levenshtein_near", "embed_knn_ivf_sweep",
    "dbt_model_dag_incremental", "dedup_minhash_sweep", "dbt_profile_events",
    "events_zscore_hourly", "docs_mixture_sample",
    "streaming_click_attribution", "multimodal_audio_features",
    "multimodal_frame_fingerprints", "events_value_ntiles",
    "dedup_incremental_ingest",
    # no CORRECTNESS_r03 row (driver cap fell on these r1/r2-green queries)
    "dbt_fk_orphans", "dbt_outlier_3sigma", "text_token_stats",
    "text_quality", "text_lang_id", "text_tokens_bpe", "text_fingerprint",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_clusters", "dedup_simhash", "dedup_simhash_pairs",
    "embed_knn_brute", "embed_knn_blas", "embed_knn_ivf",
    "dedup_embed_cosine", "embed_label_centroids", "text_vocab_top",
    "text_bigram_top", "docs_split_assign", "docs_sample_stratified",
    "docs_length_band", "text_tfidf_top_terms", "dbt_stg_volume_clean",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT_R4 if k in d}
    return front | {k: v for k, v in d.items() if k not in front}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
