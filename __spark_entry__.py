"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (+ the training-data-pipeline extensions), registered in
``airbnb_listings_data_pipelines_spark.queries``. As of round 2 EVERY query
carries an oracle: direct SQL twins, shared-md5-hash twins for hash-based
ops, and invariant oracles (exact truth set + precision/recall/error
flags) for approximate ops — see queries/extensions.py docstring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airbnb_listings_data_pipelines_spark.queries.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_all()
    return reg["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# The driver checks the first 50 registry entries per round. Round-4
# window (per the round-3 verdict's top recommendation): the 7 queries
# that have NEVER appeared in a driver CORRECTNESS window lead (they
# overflowed round 3's 50 slots), followed by the 43 queries whose
# latest driver evidence is round 2 — after this round no registry
# query's driver evidence is older than round 3. The 7 that overflow
# THIS window (x01-x04, q48-q50) were driver-green in rounds 2 AND 3's
# lineage, run every round inside the bench headline (x01-x03) or the
# streaming batch-equivalence tests (q48-q50), and remain covered by
# tools/check_oracle.py's full registry sweep (130 queries in round 4).
_CHECK_FIRST = [
    # never driver-checked (round-3 overflow) — slots 1-7
    "x37_embedding_decontamination",
    "x38_retrieve_rerank",
    "q59_intersect_except_all",
    "q61_bitwise_breadth",
    "q62_cube_status_year",
    "q67_map_functions",
    "q69_content_hashing_encoding",
    # latest driver evidence round 2 — refresh, slots 8-50
    "q28_approx_sketch_aggregates",
    "q32_rollup_hierarchy",
    "q34_intersect_except",
    "q35_pivot_status_by_priority",
    "q37_month_spine_gap_fill",
    "q38_lateral_top2_per_customer",
    "q39_snowflake_dialect_frontend",
    "q40_moving_average_rows_frame",
    "q41_trailing_range_frame",
    "q42_quartiles_array",
    "q43_null_safe_join",
    "q44_string_function_breadth",
    "q45_conditional_expression_breadth",
    "q46_math_function_breadth",
    "q47_date_arithmetic_breadth",
    "q51_unpivot_long_form",
    "q52_percent_rank_cume_dist",
    "q53_new_vs_returning_users",
    "q19_events_tumbling",
    "q23_events_sessionize_gap",
    "q33_events_daily_top_users",
    "q36_json_extraction",
    "x05_ngram_jaccard_pairs",
    "x06_minhash_lsh_recall",
    "x07_simhash",
    "x08_fingerprint_stats",
    "x09_cosine_topk",
    "x10_lsh_ann_recall",
    "x11_multimodal_features",
    "x12_top_tokens",
    "x13_embedding_neardup_pairs",
    "x14_ivf_ann_recall",
    "x15_curation_pipeline",
    "x16_simhash_neardup_pairs",
    "x17_collect_per_source",
    "x18_token_budget_packing",
    "x19_stratified_sample",
    "x22_dedup_components",
    "x23_tfidf_top_terms",
    "x24_hash_reservoir_per_lang",
    "x25_quartile_feature_bins",
    "x26_incremental_dedup",
    "x27_component_survivors",
]


def _ordered():
    reg = load_all()
    ordered = [n for n in _CHECK_FIRST if n in reg]
    ordered += [n for n in reg if n not in set(ordered)]
    return {n: reg[n] for n in ordered}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
