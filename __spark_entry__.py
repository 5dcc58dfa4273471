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


# The round-1 driver checked only the first 50 of 68 registry entries
# (insertion order). Order the dict so the entries with the least driver
# evidence come first: the 18 queries absent from CORRECTNESS_r01.json,
# then the 8 that were `no_oracle` in round 1 and now carry exact oracles;
# the remainder (all driver-green in round 1) follow in registry order.
_CHECK_FIRST = [
    # round-2 additions (never driver-checked)
    "q48_asof_join_last_click",
    "q49_range_join_click_counts",
    "q50_funnel_view_click_purchase",
    "x22_dedup_components",
    "x23_tfidf_top_terms",
    "x24_hash_reservoir_per_lang",
    "x25_quartile_feature_bins",
    "x26_incremental_dedup",
    "q51_unpivot_long_form",
    "q52_percent_rank_cume_dist",
    "q53_new_vs_returning_users",
    "x27_component_survivors",
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
    "q19_events_tumbling",
    "q23_events_sessionize_gap",
    "q33_events_daily_top_users",
    "q36_json_extraction",
    "x06_minhash_lsh_recall",
    "x07_simhash",
    "x10_lsh_ann_recall",
    "x11_multimodal_features",
    "x14_ivf_ann_recall",
    "x16_simhash_neardup_pairs",
    "x19_stratified_sample",
    "q28_approx_sketch_aggregates",
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
