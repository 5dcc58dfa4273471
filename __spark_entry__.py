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


# The driver checks the first 50 registry entries per round. Round-5
# window: x60_corpus_datacard leads (added after round 4's window froze,
# so it is the only query with ZERO driver artifacts), followed by the
# 32 queries whose latest driver evidence is round 2 (the q40-q53
# window/asof/funnel breadth block and the x01-x25 curation belt).
# That is 33 explicit slots; queries added in round 5 fill the next
# slots, and any remainder up to 50 auto-fills from registry order
# (those all have round-3+ driver evidence). After this window, no
# registry query's driver evidence predates round 3. Everything outside
# the window stays covered by tools/check_oracle.py's full bit-exact
# registry sweep (133/133 at the end of round 4; 141 registered after the
# round-5 additions x61-x67 + q74, each oracle-checked on registration).
_CHECK_FIRST = [
    # never driver-checked — slot 1
    "x60_corpus_datacard",
    # latest driver evidence round 2 — slots 2-33
    "q40_moving_average_rows_frame",
    "q41_trailing_range_frame",
    "q42_quartiles_array",
    "q43_null_safe_join",
    "q44_string_function_breadth",
    "q45_conditional_expression_breadth",
    "q46_math_function_breadth",
    "q47_date_arithmetic_breadth",
    "q48_asof_join_last_click",
    "q49_range_join_click_counts",
    "q50_funnel_view_click_purchase",
    "q51_unpivot_long_form",
    "q52_percent_rank_cume_dist",
    "q53_new_vs_returning_users",
    "x01_dedup_exact",
    "x02_token_count",
    "x03_quality_scores",
    "x04_lang_id",
    "x07_simhash",
    "x08_fingerprint_stats",
    "x09_cosine_topk",
    "x11_multimodal_features",
    "x12_top_tokens",
    "x13_embedding_neardup_pairs",
    "x15_curation_pipeline",
    "x16_simhash_neardup_pairs",
    "x17_collect_per_source",
    "x18_token_budget_packing",
    "x19_stratified_sample",
    "x23_tfidf_top_terms",
    "x24_hash_reservoir_per_lang",
    "x25_quartile_feature_bins",
    # round-5 additions — slots 34-41; remaining slots auto-fill with
    # round-3-evidence queries from registry order.
    "x61_training_shard_manifest",
    "x62_embedding_dispersion",
    "x63_char_coverage",
    "x64_cross_source_dup_matrix",
    "q74_rolling_distinct_window",
    "x65_unigram_tv_distance",
    "x66_containment_pairs",
    "x67_neardup_threshold_curve",
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
