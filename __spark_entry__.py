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
# window: every query that has NEVER appeared in a driver CORRECTNESS
# window leads — the 7 that overflowed round 3's slots plus the 23 new
# round-4 queries — followed by the 20 round-2-stale queries with the
# oldest evidence. Never-checked beats stale: a query with zero driver
# artifacts is a bigger evidence gap than one green in round 2. The
# r2-stale queries that overflow THIS window (the remaining window/
# function-breadth q4x block and the x05-x27 belt) stay covered by
# tools/check_oracle.py's full bit-exact registry sweep (130 queries,
# re-run this round: 130/130) and rotate into round 5's window.
_CHECK_FIRST = [
    # never driver-checked: round-3 overflow — slots 1-7
    "x37_embedding_decontamination",
    "x38_retrieve_rerank",
    "q59_intersect_except_all",
    "q61_bitwise_breadth",
    "q62_cube_status_year",
    "q67_map_functions",
    "q69_content_hashing_encoding",
    # never driver-checked: new in round 4 — slots 8-30
    "x39_winnowing_fingerprints",
    "x40_winnowing_neardup_pairs",
    "x41_pq_ann_recall",
    "x42_bpe_pair_counts",
    "x43_lang_id_ngram",
    "x44_attribution_join",
    "x45_duplicate_span_coverage",
    "x46_leakage_safe_split",
    "x47_heavy_hitters_mg",
    "x48_temperature_mixture_sample",
    "x49_bm25_retrieval",
    "x50_dsir_importance_selection",
    "x51_mergeable_quantile_histogram",
    "x52_semdedup_prune",
    "x53_hard_negative_mining",
    "x54_fuzzy_record_linkage",
    "x55_bigram_lm_quality",
    "x56_span_decontaminate",
    "x57_pagerank_trade_graph",
    "x58_bloom_line_membership",
    "q70_pivot_revenue_matrix",
    "q71_exists_semi_anti",
    "q72_group_by_all_ergonomics",
    "x59_hybrid_rrf_retrieval",
    "q73_filter_clause_aggregates",
    # latest driver evidence round 2 — oldest first. Two r2-stale queries
    # rotate to round 5 to make room for the late round-4 additions:
    # x11 (multimodal — real-codec pytest coverage) and x15 (curation
    # fusion — now also covered end-to-end by tests/test_full_recipe.py)
    "q28_approx_sketch_aggregates",
    "q32_rollup_hierarchy",
    "q34_intersect_except",
    "q35_pivot_status_by_priority",
    "q37_month_spine_gap_fill",
    "q38_lateral_top2_per_customer",
    "q39_snowflake_dialect_frontend",
    "q19_events_tumbling",
    "q23_events_sessionize_gap",
    "q33_events_daily_top_users",
    "q36_json_extraction",
    "x05_ngram_jaccard_pairs",
    "x06_minhash_lsh_recall",
    "x10_lsh_ann_recall",
    "x14_ivf_ann_recall",
    "x22_dedup_components",
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
